"""Multi-limb modular arithmetic over uint32 limb arrays, TPU-first.

This is the L0 layer of the TPU-native halo2 stack: the analogue of the
reference's `pairing_bn256` field arithmetic plus the `ec-gpu` generated device
field code (see SURVEY.md §2.9; reference: /root/reference — field ops are
provided there by the external `pairing_bn256` / `ec-gpu-gen` crates).

Design (TPU-first, not a port):
  * A field element is a vector of ``N_LIMBS = 16`` limbs of ``LIMB_BITS = 16``
    bits each, stored **limbs-leading** as ``uint32`` arrays of shape
    ``(16, *batch)``.  Limbs-leading keeps the (large) batch axis on the TPU
    lane dimension, so every limb operation is a full-width VPU op over the
    batch; the limb axis maps to sublanes.
  * 16-bit limbs make every partial product ``a_i * b_j < 2**32`` exactly
    representable in uint32; the lo/hi 16-bit split of each product keeps all
    accumulators below ``2**21``, so schoolbook multiplication never overflows
    uint32 and needs no 64-bit arithmetic (TPUs have no fast int64).
  * Montgomery representation with ``R = 2**256`` is the canonical on-device
    form (mirroring the reference field crates), converted at host boundaries.

All functions are shape-polymorphic over the trailing batch dims and are pure
jnp (XLA fuses the limb chains); Pallas fusions can replace hot compositions
later without changing this API.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
N_LIMBS = 16  # 256 bits total
MASK = (1 << LIMB_BITS) - 1
U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Host-side conversions (numpy / Python ints)
# ---------------------------------------------------------------------------

def int_to_limbs_np(x: int, n_limbs: int = N_LIMBS) -> np.ndarray:
    """Python int -> (n_limbs,) uint32 little-endian 16-bit limbs."""
    out = np.empty((n_limbs,), dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = x & MASK
        x >>= LIMB_BITS
    if x:
        raise ValueError("value does not fit in limbs")
    return out


def ints_to_limbs_np(xs, n_limbs: int = N_LIMBS) -> np.ndarray:
    """Iterable of ints -> (n_limbs, N) uint32.

    Fast path: pack via int.to_bytes + frombuffer (one C-level conversion
    per element instead of n_limbs Python shifts)."""
    xs = list(xs)
    nbytes = 2 * n_limbs
    try:
        blob = b"".join(x.to_bytes(nbytes, "little") for x in xs)
    except OverflowError:
        raise ValueError("value does not fit in limbs") from None
    arr = np.frombuffer(blob, dtype="<u2").reshape(len(xs), n_limbs)
    return np.ascontiguousarray(arr.T).astype(np.uint32)


def limbs_to_int(limbs: np.ndarray) -> int:
    """(n_limbs,) array -> Python int."""
    limbs = np.asarray(limbs)
    x = 0
    for i in range(limbs.shape[0] - 1, -1, -1):
        x = (x << LIMB_BITS) | int(limbs[i])
    return x


def limbs_to_ints(limbs: np.ndarray) -> list:
    """(n_limbs, N) array -> list of N Python ints (vectorized via object
    dtype: one shift+add pass per limb instead of a per-element loop)."""
    limbs = np.asarray(limbs)
    acc = np.zeros(limbs.shape[1], dtype=object)
    for i in range(limbs.shape[0] - 1, -1, -1):
        acc <<= LIMB_BITS
        acc += limbs[i].astype(object)
    return acc.tolist()


# ---------------------------------------------------------------------------
# Core limb kernels (jnp, uint32 only).
#
# Everything here is formulated as a FIXED, SHALLOW graph of full-width vector
# ops — no per-limb Python loops, no scatter updates:
#   * products: 16-step accumulate of concat-shifted partial products
#   * carries:  two relaxation passes + Kogge–Stone carry-lookahead (log depth)
# This keeps XLA compile time flat and maps every op onto full VPU lanes.
# ---------------------------------------------------------------------------

def _shift_up(x, k: int = 1):
    """Shift limbs toward higher significance along axis 0, zero-filling."""
    pad = jnp.zeros((k,) + x.shape[1:], x.dtype)
    return jnp.concatenate([pad, x[:-k]], axis=0)


def carry_prop(acc, n_out: int):
    """Exact carry normalization of a redundant limb vector.

    acc: (M, *B) uint32 limbs (any values); value = sum acc_k 2^(16k), which
    must be < 2^(16*(n_out+1)).  Returns (canonical (n_out,*B) limbs,
    carry_out) with carry_out = value >> (16*n_out).

    Fixed-depth: two vectorized relaxation passes reduce every carry to a
    single bit, then Kogge–Stone lookahead resolves the ripple in log2 steps.
    """
    m = acc.shape[0]
    width = n_out + 1
    if m < width:
        acc = jnp.concatenate(
            [acc, jnp.zeros((width - m,) + acc.shape[1:], U32)], axis=0)
    else:
        acc = acc[:width]  # caller guarantees value bound
    # pass 1: split and fold multi-bit carries once
    acc = (acc & MASK) + _shift_up(acc >> LIMB_BITS)
    # pass 2: after pass 1 limbs < 2^17, so per-limb carry-out is 0/1.
    # All flags stay u32 0/1 (no i1 vectors — Mosaic-friendly).
    lo = acc & MASK
    g = acc >> LIMB_BITS                      # generate: 0/1
    p = (lo + 1) >> LIMB_BITS                 # propagate: 1 iff lo == MASK
    # Kogge–Stone prefix of (g, p): G_k = carry OUT of limb k
    G, P = g, p
    shift = 1
    while shift < width:
        G = G | (P & _shift_up(G, shift))
        P = P & _shift_up(P, shift)
        shift *= 2
    cin = _shift_up(G, 1)                     # carry INTO each limb
    out = (lo + cin) & MASK
    return out[:n_out], out[n_out] if width > n_out else jnp.zeros_like(out[0])


def _zeros_like_rows(x, k: int):
    return jnp.zeros((k,) + x.shape[1:], U32)


def mul_wide_redundant(a, b):
    """Full 512-bit product in REDUNDANT limb form (no carry resolution).

    a: (16, *B), b: (16, *B) -> (32, *B) uint32 limbs with each limb
    < 16 * 2 * (2^16-1) < 2^21; value = sum limb_k 2^(16k) = a*b exactly.

    Schoolbook as a 16-step accumulate of shifted partial products. Each
    step's contribution is placed by CONCATENATION (no scatter, no skewed
    mega-tensors), so peak live memory stays at a few (32, *B) buffers —
    this matters at MSM bucket widths and k=22 NTT sizes.  Deferring the
    carry pass lets Montgomery multiplication run ONE carry resolution for
    the whole a*b + m*p sum instead of one per partial product."""
    a, b = jnp.broadcast_arrays(a, b)

    def _placed(x, lead: int, trail: int):
        parts = []
        if lead:
            parts.append(_zeros_like_rows(x, lead))
        parts.append(x)
        if trail:
            parts.append(_zeros_like_rows(x, trail))
        return jnp.concatenate(parts, 0) if len(parts) > 1 else x

    acc = _zeros_like_rows(b, 2 * N_LIMBS)
    for i in range(N_LIMBS):
        p = a[i][None] * b                    # (16, *B), exact in u32
        acc = acc + _placed(p & MASK, i, N_LIMBS - i)
        acc = acc + _placed(p >> LIMB_BITS, i + 1, N_LIMBS - i - 1)
    return acc


def mul_wide(a, b):
    """Full 512-bit product, canonical 16-bit limbs: (32, *B)."""
    out, _ = carry_prop(mul_wide_redundant(a, b), 2 * N_LIMBS)
    return out


def mul_lo(a, b):
    """Low 256 bits of a*b (mod 2**256), canonical 16-bit limbs."""
    a, b = jnp.broadcast_arrays(a, b)
    acc = _zeros_like_rows(b, N_LIMBS)
    for i in range(N_LIMBS):
        p = a[i][None] * b[: N_LIMBS - i]
        lo = p & MASK
        hi = p >> LIMB_BITS
        c1 = jnp.concatenate([_zeros_like_rows(b, i), lo], 0) if i else lo
        acc = acc + c1
        if i + 1 < N_LIMBS:
            c2 = jnp.concatenate(
                [_zeros_like_rows(b, i + 1), hi[: N_LIMBS - i - 1]], 0)
            acc = acc + c2
    out, _ = carry_prop(acc, N_LIMBS)
    return out


def add_mod_raw(a, b, p):
    """(a + b) mod p with p passed explicitly; a, b canonical."""
    s, _ = carry_prop(a + b, N_LIMBS)
    diff, borrow = sub_limbs(s, jnp.broadcast_to(p, s.shape))
    return jnp.where(borrow == 0, diff, s)


def sub_mod_raw(a, b, p):
    """(a - b) mod p with p passed explicitly."""
    d, borrow = sub_limbs(a, b)
    dp, _ = carry_prop(d + p, N_LIMBS)
    return jnp.where(borrow == 1, dp, d)


def mont_mul_raw(a, b, p, pinv):
    """Montgomery product with the modulus/constant arrays passed in
    explicitly (for Pallas kernels, which cannot capture array constants).
    a, b: (16, *B); p, pinv: (16, 1)-broadcastable limb arrays.

    Single-carry-pass formulation: a*b and m*p stay in redundant limb form
    (limbs < 2^21 each, sum < 2^22 — no uint32 overflow) and one carry
    resolution canonicalizes the whole T + m*p sum.  Only the low half of T
    is canonicalized early (16-limb carry pass) because m = T mod 2^256 *
    (-p^-1) needs exact 16-bit limbs for overflow-free products."""
    t = mul_wide_redundant(a, b)
    t_lo, _ = carry_prop(t[:N_LIMBS], N_LIMBS)
    m = mul_lo(t_lo, pinv)
    mp = mul_wide_redundant(m, p)
    full, _ = carry_prop(t + mp, 2 * N_LIMBS)
    hi = full[N_LIMBS:]
    diff, borrow = sub_limbs(hi, jnp.broadcast_to(p, hi.shape))
    return jnp.where(borrow == 0, diff, hi)


def add_limbs(a, b, n: int = N_LIMBS):
    """Limbwise add with carry resolution. Returns (limbs, carry_out)."""
    out, carry = carry_prop(a + b, n)
    return out, carry


def sub_limbs(a, b, n: int = N_LIMBS):
    """Limbwise subtract. Returns (limbs, borrow_out), borrow_out = 1 iff
    a < b.  Computed as a + ~b + 1 (two's complement over 16n bits)."""
    t = a + (MASK - b)
    one = jnp.concatenate(
        [jnp.ones((1,) + t.shape[1:], U32),
         jnp.zeros((t.shape[0] - 1,) + t.shape[1:], U32)], axis=0)
    out, carry = carry_prop(t + one, n)
    return out, 1 - carry


def is_zero(a):
    """(16, *B) -> bool (*B): all limbs zero."""
    return jnp.all(a == 0, axis=0)


def eq(a, b):
    return jnp.all(a == b, axis=0)


# ---------------------------------------------------------------------------
# Field context
# ---------------------------------------------------------------------------

def jit_method(fn=None, *, static_argnums=()):
    """Wrap an instance method in a per-instance cached ``jax.jit``.

    Eager per-op dispatch is pathologically slow in this environment
    (~100ms/op); every public Field op therefore runs jitted.  When called
    inside an outer jit trace this is a cheap inlined call."""
    def deco(f):
        @functools.wraps(f)
        def wrapper(self, *args, **kwargs):
            cache = self.__dict__.setdefault("_jit_cache", {})
            jitted = cache.get(f.__name__)
            if jitted is None:
                jitted = jax.jit(functools.partial(f, self),
                                 static_argnums=static_argnums)
                cache[f.__name__] = jitted
            return jitted(*args, **kwargs)
        wrapper.__wrapped_raw__ = f
        return wrapper
    return deco(fn) if fn is not None else deco


class _RawFacade:
    """Access the un-jitted implementations of a Field's ops.

    ``F.mul`` etc. are wrapped in per-op ``jax.jit`` for fast *eager* use;
    when composing large traced programs (NTT stages, curve formulas, MSM
    scans) the nested-jit call boundaries slow compilation, so those callers
    use ``F.raw.mul`` etc., which trace inline."""

    def __init__(self, field):
        self._field = field

    def __getattr__(self, name):
        fn = getattr(type(self._field), name, None)
        raw = getattr(fn, "__wrapped_raw__", None)
        if raw is None:
            bound = getattr(self._field, name)
        else:
            bound = functools.partial(raw, self._field)
        self.__dict__[name] = bound
        return bound


class Field:
    """Constants + ops for one prime field, Montgomery form with R = 2**256.

    The same class serves BN254 Fr and Fq (see fields/bn254.py).
    Values on device are (16, *batch) uint32 arrays in Montgomery form unless
    a function says otherwise.
    """

    def __init__(self, modulus: int, name: str = "F"):
        self.p = modulus
        self.name = name
        self.R = (1 << 256) % modulus
        self.R2 = (self.R * self.R) % modulus
        self.R3 = (self.R2 * self.R) % modulus
        self.R_inv = pow(self.R, modulus - 2, modulus)
        # -p^{-1} mod 2**256 (Montgomery constant)
        self.p_inv_neg = (-pow(modulus, -1, 1 << 256)) % (1 << 256)
        self.num_bits = modulus.bit_length()

        self.raw = _RawFacade(self)
        self.p_np = int_to_limbs_np(modulus)
        self.p_inv_np = int_to_limbs_np(self.p_inv_neg)
        self.r_np = int_to_limbs_np(self.R)          # = one in Montgomery form
        self.r2_np = int_to_limbs_np(self.R2)
        self.zero_np = np.zeros((N_LIMBS,), np.uint32)

    # -- host helpers -----------------------------------------------------
    def to_mont_int(self, x: int) -> int:
        return (x * self.R) % self.p

    def from_mont_int(self, x: int) -> int:
        return (x * self.R_inv) % self.p

    def encode(self, xs) -> np.ndarray:
        """Canonical values -> (16, N) uint32 Montgomery limbs.

        xs: iterable of Python ints, or a numpy integer array (columnar
        fast path — no per-value Python work; see native.encode_mont_np).
        Uses the native (C++) encoder when available (~4x; ~100x for numpy
        columns)."""
        if not (isinstance(xs, np.ndarray) and xs.dtype.kind in "iu"):
            xs = list(xs)
        try:
            from halo2_tpu import native
            out = native.encode_mont_np(xs, self)
            if out is not None:
                return out
        except Exception:
            pass
        return ints_to_limbs_np([self.to_mont_int(int(x) % self.p)
                                 for x in xs])

    def encode_scalar(self, x: int) -> np.ndarray:
        return int_to_limbs_np(self.to_mont_int(x % self.p))

    def encode_le_bytes_dev(self, blob: bytes, n: int):
        """n canonical 32-byte little-endian values (< p) -> (16, n)
        Montgomery limbs, converted ON DEVICE (upload 32 B/value instead
        of 64; one Montgomery mul by R^2)."""
        import jax
        import jax.numpy as jnp
        words = np.frombuffer(blob, dtype="<u4").reshape(n, 8)

        @jax.jit
        def convert(w):
            limbs = []
            for j in range(8):
                limbs.append(w[:, j] & MASK)
                limbs.append(w[:, j] >> LIMB_BITS)
            x = jnp.stack(limbs, axis=0)            # (16, n) standard form
            r2 = jnp.asarray(self.r2_np).reshape(N_LIMBS, 1)
            return self.raw.mul(x, jnp.broadcast_to(r2, x.shape))
        return convert(jnp.asarray(words))

    def encode_u64_dev(self, cols: "np.ndarray"):
        """(C, n) uint64 canonical values -> (16, C, n) Montgomery limbs,
        with the canonical->Montgomery conversion ON DEVICE.

        Uploads 8 bytes/value instead of 64 (the 16 u32 limb planes): at
        k=20 through the axon tunnel that is the difference between ~1 s
        and ~10 s per proof of advice staging.  Conversion = limb split +
        one Montgomery mul by R^2 (exact)."""
        import jax
        import jax.numpy as jnp
        halves = np.ascontiguousarray(cols).view(np.uint32).reshape(
            cols.shape[0], cols.shape[1], 2)        # little-endian u32 pairs

        @jax.jit
        def convert(h):
            lo, hi = h[:, :, 0], h[:, :, 1]         # (C, n) u32 each
            limbs = [lo & MASK, lo >> LIMB_BITS, hi & MASK, hi >> LIMB_BITS]
            limbs += [jnp.zeros_like(lo)] * (N_LIMBS - 4)
            x = jnp.stack(limbs, axis=0)            # (16, C, n) standard form
            r2 = jnp.asarray(self.r2_np).reshape(N_LIMBS, 1, 1)
            return self.raw.mul(x, jnp.broadcast_to(r2, x.shape))
        return convert(jnp.asarray(halves))

    def decode(self, limbs) -> list:
        """(16, N) Montgomery limbs -> list of canonical Python ints."""
        arr = np.asarray(limbs)
        try:
            from halo2_tpu import native
            out = native.decode_mont_np(arr, self)
            if out is not None:
                return out
        except Exception:
            pass
        return [self.from_mont_int(v) for v in limbs_to_ints(arr)]

    def decode_scalar(self, limbs) -> int:
        return self.from_mont_int(limbs_to_int(np.asarray(limbs)))

    # -- constants as jnp -------------------------------------------------
    @functools.cached_property
    def p_limbs(self):
        return jnp.asarray(self.p_np)

    @functools.cached_property
    def p_inv_limbs(self):
        return jnp.asarray(self.p_inv_np)

    @functools.cached_property
    def one(self):
        """1 in Montgomery form (= R mod p)."""
        return jnp.asarray(self.r_np)

    @functools.cached_property
    def r2_limbs(self):
        return jnp.asarray(self.r2_np)

    @functools.cached_property
    def zero(self):
        return jnp.zeros((N_LIMBS,), U32)

    def broadcast_scalar(self, limbs16, batch_shape):
        """(16,) -> (16, *batch) by broadcast."""
        return jnp.broadcast_to(
            jnp.asarray(limbs16).reshape((N_LIMBS,) + (1,) * len(batch_shape)),
            (N_LIMBS,) + tuple(batch_shape))

    # -- modular ops ------------------------------------------------------
    def _bshape(self, *xs):
        return jnp.broadcast_shapes(*[x.shape[1:] for x in xs])

    @jit_method
    def cond_sub_p(self, x):
        """x in [0, 2p) -> x mod p."""
        p = self.broadcast_scalar(self.p_np, x.shape[1:])
        diff, borrow = sub_limbs(x, p)
        return jnp.where(borrow == 0, diff, x)

    @jit_method
    def add(self, a, b):
        from halo2_tpu.fields import pallas_ops
        out = pallas_ops.binop("add", self, a, b)
        if out is not None:
            return out
        a, b = jnp.broadcast_arrays(a, b)
        s, _ = add_limbs(a, b)  # < 2p < 2**255: no carry out of limb 15
        return self.raw.cond_sub_p(s)

    @jit_method
    def sub(self, a, b):
        from halo2_tpu.fields import pallas_ops
        out = pallas_ops.binop("sub", self, a, b)
        if out is not None:
            return out
        a, b = jnp.broadcast_arrays(a, b)
        d, borrow = sub_limbs(a, b)
        p = self.broadcast_scalar(self.p_np, d.shape[1:])
        dp, _ = add_limbs(d, p)
        return jnp.where(borrow == 1, dp, d)

    @jit_method
    def neg(self, a):
        p = self.broadcast_scalar(self.p_np, a.shape[1:])
        d, _ = sub_limbs(p, a)
        return jnp.where(is_zero(a)[None], jnp.zeros_like(a), d)

    @jit_method
    def mont_reduce(self, t32):
        """(32, *B) T < p*R  ->  (16, *B) T/R mod p."""
        pinv = self.broadcast_scalar(self.p_inv_np, t32.shape[1:])
        pl = self.broadcast_scalar(self.p_np, t32.shape[1:])
        m = mul_lo(t32[:N_LIMBS], pinv)
        mp = mul_wide(m, pl)  # (32, *B)
        # T + m*p: divisible by 2**256; keep limbs 16..31 (+ carry into 16)
        acc = t32.astype(U32) + mp  # each limb < 2**17, safe
        full, carry = carry_prop(acc, 2 * N_LIMBS)
        hi = full[N_LIMBS:]
        # carry out of limb 31 is zero when T < p*R (result < 2p < 2**255)
        return self.raw.cond_sub_p(hi)

    @jit_method
    def mul(self, a, b):
        """Montgomery product: returns a*b/R mod p (both in Montgomery form
        => result in Montgomery form).  Dispatches to the fused Pallas
        kernel on TPU for large batches (fields/pallas_ops.py)."""
        from halo2_tpu.fields import pallas_ops
        out = pallas_ops.binop("mul", self, a, b)
        if out is not None:
            return out
        a, b = jnp.broadcast_arrays(a, b)
        shape = (N_LIMBS,) + (1,) * (a.ndim - 1)
        return mont_mul_raw(a, b,
                            jnp.asarray(self.p_np).reshape(shape),
                            jnp.asarray(self.p_inv_np).reshape(shape))

    @jit_method
    def square(self, a):
        return self.raw.mul(a, a)

    @jit_method
    def to_mont(self, a_std):
        """standard-form limbs -> Montgomery form."""
        r2 = self.broadcast_scalar(self.r2_np, a_std.shape[1:])
        return self.raw.mul(a_std, r2)

    @jit_method
    def from_mont(self, a_mont):
        """Montgomery form -> standard-form limbs (canonical, < p)."""
        one = jnp.zeros_like(a_mont).at[0].set(1)
        return self.raw.mul(a_mont, one)

    @jit_method(static_argnums=(1,))
    def pow_static(self, a, e: int):
        """a**e for a static Python-int exponent.  Square-and-multiply as a
        ``lax.scan`` over the exponent bits so the compiled graph holds ONE
        square+multiply body regardless of exponent size (XLA-friendly: no
        unrolled 254-multiply chains)."""
        if e == 0:
            return self.broadcast_scalar(self.r_np, a.shape[1:])
        bitstr = bin(e)[2:]
        if len(bitstr) == 1:
            return a
        bits = jnp.asarray(np.array([int(c) for c in bitstr[1:]], np.uint32))

        def body(res, bit):
            res = self.raw.square(res)
            res = jnp.where((bit == 1), self.raw.mul(res, a), res)
            return res, None

        result, _ = jax.lax.scan(body, a, bits)
        return result

    @jit_method
    def inv(self, a):
        """Fermat inverse (0 -> 0)."""
        return self.raw.pow_static(a, self.p - 2)

    @jit_method(static_argnums=(1, 2))
    def prefix_mul(self, a, reverse: bool = False, block: int = 1024):
        """Inclusive prefix products of a (16, N) vector.

        Two-level blocked scan: N = B*S elements are laid out as B contiguous
        chunks of length S; a ``lax.scan`` over S steps computes the per-chunk
        running products with a (16, B) carry (one vectorized mul per step),
        then a second tiny scan chains the chunk totals.  Both scan bodies
        compile to a single field-mul graph — keeping XLA compile time flat in
        N (a plain associative_scan inlines the mul log2(N) times)."""
        if a.ndim != 2:
            raise ValueError("prefix_mul expects (16, N)")
        n = a.shape[1]
        if reverse:
            return jnp.flip(self.raw.prefix_mul(jnp.flip(a, 1), block=block), 1)
        B = min(block, n)
        S = -(-n // B)
        pad = B * S - n
        one_col = self.broadcast_scalar(self.r_np, (1,))
        aa = jnp.concatenate([a, jnp.broadcast_to(one_col, (N_LIMBS, pad))], 1) \
            if pad else a
        x = aa.reshape(N_LIMBS, B, S).transpose(2, 0, 1)  # (S, 16, B)

        def body(carry, xs):
            nxt = self.raw.mul(carry, xs)
            return nxt, nxt

        one_b = self.broadcast_scalar(self.r_np, (B,))
        _, chunk_pref = jax.lax.scan(body, one_b, x)  # (S, 16, B)
        totals = chunk_pref[-1]  # (16, B)
        chunk_pref = chunk_pref.transpose(1, 0, 2)  # (16, S, B) limbs-leading

        def body2(carry, t):
            # emit exclusive prefix, then fold in this chunk's total
            return self.raw.mul(carry, t), carry

        _, excl = jax.lax.scan(body2, self.broadcast_scalar(self.r_np, ()),
                               totals.transpose(1, 0))  # (B, 16)
        excl = excl.transpose(1, 0)  # (16, B) exclusive chunk prefixes
        out = self.raw.mul(chunk_pref, excl[:, None, :])  # (16, S, B)
        out = out.transpose(0, 2, 1).reshape(N_LIMBS, B * S)
        return out[:, :n]

    @jit_method
    def batch_inverse(self, a):
        """Montgomery-trick batch inversion of a (16, N) vector (one field
        inversion + O(N) muls via blocked prefix/suffix product scans).
        Zeros map to zeros (matching the reference's batch_invert semantics,
        /root/reference/halo2_proofs/src/arithmetic.rs:840-844)."""
        if a.ndim != 2:
            raise ValueError("batch_inverse expects (16, N)")
        zmask = is_zero(a)[None]  # (1, N)
        one = self.broadcast_scalar(self.r_np, a.shape[1:])
        aa = jnp.where(zmask, one, a)

        pref = self.raw.prefix_mul(aa)
        suf = self.raw.prefix_mul(aa, reverse=True)
        total_inv = self.raw.inv(pref[:, -1:])  # (16, 1)
        # inv(a_i) = prefix_{i-1} * suffix_{i+1} * total_inv
        left = jnp.concatenate([one[:, :1], pref[:, :-1]], axis=1)
        right = jnp.concatenate([suf[:, 1:], one[:, :1]], axis=1)
        out = self.raw.mul(self.raw.mul(left, right), total_inv)
        return jnp.where(zmask, jnp.zeros_like(a), out)
