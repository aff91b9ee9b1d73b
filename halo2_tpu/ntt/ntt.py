"""Number-theoretic transform over BN254 Fr on limb vectors — TPU-first.

The reference's FFTs are `best_fft_cpu` (recursive rayon radix-2,
/root/reference/halo2_proofs/src/arithmetic.rs:556-705) and the CUDA
`radix_fft` kernel (staged radix-2^8, SURVEY.md §2.9).  This module is a
fresh design for XLA:

  * **Four-step (Bailey) decomposition, sublane-axis butterflies.**
    n = n1*n2; view the input as (n2, n1) [i2 rows, i1 lanes], run an
    n2-point NTT along the ROW axis (per lane column), multiply by the mid
    twiddles w^{i1*k2}, transpose the two axes, run an n1-point NTT along
    the row axis, and read the result flat — natural order, no final
    bit-reverse gather over lanes.  The crucial TPU property: butterflies
    pair *rows* (sublane direction), so every stage is full-lane-width
    vector work and the data movement per stage is contiguous row copies —
    never lane shuffles.  Lane-axis data movement happens exactly once, in
    the middle transpose.
  * Each small NTT is radix-2 DIF (natural order in, bit-reversed out; the
    bit-reversal is a cheap row gather), with the fused Pallas butterfly
    kernel doing u = lo + hi, v = (lo - hi) * w in VMEM.
  * Stage twiddles are tiny (16, h) tables; the mid twiddle table is the
    only n-sized constant (same footprint as a classic full power table).

Transforms are along the LAST axis; arrays are limbs-leading
``(16, *batch, n)``.

Multi-chip: `halo2_tpu.ntt.distributed` implements the distributed variant
(local NTTs + twiddle + all-to-all transpose) over a jax.sharding.Mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from halo2_tpu.fields.bn254 import Fr, FR_ROOT_OF_UNITY, FR_S
from halo2_tpu.fields.limbs import N_LIMBS, ints_to_limbs_np

F = Fr.raw


@functools.lru_cache(maxsize=None)
def bit_reverse_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def powers_table_np(base: int, count: int, p: int, to_mont) -> np.ndarray:
    """(16, count) Montgomery limbs of base^0..base^{count-1}."""
    vals = []
    acc = 1
    for _ in range(count):
        vals.append(to_mont(acc))
        acc = acc * base % p
    return ints_to_limbs_np(vals)


class NTT:
    """NTT context for one domain size n = 2^log_n with root omega.

    omega: a primitive n-th root of unity in Fr (canonical int form).
    """

    def __init__(self, log_n: int, omega: int | None = None):
        if log_n > FR_S:
            raise ValueError(f"2^{log_n} exceeds Fr 2-adicity 2^{FR_S}")
        self.log_n = log_n
        self.n = 1 << log_n
        if omega is None:
            omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_S - log_n), Fr.p)
        self.omega = omega
        self.omega_inv = pow(omega, Fr.p - 2, Fr.p)
        self.n_inv = pow(self.n, Fr.p - 2, Fr.p)

        # four-step split: n = n1 * n2, n1 = 2^ceil(L/2) on lanes first
        self.l1 = (log_n + 1) // 2
        self.n1 = 1 << self.l1
        self.n2 = self.n >> self.l1

        self._tables_np_cache = {}
        self._tables_dev_cache = {}

    @functools.cached_property
    def n_inv_mont(self):
        return Fr.encode_scalar(self.n_inv)

    # -- twiddle tables -----------------------------------------------------
    def _tables_np(self, inverse: bool):
        """Numpy table pytree for one direction (cached).

        {'inner': [(16, h) per stage of the n2-point NTT],
         'outer': [(16, h) per stage of the n1-point NTT],
         'mid':   (16, n2, n1) w^{i1*k2},
         'rev1':  (n1,) bit-reverse, 'rev2': (n2,)}
        """
        if inverse in self._tables_np_cache:
            return self._tables_np_cache[inverse]
        w = self.omega_inv if inverse else self.omega
        n, n1, n2 = self.n, self.n1, self.n2
        # full power table once (O(n) bigint muls), then slice/gather
        full = powers_table_np(w, max(n, 1), Fr.p, Fr.to_mont_int)  # (16, n)

        def stage_tables(m: int, root_step: int):
            # m-point NTT with root w^root_step; stage s twiddle
            # tw[j] = (w^root_step)^(j * 2^s), j in [0, m >> (s+1))
            out = []
            L = m.bit_length() - 1
            for s in range(L):
                h = m >> (s + 1)
                idx = (np.arange(h, dtype=np.int64) << s) * root_step % n
                out.append(np.ascontiguousarray(full[:, idx]))
            return out

        i1 = np.arange(n1, dtype=np.int64)
        k2 = np.arange(n2, dtype=np.int64)
        mid_idx = (k2[:, None] * i1[None, :]) % n          # (n2, n1)
        tables = {
            "inner": stage_tables(n2, n1),
            "outer": stage_tables(n1, n2),
            "mid": np.ascontiguousarray(
                full[:, mid_idx.reshape(-1)].reshape(N_LIMBS, n2, n1)),
            "rev1": bit_reverse_indices(self.l1),
            "rev2": bit_reverse_indices(self.log_n - self.l1),
        }
        self._tables_np_cache[inverse] = tables
        return tables

    def _tables_dev(self, inverse: bool):
        if inverse not in self._tables_dev_cache:
            self._tables_dev_cache[inverse] = jax.tree_util.tree_map(
                jax.device_put, self._tables_np(inverse))
        return self._tables_dev_cache[inverse]

    # ------------------------------------------------------------------
    @staticmethod
    def _small_ntt(x, stage_tws, rev):
        """Radix-2 DIF along axis 2. x: (16, B, m, w); natural order in,
        natural order out (bit-reversal undone by a row gather).

        Butterflies pair ROWS: stage s splits each 2h-row block into
        (lo, hi) halves — contiguous row slices, full lane width — and the
        fused Pallas butterfly computes u = lo+hi, v = (lo-hi)*tw in VMEM.
        """
        from halo2_tpu.fields import pallas_ops
        L = len(stage_tws)
        if L == 0:
            return x
        m = 1 << L
        _, B, _, w = x.shape
        for s, tw in enumerate(stage_tws):
            h = m >> (s + 1)
            blocks = 1 << s
            xb = x.reshape(N_LIMBS, B * blocks, 2, h * w)
            lo = xb[:, :, 0, :]
            hi = xb[:, :, 1, :]
            # (16, h) -> (16, h*w): each twiddle repeated across the lane dim
            twf = jnp.broadcast_to(
                jnp.asarray(tw)[:, :, None], (N_LIMBS, h, w)
            ).reshape(N_LIMBS, h * w)
            fused = pallas_ops.butterfly(Fr, lo, hi, twf)
            if fused is not None:
                u, v = fused
            else:
                u = F.add(lo, hi)
                v = F.mul(F.sub(lo, hi), twf[:, None, :])
            x = jnp.stack([u, v], axis=2).reshape(N_LIMBS, B, m, w)
        return jnp.take(x, jnp.asarray(rev), axis=2)

    def _transform(self, a, tables):
        """Four-step NTT along the last axis. a: (16, *mid, n) Montgomery
        limbs; returns the same shape, natural order."""
        from halo2_tpu.fields import pallas_ops
        n, n1, n2 = self.n, self.n1, self.n2
        if n == 1:
            return a
        shape = a.shape
        B = 1
        for d in shape[1:-1]:
            B *= d
        x = a.reshape(N_LIMBS, B, n2, n1)                  # [i2, i1]
        x = self._small_ntt(x, tables["inner"], tables["rev2"])  # -> [k2, i1]
        mid = jnp.asarray(tables["mid"])                   # (16, n2, n1)
        scaled = pallas_ops.mul_tiled(
            Fr, x.reshape(N_LIMBS, B, n2 * n1), mid.reshape(N_LIMBS, n2 * n1))
        if scaled is not None:
            x = scaled.reshape(N_LIMBS, B, n2, n1)
        else:
            x = F.mul(x, mid[:, None])
        x = jnp.swapaxes(x, 2, 3)                          # [i1, k2]
        x = self._small_ntt(x, tables["outer"], tables["rev1"])  # -> [k1, k2]
        return x.reshape(shape)

    @functools.cached_property
    def _fwd_jit(self):
        return jax.jit(lambda a, tb: self._transform(a, tb))

    @functools.cached_property
    def _inv_jit(self):
        def run(a, tb):
            out = self._transform(a, tb)
            return F.mul(out, self.n_inv_mont.reshape((N_LIMBS,) + (1,) * (a.ndim - 1)))
        return jax.jit(run)

    def forward(self, a):
        """Coefficients -> evaluations at {omega^i}. a: (16, *mid, n) Montgomery."""
        from halo2_tpu.utils import profiling
        profiling.incr("ntt_calls")
        return self._fwd_jit(a, self._tables_dev(False))

    def inverse(self, a):
        """Evaluations -> coefficients (divides by n)."""
        from halo2_tpu.utils import profiling
        profiling.incr("ntt_calls")
        return self._inv_jit(a, self._tables_dev(True))

    @functools.cached_property
    def _inv_jit_donated(self):
        def run(a, tb):
            out = self._transform(a, tb)
            return F.mul(out, self.n_inv_mont.reshape(
                (N_LIMBS,) + (1,) * (a.ndim - 1)))
        return jax.jit(run, donate_argnums=(0,))

    def inverse_donated(self, a):
        """inverse() that DONATES the input buffer — for callers whose
        Lagrange form dies at this transform (the prover's step-7 iNTTs:
        512 MiB per column stack at k=22 feeds the transform in place
        instead of doubling the working set).  A separate jit from
        `inverse` so other call sites keep non-donating semantics."""
        from halo2_tpu.utils import profiling
        profiling.incr("ntt_calls")
        return self._inv_jit_donated(a, self._tables_dev(True))

    def inverse_nodiv(self, a):
        """Inverse transform WITHOUT the 1/n divisor (callers fold the
        divisor into other constants, like the reference's ifft_divisor,
        /root/reference/halo2_proofs/src/poly/domain.rs:124-131)."""
        return self._fwd_jit(a, self._tables_dev(True))

    def inverse_streamed_nodiv(self, a, chunks_log: int = 3):
        """Inverse transform WITHOUT the 1/n divisor, as a host-orchestrated
        sequence of chunked programs — the large-domain memory-relief path
        (the analogue of the reference's transient-buffer extended-FFT
        discipline, evaluation_gpu.rs:863-911): instead of one program
        whose working set is several n-sized temporaries, the four-step
        structure is cut into 2^chunks_log lane-chunks per half:

          phase 1 (per chunk of i1 lanes): inner n2-point NTT + mid
            twiddle + transpose, written into a donated (16, n1, n2)
            buffer — in place;
          phase 2 (per chunk of k2 lanes): outer n1-point NTT in place.

        Peak live HBM = input + output + mid table + one chunk's
        temporaries, vs ~4-6 n-sized buffers for the monolithic program.
        Bit-identical to inverse_nodiv (same butterflies, same twiddles,
        same order).  a: (16, n) on device; returns (16, n) natural order.
        """
        n, n1, n2 = self.n, self.n1, self.n2
        assert a.shape == (N_LIMBS, n)
        tb = self._tables_np(True)
        mid = self.mid_dev(True)                       # (16, n2, n1) device
        w1 = max(n1 >> chunks_log, 1)
        w2 = max(n2 >> chunks_log, 1)
        small_ntt = self._small_ntt

        @functools.partial(jax.jit, donate_argnums=(1,),
                           static_argnames=("w",))
        def step_inner(x, out, mid, c0, *, w):
            chunk = jax.lax.dynamic_slice(x, (0, 0, c0), (N_LIMBS, n2, w))
            midc = jax.lax.dynamic_slice(mid, (0, 0, c0), (N_LIMBS, n2, w))
            y = small_ntt(chunk.reshape(N_LIMBS, 1, n2, w),
                          tb["inner"], tb["rev2"])
            y = F.mul(y.reshape(N_LIMBS, n2, w), midc)
            y = jnp.swapaxes(y, 1, 2)                  # (16, w, n2)
            return jax.lax.dynamic_update_slice(out, y, (0, c0, 0))

        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnames=("w",))
        def step_outer(out, c0, *, w):
            chunk = jax.lax.dynamic_slice(out, (0, 0, c0), (N_LIMBS, n1, w))
            y = small_ntt(chunk.reshape(N_LIMBS, 1, n1, w),
                          tb["outer"], tb["rev1"])
            return jax.lax.dynamic_update_slice(
                out, y.reshape(N_LIMBS, n1, w), (0, 0, c0))

        x = a.reshape(N_LIMBS, n2, n1)
        out = jnp.zeros((N_LIMBS, n1, n2), jnp.uint32)
        for c0 in range(0, n1, w1):
            out = step_inner(x, out, mid, c0, w=w1)
        x = None                                       # release the input
        for c0 in range(0, n2, w2):
            out = step_outer(out, c0, w=w2)
        return out.reshape(N_LIMBS, n)

    def drop_dev_tables(self, inverse: bool | None = None):
        """Release cached DEVICE twiddle tables (the mid table is 64 B x n
        — 512 MiB at ext_k 23).  Host numpy copies remain in
        _tables_np_cache, so the next transform re-uploads lazily; callers
        use this to reclaim HBM between a proof's extension-heavy phase
        and its memory-peak construct phase."""
        for key in list(self._tables_dev_cache):
            key_inv = key[1] if isinstance(key, tuple) else key
            if inverse is None or key_inv == inverse:
                del self._tables_dev_cache[key]

    def mid_dev(self, inverse: bool):
        """The (16, n2, n1) mid-twiddle table as a DEVICE array — the O(n)
        table that callers of the *_traced methods at large n must thread
        through their jit as an ARGUMENT: baked as an HLO constant it is
        64 B x n (134 MB at ext_k=21), which blows the axon tunnel's
        remote-compile request limit (HTTP 413) and bloats every cache
        entry.  The stage tables are O(sqrt n) and stay constants."""
        key = ("mid", inverse)
        if key not in self._tables_dev_cache:
            self._tables_dev_cache[key] = jax.device_put(
                np.asarray(self._tables_np(inverse)["mid"]))
        return self._tables_dev_cache[key]

    # traceable versions for composition inside larger jitted programs.
    # Twiddles enter as numpy trace constants (the caller's program owns
    # them, XLA keeps them as literals) UNLESS the caller passes `mid` —
    # mandatory for large domains, see mid_dev above.
    def forward_traced(self, a, mid=None):
        tb = self._tables_np(False)
        if mid is not None:
            tb = dict(tb, mid=mid)
        return self._transform(a, tb)

    def inverse_traced(self, a, mid=None):
        tb = self._tables_np(True)
        if mid is not None:
            tb = dict(tb, mid=mid)
        out = self._transform(a, tb)
        return F.mul(out, self.n_inv_mont.reshape((N_LIMBS,) + (1,) * (a.ndim - 1)))


@functools.lru_cache(maxsize=None)
def get_ntt(log_n: int) -> NTT:
    """Cached standard-domain NTT (omega = canonical 2^log_n root)."""
    return NTT(log_n)
