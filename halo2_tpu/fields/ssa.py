"""Per-limb SSA field arithmetic — the minimal-op formulation for Pallas.

The vectorized (16, *B) limb code in fields/limbs.py is shaped for small XLA
graphs: whole-array ops, Kogge-Stone carry lookahead, one carry pass per
Montgomery product.  Inside a Pallas kernel the trade-offs invert: every jnp
op lowers to real VPU instructions on (8, 128) tiles, so the metric is raw
op COUNT, not graph size.  This module re-expresses the field ops with each
limb held as its own SSA value (an (8, 128)-tile-shaped array inside a
kernel), which makes limb "slicing" free and lets carries ripple
sequentially (3 ops/limb) instead of through log-depth lookahead networks.

Montgomery multiplication is CIOS (coarsely integrated operand scanning,
radix 2^16): the reduction limb m_i = t_0 * (-p^-1 mod 2^16) is interleaved
with the schoolbook accumulation, so the running total stays 17 limbs wide
and no 32-limb product is ever materialized.  Per-lane cost is ~2.7k u32
VPU ops vs ~6.3k for the separated mul_wide + mont_reduce formulation —
this is the single biggest lever on MSM/NTT throughput (the reference's
analogue is the ec-gpu generated Fr/Fq device code, SURVEY.md §2.9).

All functions take/return *lists* of N_LIMBS uint32 arrays (any common
shape; inside kernels that shape is (8, 128) — one full VPU tile).  Modulus
constants are passed as Python int tuples and become immediate scalars in
the compiled kernel (no constant operands to DMA).

Correctness bounds (all u32, no overflow):
  * canonical limbs are < 2^16; CIOS running-total limbs stay < 2^22
    (16 outer steps x 4 sixteen-bit addends + carries);
  * every product is 16b x 16b or (t_0 * pinv0) mod 2^32 whose low 16 bits
    are the exact Montgomery quotient digit (u32 wraparound preserves
    mod-2^16 arithmetic).
"""

from __future__ import annotations

import jax.numpy as jnp

from halo2_tpu.fields.limbs import LIMB_BITS, MASK, N_LIMBS

U32 = jnp.uint32


def split_limbs(x):
    """(16, *B) uint32 -> list of 16 (*B,) SSA limb values."""
    return [x[i] for i in range(N_LIMBS)]


def join_limbs(limbs):
    """List of 16 arrays -> (16, *B) uint32."""
    return jnp.stack(limbs, axis=0)


def _const(p_ints):
    return tuple(int(v) for v in p_ints)


def ripple_canon(t, n_out: int = N_LIMBS):
    """Redundant limbs (each < 2^26, value < 2^(16*n_out)) -> canonical.

    Sequential ripple: 3 ops/limb. Returns n_out canonical limbs."""
    out = []
    c = None
    for j in range(len(t)):
        s = t[j] if c is None else t[j] + c
        out.append(s & MASK)
        c = s >> LIMB_BITS
    while len(out) < n_out:
        out.append(c & MASK if c is not None else jnp.zeros_like(t[0]))
        c = c >> LIMB_BITS if c is not None else None
    return out[:n_out]


def sub_borrow(a, b_ints):
    """a (canonical limbs) minus constant b: returns (diff limbs, no_borrow).

    Two's-complement add of ~b with carry-in 1; final carry 1 iff a >= b."""
    c = None
    out = []
    for j in range(N_LIMBS):
        nb = MASK ^ b_ints[j]
        s = a[j] + (nb + 1 if c is None else nb) + (c if c is not None else 0)
        out.append(s & MASK)
        c = s >> LIMB_BITS
    return out, c  # c: 1 iff a >= b


def cond_sub_p(x, p_ints):
    """Canonical x in [0, 2p) -> x mod p (16 limbs)."""
    d, ge = sub_borrow(x, p_ints)
    return [jnp.where(ge == 1, dj, xj) for dj, xj in zip(d, x)]


def add_mod(a, b, p_ints):
    """(a + b) mod p; a, b canonical < p (or < 2p with 2p < 2^256)."""
    s = []
    c = None
    for j in range(N_LIMBS):
        t = a[j] + b[j] if c is None else a[j] + b[j] + c
        s.append(t & MASK)
        c = t >> LIMB_BITS
    # a + b < 2p < 2^256: no carry out of limb 15
    return cond_sub_p(s, p_ints)


def sub_mod(a, b, p_ints):
    """(a - b) mod p; a, b canonical < p."""
    # a + ~b + 1 over 256 bits; carry out == 1 iff a >= b
    c = None
    d = []
    for j in range(N_LIMBS):
        t = a[j] + (b[j] ^ MASK) + (1 if c is None else 0) + \
            (c if c is not None else 0)
        d.append(t & MASK)
        c = t >> LIMB_BITS
    borrowed = c == 0
    # if borrowed, add p back (ripple; a-b+p < p so no carry out)
    cc = None
    dp = []
    for j in range(N_LIMBS):
        t = d[j] + p_ints[j] if cc is None else d[j] + p_ints[j] + cc
        dp.append(t & MASK)
        cc = t >> LIMB_BITS
    return [jnp.where(borrowed, pj, dj) for pj, dj in zip(dp, d)]


def neg_mod(a, p_ints):
    """(-a) mod p; a canonical < p. 0 -> 0."""
    zero = None
    for j in range(N_LIMBS):
        zero = (a[j] == 0) if zero is None else zero & (a[j] == 0)
    c = None
    d = []
    for j in range(N_LIMBS):
        t = p_ints[j] + (a[j] ^ MASK) + (1 if c is None else 0) + \
            (c if c is not None else 0)
        d.append(t & MASK)
        c = t >> LIMB_BITS
    return [jnp.where(zero, jnp.zeros_like(dj), dj) for dj in d]


def mont_mul(a, b, p_ints, pinv0: int):
    """CIOS Montgomery product: a*b/R mod p, R = 2^256.

    a, b: canonical limb lists (< p); p_ints: 16 limb ints of the modulus;
    pinv0 = (-p^-1) mod 2^16.  Result canonical < p.

    Per outer step the running total t (17 limbs) absorbs a_i * b and
    m_i * p, then shifts one limb down; t limbs stay < 2^22 so every add is
    overflow-free in u32 and the final canonicalization is one short ripple.
    """
    p_ints = _const(p_ints)
    pinv0 = int(pinv0) & MASK
    zero = jnp.zeros_like(b[0])
    t = [zero] * (N_LIMBS + 1)
    for i in range(N_LIMBS):
        ai = a[i]
        # t += a_i * b (lo/hi split keeps every addend 16-bit)
        for j in range(N_LIMBS):
            pj = ai * b[j]
            t[j] = t[j] + (pj & MASK)
            t[j + 1] = t[j + 1] + (pj >> LIMB_BITS)
        # Montgomery quotient digit from the exact low 16 bits of t[0]
        m = (t[0] * pinv0) & MASK
        # t += m * p (p_j are immediate scalars)
        for j in range(N_LIMBS):
            qj = m * p_ints[j]
            t[j] = t[j] + (qj & MASK)
            t[j + 1] = t[j + 1] + (qj >> LIMB_BITS)
        # shift one limb: t[0] ≡ 0 mod 2^16; its high bits carry into t[1]
        carry = t[0] >> LIMB_BITS
        t = t[1:] + [zero]
        t[0] = t[0] + carry
    out = ripple_canon(t, N_LIMBS)  # value < 2p < 2^256
    return cond_sub_p(out, p_ints)


def mont_sqr(a, p_ints, pinv0: int):
    """CIOS Montgomery squaring with the symmetric-product shortcut.

    Off-diagonal partial products a_i*a_j (i<j) are computed once and
    doubled by a 1-bit shift before the lo/hi split, cutting the 16x16
    product step from 256 to 136 multiplies.  The doubled product can reach
    2^33, so it is split as (p & MASK, p >> 16) on the PRE-doubled value and
    the doubling applied to both halves (each < 2^17 — t-limb bound rises
    to < 2^23, still safe)."""
    p_ints = _const(p_ints)
    pinv0 = int(pinv0) & MASK
    zero = jnp.zeros_like(a[0])
    t = [zero] * (N_LIMBS + 1)
    for i in range(N_LIMBS):
        # diagonal term
        pii = a[i] * a[i]
        t[i] = t[i] + (pii & MASK)
        t[i + 1] = t[i + 1] + (pii >> LIMB_BITS)
        # doubled off-diagonal terms for this column pair (j > i)
        for j in range(i + 1, N_LIMBS):
            pij = a[i] * a[j]
            lo2 = (pij & MASK) << 1          # < 2^17
            hi2 = (pij >> LIMB_BITS) << 1    # < 2^17
            t[j] = t[j] + lo2
            t[j + 1] = t[j + 1] + hi2
        # interleave reduction once per outer step, as in mont_mul
        m = (t[0] * pinv0) & MASK
        for j in range(N_LIMBS):
            qj = m * p_ints[j]
            t[j] = t[j] + (qj & MASK)
            t[j + 1] = t[j + 1] + (qj >> LIMB_BITS)
        carry = t[0] >> LIMB_BITS
        t = t[1:] + [zero]
        t[0] = t[0] + carry
    out = ripple_canon(t, N_LIMBS)
    return cond_sub_p(out, p_ints)


class SSAField:
    """Field-op adapter over SSA limb lists, for the shared curve formulas
    (curves/formulas.py) and fused kernels.  Constants are Python ints baked
    into the kernel at trace time."""

    def __init__(self, p_ints, pinv0: int):
        self.p_ints = _const(p_ints)
        self.pinv0 = int(pinv0) & MASK

    def mul(self, a, b):
        return mont_mul(a, b, self.p_ints, self.pinv0)

    def square(self, a):
        return mont_sqr(a, self.p_ints, self.pinv0)

    def add(self, a, b):
        return add_mod(a, b, self.p_ints)

    def sub(self, a, b):
        return sub_mod(a, b, self.p_ints)

    def neg(self, a):
        return neg_mod(a, self.p_ints)
