"""Device polynomial arithmetic: evaluation, Kate division, prefix sums.

TPU-first replacements for /root/reference/halo2_proofs/src/arithmetic.rs
host loops:
  * eval_polynomial (arithmetic.rs:707-735): powers-table + wide dot,
    log-depth — not Horner (sequential chains are hostile to XLA).
  * kate_division (arithmetic.rs:754-773): closed form
    q_i = b^{-(i+1)} * (p(b)-ish suffix) via blocked prefix sums — the
    sequential reverse-Horner recurrence becomes two table muls + a scan.
  * field prefix/total sums via blocked uint32 cumsum with Montgomery
    renormalization (limbs are 16-bit, so 4096-wide blocks never overflow).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.fields.limbs import MASK, N_LIMBS, U32, carry_prop, ints_to_limbs_np
from halo2_tpu.ntt.ntt import powers_table_np
from halo2_tpu.utils.jitutil import maybe_jit

F = Fr.raw
_BLOCK = 4096  # 4096 * (2^16-1) < 2^32: safe u32 accumulation width


def _normalize_redundant(acc):
    """(L<=17, *B) possibly-redundant limbs (each < 2^32) -> canonical
    Montgomery-form (16, *B) mod p.  Works for values < p*R."""
    norm, _ = carry_prop(acc, 2 * N_LIMBS)
    v = F.mont_reduce(norm)           # V * R^{-1} mod p
    r2 = F.broadcast_scalar(Fr.r2_np, v.shape[1:])
    return F.mul(v, r2)               # back to V mod p


def field_sum(a):
    """Sum along the last axis: (16, *mid, n) -> (16, *mid)."""
    while a.shape[-1] > 1:
        n = a.shape[-1]
        c = min(n, _BLOCK)
        pad = (-n) % c
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (pad,), U32)], axis=-1)
        blocks = a.reshape(a.shape[:-1] + ((n + pad) // c, c))
        partial = jnp.sum(blocks, axis=-1)        # (16, *mid, nb) < 2^28
        a = _normalize_redundant(partial)
    return a[..., 0]


def prefix_sum(a):
    """Inclusive field prefix sums along the last axis of (16, n)."""
    n = a.shape[-1]
    c = min(n, _BLOCK)
    pad = (-n) % c
    if pad:
        a = jnp.concatenate([a, jnp.zeros(a.shape[:-1] + (pad,), U32)], -1)
    nb = (n + pad) // c
    blocks = a.reshape(N_LIMBS, nb, c)
    intra = jnp.cumsum(blocks, axis=-1)           # < 2^28 per limb
    totals = _normalize_redundant(intra[:, :, -1])  # (16, nb)
    if nb > 1:
        tot_prefix = prefix_sum(totals)           # canonical (16, nb)
        excl = jnp.concatenate(
            [jnp.zeros((N_LIMBS, 1), U32), tot_prefix[:, :-1]], axis=1)
    else:
        excl = jnp.zeros((N_LIMBS, 1), U32)
    out = intra + excl[:, :, None]                # < 2^28 + 2^16
    out = _normalize_redundant(out.reshape(N_LIMBS, nb * c))
    return out[:, :n]


@functools.lru_cache(maxsize=None)
def _powers_dev_jit(n: int):
    """Device powers-table builder: log2(n) doubling rounds
    (tab_{2m} = [tab_m, tab_m * z^m]), total n Montgomery muls on device.
    The host path costs ~n Python bigint muls + an O(n) transfer — ~2 s
    per (z, n) pair at 2^20, and the prover needs several per proof (x,
    x_next, x_last, 1/x...): this was most of the k=20 'evals'/'multiopen'
    phases."""
    def run(z):
        tab = F.broadcast_scalar(Fr.r_np, (1,))      # [1] (Montgomery one)
        cur = z[:, None]                             # z^m, m = 1
        m = 1
        while m < n:
            step = min(m, n - m)
            nxt = F.mul(tab[:, :step], cur)          # z^{i+m}, i < step
            tab = jnp.concatenate([tab, nxt], axis=1)
            cur = F.mul(cur, cur)                    # z^{2m}
            m += step
        return tab
    return jax.jit(run)


class PointPowers:
    """Powers table 1, z, z^2, ... z^{n-1} for a host scalar z (Montgomery;
    cached per (z, n)).  Built on DEVICE for large n (exact: Montgomery
    muls), host-side for small n (avoids a compile per tiny size).

    LARGE tables are held in a bounded FIFO: every proof's challenges are
    fresh, so per-challenge tables (x, 1/x, b, ...) can never hit again —
    unbounded caching grew ~2 GiB of dead HBM per proof and OOMed the
    warm k=22 re-prove.  Structural tables (omega powers) stay hot because
    they are re-requested every proof and re-inserted on miss."""

    _cache: dict = {}
    _big_keys: list = []
    DEVICE_MIN = 1 << 12
    BIG_MIN = 1 << 20
    BIG_MAX_ENTRIES = int(os.environ.get("HALO2_TPU_POWERS_CACHE_BIG", "6"))

    @classmethod
    def get(cls, z: int, n: int):
        key = (z % Fr.p, n)
        tab = cls._cache.get(key)
        if tab is None:
            if n >= cls.DEVICE_MIN:
                z_l = jnp.asarray(Fr.encode_scalar(z))
                tab = _powers_dev_jit(n)(z_l)
            else:
                tab = jnp.asarray(
                    powers_table_np(z % Fr.p, n, Fr.p, Fr.to_mont_int))
            cls._cache[key] = tab
            if n >= cls.BIG_MIN:
                cls._big_keys.append(key)
                while len(cls._big_keys) > cls.BIG_MAX_ENTRIES:
                    old = cls._big_keys.pop(0)
                    cls._cache.pop(old, None)
        return tab


@maybe_jit
def _dot(coeffs, powers):
    return field_sum(F.mul(coeffs, powers))


def eval_poly(coeffs, z: int) -> int:
    """Evaluate (16, n) Montgomery coefficient vector at host scalar z;
    returns a canonical host int."""
    n = coeffs.shape[-1]
    powers = PointPowers.get(z, n)
    out = _dot(coeffs, powers)
    return Fr.decode_scalar(out)


def eval_poly_batch(coeff_list, z: int) -> list:
    """Evaluate several same-length polys at z in one device call."""
    from halo2_tpu.utils import profiling
    if not coeff_list:
        return []
    n = coeff_list[0].shape[-1]
    with profiling.span(f"eval_batch[{len(coeff_list)}x2^{n.bit_length()-1}]"):
        stack = jnp.stack(coeff_list, axis=1)          # (16, C, n)
        with profiling.span("powers"):
            powers = PointPowers.get(z, n)
        out = _dot(stack, powers[:, None, :])          # (16, C)
        with profiling.span("decode"):
            return Fr.decode(out)


@maybe_jit
def _kate_core(p, powb, powb_inv_shift):
    num = F.mul(p, powb)                      # p_j b^j
    pref = prefix_sum(num)                    # inclusive prefix
    total = pref[:, -1:]
    suffix = F.sub(total, pref)               # s_i = sum_{j>i} p_j b^j
    return F.mul(suffix, powb_inv_shift)      # q_i = s_i * b^{-(i+1)}


_KATE_CHUNK_MIN = 1 << 20


@maybe_jit(static_argnums=(3,))
def _kate_core_chunked(p, powb, powb_inv_shift, m: int = 1 << 18):
    """Memory-lean kate core for large n: the flat formulation's full-width
    carry-propagation temps (u32[32, n] each) stack to many GiB at n=2^22
    (the k=22 OOM site); here the suffix sum runs as a right-to-left
    lax.scan over m-column blocks carrying the running block total —
    per-step temps are ~32 MiB at the default m."""
    n = p.shape[1]
    nb = n // m
    num = F.mul(p, powb)
    blocks = jnp.moveaxis(num.reshape(N_LIMBS, nb, m), 1, 0)  # (nb, 16, m)
    blocks = blocks[::-1]                     # rightmost block first

    def step(carry, blk):
        pref = prefix_sum(blk)                # inclusive within block
        total = pref[:, -1:]
        suffix_in = F.sub(total, pref)        # excl-self suffix in block
        out = F.add(suffix_in, carry)
        return F.add(carry, total), out

    zero = jnp.zeros((N_LIMBS, 1), U32)
    _, outs = jax.lax.scan(step, zero, blocks)
    suffix = jnp.moveaxis(outs[::-1], 0, 1).reshape(N_LIMBS, n)
    # MISCOMPILE GUARD (round 4): without this barrier XLA:TPU fuses the
    # trailing mul into the scan's reversed/transposed output reassembly
    # and, for n >= 2^21, every output index >= n/2 comes out wrong — the
    # exact cause of "k=22 proof verifies False" (probe_k22 C).  Isolated
    # to this fusion by bisection: mul+scan fused is fine, scan+mul fused
    # fails, split programs are fine, and this barrier inside one program
    # is fine (verified at 2^21 and 2^22 against the host golden model).
    suffix = jax.lax.optimization_barrier(suffix)
    return F.mul(suffix, powb_inv_shift)


def kate_division(p, b: int):
    """(p(X) - p(b)) / (X - b) for (16, n) Montgomery coeffs, host scalar b.

    Synthetic-division quotient q_i = sum_{j>i} p_j b^{j-i-1}, computed as
    b^{-(i+1)} * suffix-sum — fully parallel (arithmetic.rs:754-773 is the
    sequential original)."""
    n = p.shape[-1]
    b = b % Fr.p
    assert b != 0, "kate_division at 0 unsupported (challenge is nonzero whp)"
    binv = pow(b, Fr.p - 2, Fr.p)
    powb = PointPowers.get(b, n)
    # b^{-(i+1)} table = binv * binv^i
    powb_inv = PointPowers.get(binv, n)
    shift = jnp.asarray(ints_to_limbs_np([Fr.to_mont_int(binv)]))
    powb_inv_shift = Fr.mul(powb_inv, shift)
    if n >= _KATE_CHUNK_MIN and n % (1 << 18) == 0:
        return _kate_core_chunked(p, powb, powb_inv_shift)
    return _kate_core(p, powb, powb_inv_shift)
