"""Pallas TPU kernels for the hot field ops.

The pure-XLA limb pipeline is memory-bound: every one of the ~40 elementwise
passes in a Montgomery multiply round-trips HBM.  These kernels keep all
intermediates in VMEM (one HBM read per operand + one write per result) and
run the minimal-op CIOS/SSA limb formulation (fields/ssa.py): each limb is
its own SSA value shaped (8, 128) — one full VPU tile — so limb "indexing"
is free and carries ripple in 3 ops/limb instead of Kogge-Stone networks.
~2.3x fewer VPU ops per Montgomery product than the vectorized
mul_wide+reduce formulation.  (The reference's analogue is the fused
`ec-gpu` device field code, SURVEY.md §2.9.)

Layout: the host reshapes a (16, N) limb array to (16, N/128, 128); blocks
are (16, 8, 128) = 1024 lanes.  Modulus constants are Python ints baked
into the kernel (no constant operands).  Kernels fall back to the plain jnp
path off-TPU or for small / ragged shapes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from halo2_tpu.fields import limbs as lb
from halo2_tpu.fields import ssa

_TILE = 1024          # lanes per block
_SUB = _TILE // 128   # sublane rows per block
_ENABLED = os.environ.get("HALO2_TPU_NO_PALLAS", "") != "1"


def _backend_is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.lru_cache(maxsize=None)
def _field_ints(field_key):
    from halo2_tpu.fields.bn254 import Fq, Fr
    field = {"Fr": Fr, "Fq": Fq}[field_key]
    return tuple(int(v) for v in field.p_np), int(field.p_inv_np[0])


def _ssa_field(field_key):
    p_ints, pinv0 = _field_ints(field_key)
    return ssa.SSAField(p_ints, pinv0)


def _read(ref):
    """(16, 8, 128) block -> SSA limb list of (8, 128) values."""
    x = ref[:]
    return [x[i] for i in range(lb.N_LIMBS)]


def _write(ref, limbs):
    ref[:] = jnp.stack(limbs, axis=0)


@functools.lru_cache(maxsize=None)
def _binop_call(op: str, field_key, rows: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = _ssa_field(field_key)
    body = {"mul": K.mul, "add": K.add, "sub": K.sub}[op]

    def kernel(a_ref, b_ref, o_ref):
        _write(o_ref, body(_read(a_ref), _read(b_ref)))

    grid = rows // _SUB
    spec = pl.BlockSpec((lb.N_LIMBS, _SUB, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((lb.N_LIMBS, rows, 128), jnp.uint32),
    )


def binop(op: str, field, a, b):
    """Field binary op via a Pallas kernel when profitable; else None
    (caller falls back to the jnp path).  Operands are broadcast first."""
    if not _ENABLED or not _backend_is_tpu():
        return None
    if a.ndim < 2 or b.ndim < 2:
        return None
    if a.shape != b.shape:
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
    batch = 1
    for d in a.shape[1:]:
        batch *= d
    if batch % _TILE or batch == 0:
        return None
    rows = batch // 128
    a2 = a.reshape(lb.N_LIMBS, rows, 128)
    b2 = b.reshape(lb.N_LIMBS, rows, 128)
    out = _binop_call(op, field.name, rows)(a2, b2)
    return out.reshape(a.shape)


def mont_mul(field, a, b):
    return binop("mul", field, a, b)


@functools.lru_cache(maxsize=None)
def _butterfly_call(field_key, mid: int, half: int):
    """Fused NTT butterfly: (lo, hi, tw) -> (u, v) with
    u = lo + hi; v = (lo - hi) * tw.  The twiddle block is re-read per mid
    row via the index map (never materialized at full batch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = _ssa_field(field_key)

    def kernel(lo_ref, hi_ref, tw_ref, u_ref, v_ref):
        lo = _read(lo_ref)
        hi = _read(hi_ref)
        _write(u_ref, K.add(lo, hi))
        _write(v_ref, K.mul(K.sub(lo, hi), _read(tw_ref)))

    blocks_per_row = half // _TILE
    grid = mid * blocks_per_row
    rows = mid * half // 128
    data_spec = pl.BlockSpec((lb.N_LIMBS, _SUB, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((lb.N_LIMBS, _SUB, 128),
                           lambda i: (0, i % blocks_per_row, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[data_spec, data_spec, tw_spec],
        out_specs=(data_spec, data_spec),
        out_shape=(jax.ShapeDtypeStruct((lb.N_LIMBS, rows, 128), jnp.uint32),
                   jax.ShapeDtypeStruct((lb.N_LIMBS, rows, 128), jnp.uint32)),
    )


@functools.lru_cache(maxsize=None)
def _mul_tiled_call(field_key, mid: int, k: int):
    """a: (16, mid*k), t: (16, k) -> a * t with t re-read per mid row via
    the index map (never materialized at full batch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = _ssa_field(field_key)

    def kernel(a_ref, t_ref, o_ref):
        _write(o_ref, K.mul(_read(a_ref), _read(t_ref)))

    blocks_per_row = k // _TILE
    grid = mid * blocks_per_row
    rows = mid * k // 128
    data_spec = pl.BlockSpec((lb.N_LIMBS, _SUB, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((lb.N_LIMBS, _SUB, 128),
                          lambda i: (0, i % blocks_per_row, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[data_spec, t_spec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((lb.N_LIMBS, rows, 128), jnp.uint32),
    )


def mul_tiled(field, a, t):
    """a: (16, *mid, K) times a shared table t: (16, K) (broadcast over the
    mid dims without materializing). Returns a's shape, or None (fallback).
    """
    if not _ENABLED or not _backend_is_tpu():
        return None
    k = a.shape[-1]
    tk = 1
    for d in t.shape[1:]:
        tk *= d
    if tk != k or k % _TILE:
        return None
    mid = 1
    for d in a.shape[1:-1]:
        mid *= d
    a2 = a.reshape(lb.N_LIMBS, mid * k // 128, 128)
    t2 = t.reshape(lb.N_LIMBS, k // 128, 128)
    out = _mul_tiled_call(field.name, mid, k)(a2, t2)
    return out.reshape(a.shape)


def butterfly(field, lo, hi, tw):
    """lo/hi: (16, *mid, half); tw: (16, half). Returns (u, v) or None."""
    if not _ENABLED or not _backend_is_tpu():
        return None
    half = lo.shape[-1]
    if hi.shape != lo.shape or tw.shape[-1] != half:
        return None
    if half % _TILE:
        return None
    mid = 1
    for d in lo.shape[1:-1]:
        mid *= d
    lo2 = lo.reshape(lb.N_LIMBS, mid * half // 128, 128)
    hi2 = hi.reshape(lb.N_LIMBS, mid * half // 128, 128)
    tw2 = tw.reshape(lb.N_LIMBS, half // 128, 128)
    u, v = _butterfly_call(field.name, mid, half)(lo2, hi2, tw2)
    return u.reshape(lo.shape), v.reshape(lo.shape)
