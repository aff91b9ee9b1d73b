"""Pallas TPU kernels for the hot field ops.

The pure-XLA limb pipeline is memory-bound: every one of the ~40 elementwise
passes in a Montgomery multiply round-trips HBM.  These kernels run the SAME
jnp limb code (fields/limbs.py) inside a Pallas block so all intermediates
live in VMEM — HBM traffic drops to one read of each operand + one write of
the result per element (the reference's analogue is the fused `ec-gpu`
device field code, SURVEY.md §2.9).

Blocks are (16, T) limb tiles over the flattened batch; T is a multiple of
128 lanes. Kernels fall back to the plain jnp path off-TPU or for small /
ragged shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from halo2_tpu.fields import limbs as lb

import os

_TILE = 1024  # lanes per block: (33, 1024) u32 scratch ~ 135KB, well under VMEM
_ENABLED = os.environ.get("HALO2_TPU_NO_PALLAS", "") != "1"


def _backend_is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


_BODIES = {
    "mul": lambda a, b, c: lb.mont_mul_raw(a, b, c[:, 0:1], c[:, 1:2]),
    "add": lambda a, b, c: lb.add_mod_raw(a, b, c[:, 0:1]),
    "sub": lambda a, b, c: lb.sub_mod_raw(a, b, c[:, 0:1]),
}


@functools.lru_cache(maxsize=None)
def _binop_call(op: str, field_key, n: int, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    body = _BODIES[op]

    def kernel(a_ref, b_ref, consts_ref, o_ref):
        o_ref[:] = body(a_ref[:], b_ref[:], consts_ref[:])

    grid = n // tile
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((lb.N_LIMBS, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb.N_LIMBS, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb.N_LIMBS, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lb.N_LIMBS, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lb.N_LIMBS, n), jnp.uint32),
    )


@functools.lru_cache(maxsize=None)
def _field_consts(field_key):
    from halo2_tpu.fields.bn254 import Fq, Fr
    import numpy as np
    field = {"Fr": Fr, "Fq": Fq}[field_key]
    consts = np.zeros((lb.N_LIMBS, 128), np.uint32)
    consts[:, 0] = field.p_np
    consts[:, 1] = field.p_inv_np
    return consts  # numpy on purpose: trace-time constant, no tracer leaks


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
    a2 = a.reshape(lb.N_LIMBS, batch)
    b2 = b.reshape(lb.N_LIMBS, batch)
    out = _binop_call(op, field.name, batch, _TILE)(
        a2, b2, _field_consts(field.name))
    return out.reshape(a.shape)


def mont_mul(field, a, b):
    return binop("mul", field, a, b)


@functools.lru_cache(maxsize=None)
def _butterfly_call(field_key, mid: int, half: int, tile: int):
    """Fused NTT butterfly: (lo, hi, tw) -> (u, v) with
    u = lo + hi; v = (lo - hi) * tw.  The twiddle block is re-read per mid
    row via the index map (never materialized at full batch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(lo_ref, hi_ref, tw_ref, consts_ref, u_ref, v_ref):
        p = consts_ref[:, 0:1]
        pinv = consts_ref[:, 1:2]
        lo = lo_ref[:]
        hi = hi_ref[:]
        u_ref[:] = lb.add_mod_raw(lo, hi, p)
        v_ref[:] = lb.mont_mul_raw(lb.sub_mod_raw(lo, hi, p), tw_ref[:],
                                   p, pinv)

    blocks_per_row = half // tile
    grid = mid * blocks_per_row
    data_spec = pl.BlockSpec((lb.N_LIMBS, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((lb.N_LIMBS, tile),
                           lambda i: (0, i % blocks_per_row),
                           memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((lb.N_LIMBS, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[data_spec, data_spec, tw_spec, cspec],
        out_specs=(data_spec, data_spec),
        out_shape=(jax.ShapeDtypeStruct((lb.N_LIMBS, mid * half), jnp.uint32),
                   jax.ShapeDtypeStruct((lb.N_LIMBS, mid * half), jnp.uint32)),
    )


@functools.lru_cache(maxsize=None)
def _mul_tiled_call(field_key, mid: int, k: int, tile: int):
    """a: (16, mid*k), t: (16, k) -> a * t with t re-read per mid row via
    the index map (never materialized at full batch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, t_ref, consts_ref, o_ref):
        o_ref[:] = lb.mont_mul_raw(a_ref[:], t_ref[:],
                                   consts_ref[:, 0:1], consts_ref[:, 1:2])

    blocks_per_row = k // tile
    grid = mid * blocks_per_row
    data_spec = pl.BlockSpec((lb.N_LIMBS, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((lb.N_LIMBS, tile),
                          lambda i: (0, i % blocks_per_row),
                          memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((lb.N_LIMBS, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[data_spec, t_spec, cspec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((lb.N_LIMBS, mid * k), jnp.uint32),
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
    a2 = a.reshape(lb.N_LIMBS, mid * k)
    t2 = t.reshape(lb.N_LIMBS, k)
    out = _mul_tiled_call(field.name, mid, k, _TILE)(
        a2, t2, _field_consts(field.name))
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
    lo2 = lo.reshape(lb.N_LIMBS, mid * half)
    hi2 = hi.reshape(lb.N_LIMBS, mid * half)
    tw2 = tw.reshape(lb.N_LIMBS, half)
    u, v = _butterfly_call(field.name, mid, half, _TILE)(
        lo2, hi2, tw2, _field_consts(field.name))
    return u.reshape(lo.shape), v.reshape(lo.shape)
