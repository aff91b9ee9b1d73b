"""Fused Pallas kernels for G1 point operations.

One kernel launch per complete point add/mixed-add/double: all ~12 field
muls and their limb intermediates stay in VMEM, replacing ~30 separate
field-op kernel launches (or ~1000 XLA elementwise passes) per point op —
this is the MSM/scalar-mul hot path (the analogue of the fused `ec-gpu`
curve device code, SURVEY.md §2.9).

The field arithmetic is the CIOS/SSA formulation (fields/ssa.py): each limb
an (8, 128) full-tile SSA value, ~2.3x fewer VPU ops per Montgomery product
than the vectorized formulation.  Coordinates are read as (16, 8, 128)
blocks and split into limb lists at the kernel boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from halo2_tpu.curves import formulas
from halo2_tpu.fields import limbs as lb
from halo2_tpu.fields import pallas_ops

_TILE = 1024          # lanes per block
_SUB = _TILE // 128


_FORMULAS = {
    "add": (formulas.add_complete, 6),
    "add_mixed": (formulas.add_mixed, 5),
    "double": (formulas.double_complete, 3),
}


@functools.lru_cache(maxsize=None)
def _point_call(op: str, rows: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    formula, n_in = _FORMULAS[op]
    K = pallas_ops._ssa_field("Fq")

    def kernel(*refs):
        in_refs = refs[:n_in]
        out_refs = refs[n_in:]
        coords = [pallas_ops._read(r) for r in in_refs]
        if op == "add":
            res = formula(K, tuple(coords[:3]), tuple(coords[3:]))
        elif op == "add_mixed":
            res = formula(K, tuple(coords[:3]), tuple(coords[3:]))
        else:
            res = formula(K, tuple(coords))
        for o_ref, val in zip(out_refs, res):
            pallas_ops._write(o_ref, val)

    grid = rows // _SUB
    spec = pl.BlockSpec((lb.N_LIMBS, _SUB, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[spec] * n_in,
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((lb.N_LIMBS, rows, 128), jnp.uint32)
            for _ in range(3)),
    )


@functools.lru_cache(maxsize=None)
def _add_mixed_packed_call(rows: int):
    """Mixed add where the affine operand arrives PACKED (two 16-bit limbs
    per u32 word: rows 0-7 = x, rows 8-15 = y) together with a sign row:
    unpack + conditional y-negate + complete mixed add, all in VMEM.

    This is the MSM prefix-scan workhorse: the sorted-point gather feeds
    packed words straight from HBM and the (expensive in XLA: ~14 ms per
    2^16 x 20-window round) unpack/negate relayout disappears into the
    kernel's register file."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from halo2_tpu.fields.limbs import LIMB_BITS, MASK

    K = pallas_ops._ssa_field("Fq")

    def kernel(cx_ref, cy_ref, cz_ref, pk_ref, sg_ref, ox_ref, oy_ref, oz_ref):
        carry = tuple(pallas_ops._read(r) for r in (cx_ref, cy_ref, cz_ref))
        pk = pk_ref[:]                       # (16, 8, 128) packed words
        qx, qy = [], []
        for j in range(8):
            qx.append(pk[j] & MASK)
            qx.append(pk[j] >> LIMB_BITS)
            qy.append(pk[8 + j] & MASK)
            qy.append(pk[8 + j] >> LIMB_BITS)
        sg = sg_ref[0]                       # (8, 128) u32 0/1 sign flags
        yneg = K.neg(qy)
        qy = [jnp.where(sg == 1, nj, yj) for nj, yj in zip(yneg, qy)]
        res = formulas.add_mixed(K, carry, (qx, qy))
        for o_ref, val in zip((ox_ref, oy_ref, oz_ref), res):
            pallas_ops._write(o_ref, val)

    grid = rows // _SUB
    spec = pl.BlockSpec((lb.N_LIMBS, _SUB, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, _SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[spec, spec, spec, spec, sspec],
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((lb.N_LIMBS, rows, 128), jnp.uint32)
            for _ in range(3)),
    )


def add_mixed_packed(carry, packed_xy, sign):
    """carry: (X, Y, Z) (16, *B); packed_xy: (16, *B) packed affine words
    (msm.sorted._pack_xy layout); sign: (*B,) bool/int — negate y where
    set.  Returns (X, Y, Z), or None for the jnp fallback off-TPU."""
    if not pallas_ops._backend_is_tpu() or not pallas_ops._ENABLED:
        return None
    shape = carry[0].shape
    batch = 1
    for d in shape[1:]:
        batch *= d
    if batch == 0 or batch % _TILE:
        return None
    rows = batch // 128
    flat = [c.reshape(lb.N_LIMBS, rows, 128) for c in carry]
    pk = packed_xy.reshape(lb.N_LIMBS, rows, 128)
    sg = sign.astype(jnp.uint32).reshape(1, rows, 128)
    out = _add_mixed_packed_call(rows)(*flat, pk, sg)
    return tuple(o.reshape(shape) for o in out)


def point_op(op: str, coords):
    """coords: flat list of (16, *B) coordinate arrays (same shape).
    Returns (X, Y, Z) or None to signal jnp fallback (off-TPU only).

    Batches that are not a multiple of the tile are PADDED to one (zero
    coordinates are harmless garbage lanes, sliced off after) — an inline
    jnp fallback for ragged batches costs ~70s of XLA compile per call
    site, so on TPU every batch goes through the one Mosaic kernel."""
    if not pallas_ops._backend_is_tpu() or not pallas_ops._ENABLED:
        return None
    shape = coords[0].shape
    if any(c.shape != shape for c in coords) or len(shape) < 1:
        return None
    batch = 1
    for d in shape[1:]:
        batch *= d
    if batch == 0:
        return None
    flat = [c.reshape(lb.N_LIMBS, batch) for c in coords]
    pad = (-batch) % _TILE
    if pad:
        flat = [jnp.concatenate(
            [c, jnp.zeros((lb.N_LIMBS, pad), jnp.uint32)], axis=1)
            for c in flat]
    rows = (batch + pad) // 128
    flat = [c.reshape(lb.N_LIMBS, rows, 128) for c in flat]
    out = _point_call(op, rows)(*flat)
    out = tuple(o.reshape(lb.N_LIMBS, batch + pad) for o in out)
    if pad:
        out = tuple(o[:, :batch] for o in out)
    return tuple(o.reshape(shape) for o in out)
