"""Fused Pallas kernels for G1 point operations.

One kernel launch per complete point add/mixed-add/double: all ~12 field
muls and their limb intermediates stay in VMEM, replacing ~30 separate
field-op kernel launches (or ~1000 XLA elementwise passes) per point op —
this is the MSM/scalar-mul hot path (the analogue of the fused `ec-gpu`
curve device code, SURVEY.md §2.9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from halo2_tpu.curves import formulas
from halo2_tpu.fields import limbs as lb
from halo2_tpu.fields import pallas_ops

_TILE = 512  # (16, 512) u32 per operand; ~12 live temporaries fit VMEM


class _KernelField:
    """Field ops with modulus constants passed by reference (kernels cannot
    capture array constants)."""

    def __init__(self, consts):
        self.p = consts[:, 0:1]
        self.pinv = consts[:, 1:2]

    def mul(self, a, b):
        return lb.mont_mul_raw(a, b, self.p, self.pinv)

    def add(self, a, b):
        return lb.add_mod_raw(a, b, self.p)

    def sub(self, a, b):
        return lb.sub_mod_raw(a, b, self.p)


_FORMULAS = {
    "add": (formulas.add_complete, 6),
    "add_mixed": (formulas.add_mixed, 5),
    "double": (formulas.double_complete, 3),
}


@functools.lru_cache(maxsize=None)
def _point_call(op: str, n: int, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    formula, n_in = _FORMULAS[op]

    def kernel(*refs):
        in_refs = refs[:n_in]
        consts_ref = refs[n_in]
        out_refs = refs[n_in + 1:]
        F = _KernelField(consts_ref[:])
        coords = [r[:] for r in in_refs]
        if op == "add":
            res = formula(F, tuple(coords[:3]), tuple(coords[3:]))
        elif op == "add_mixed":
            res = formula(F, tuple(coords[:3]), tuple(coords[3:]))
        else:
            res = formula(F, tuple(coords))
        for o_ref, val in zip(out_refs, res):
            o_ref[:] = val

    grid = n // tile
    spec = pl.BlockSpec((lb.N_LIMBS, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((lb.N_LIMBS, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[spec] * n_in + [cspec],
        out_specs=(spec, spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct((lb.N_LIMBS, n), jnp.uint32)
                        for _ in range(3)),
    )


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
    from halo2_tpu.fields.pallas_ops import _field_consts
    flat = [c.reshape(lb.N_LIMBS, batch) for c in coords]
    pad = (-batch) % _TILE
    if pad:
        flat = [jnp.concatenate(
            [c, jnp.zeros((lb.N_LIMBS, pad), jnp.uint32)], axis=1)
            for c in flat]
    out = _point_call(op, batch + pad, _TILE)(*flat, _field_consts("Fq"))
    if pad:
        out = tuple(o[:, :batch] for o in out)
    return tuple(o.reshape(shape) for o in out)
