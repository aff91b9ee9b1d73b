"""BN254 G1 point arithmetic on limb vectors — the TPU device kernels.

Design (TPU-first): points are *structures of limb arrays* — an affine point
is ``(x, y)`` and a projective point ``(X, Y, Z)``, each coordinate a
``(16, *batch)`` uint32 Montgomery-form Fq limb array (see fields/limbs.py).
All group ops below are branch-free **complete formulas** (Renes–Costello–
Batina 2015, homogeneous projective, a=0 curves), so they vectorize over the
batch axis with no data-dependent control flow — the property that lets MSM
bucket accumulation and batched scalar-mul run as pure VPU code.

The reference gets these ops from the `pairing_bn256` crate (CPU) and the
`ec-gpu` generated CUDA device code (G1 add/double inside `MultiexpKernel`,
see SURVEY.md §2.9); this module is the TPU equivalent of that device code.

Identity (group zero) in homogeneous projective coordinates is (0 : 1 : 0).
"""

from __future__ import annotations

import jax.numpy as jnp

from halo2_tpu.fields.bn254 import Fq
from halo2_tpu.utils.jitutil import maybe_jit
from halo2_tpu.fields.limbs import N_LIMBS, is_zero

# curve formulas always run inside larger traced programs (MSM scan bodies,
# batched scalar-mul) — use the raw (inline-traced) field ops
F = Fq.raw


def _mul_by_9(a):
    """9*a via additions (b3 = 3*b = 9 for BN254's b = 3)."""
    a2 = F.add(a, a)
    a4 = F.add(a2, a2)
    a8 = F.add(a4, a4)
    return F.add(a8, a)


def identity(batch_shape=()):
    """(0 : 1 : 0) broadcast to batch_shape."""
    zero = jnp.zeros((N_LIMBS,) + tuple(batch_shape), jnp.uint32)
    one = F.broadcast_scalar(F.r_np, batch_shape)
    return (zero, one, zero)


def generator():
    """The canonical generator (1, 2) as Montgomery affine limbs."""
    import numpy as np
    x = jnp.asarray(F.encode_scalar(1))
    y = jnp.asarray(F.encode_scalar(2))
    return (x, y)


def from_affine(p_aff):
    """(x, y) affine -> (X, Y, Z) projective with Z = 1."""
    x, y = p_aff
    one = F.broadcast_scalar(F.r_np, x.shape[1:])
    return (x, y, one)


def neg(p):
    """Negate a projective (or affine, 2-tuple) point."""
    if len(p) == 2:
        x, y = p
        return (x, F.neg(y))
    x, y, z = p
    return (x, F.neg(y), z)


@maybe_jit
def add(p, q):
    """Complete projective addition (RCB15 Algorithm 7, a=0, b3=9).

    Handles identity, doubling, and inverse inputs uniformly — 12 Fq muls
    (two of which are mul-by-9 done via adds). Dispatches to the fused
    Pallas point kernel on TPU for large batches."""
    from halo2_tpu.curves import formulas, pallas_point
    out = pallas_point.point_op("add", list(p) + list(q))
    if out is not None:
        return out
    return formulas.add_complete(F, p, q)


@maybe_jit
def add_mixed(p, q_aff):
    """Complete mixed addition (RCB15 Algorithm 8): projective p + affine q.

    11 Fq muls. Complete except when q is the group identity — affine inputs
    here (SRS points, bucket feeds) are never the identity; callers that may
    feed identity-tagged affine points must mask with `select`. Fused Pallas
    kernel on TPU for large batches."""
    from halo2_tpu.curves import formulas, pallas_point
    out = pallas_point.point_op("add_mixed", list(p) + list(q_aff))
    if out is not None:
        return out
    return formulas.add_mixed(F, p, q_aff)


@maybe_jit
def double(p):
    """Complete doubling (RCB15 Algorithm 9, a=0, b3=9). 8 Fq muls."""
    from halo2_tpu.curves import formulas, pallas_point
    out = pallas_point.point_op("double", list(p))
    if out is not None:
        return out
    return formulas.double_complete(F, p)


def select(mask, p, q):
    """Elementwise point select: mask ? p : q.

    mask: bool (*batch); p, q: same-arity point tuples broadcastable to it."""
    m = mask[None]
    return tuple(jnp.where(m, a, b) for a, b in zip(p, q))


def is_identity(p):
    """(*batch,) bool: Z == 0 (projective) or (x, y) == (0, 0) (affine tag)."""
    if len(p) == 3:
        return is_zero(p[2])
    return is_zero(p[0]) & is_zero(p[1])


@maybe_jit
def to_affine(p):
    """Projective -> affine via batch inversion of Z.

    Identity points map to the affine tag (0, 0) (matching the reference's
    `CurveAffine::identity()` encoding of x = y = 0)."""
    x, y, z = p
    shape = z.shape
    zf = z.reshape(N_LIMBS, -1)
    zinv = F.batch_inverse(zf).reshape(shape)
    ax = F.mul(x, zinv)
    ay = F.mul(y, zinv)
    zero_mask = is_zero(z)[None]
    return (jnp.where(zero_mask, 0, ax), jnp.where(zero_mask, 0, ay))


@maybe_jit
def scalar_mul(p_aff, scalars_std):
    """Batched scalar multiplication: k_i * P_i for affine points.

    scalars_std: (16, *batch) uint32 limbs in STANDARD form (not Montgomery)
    — the bit pattern is the actual scalar.  Double-and-add over all 256 bits
    via lax.scan (one add+double body compiled once). Used for SRS setup;
    MSM uses the Pippenger path in halo2_tpu.msm instead."""
    import jax

    x, y = p_aff
    batch = x.shape[1:]
    # bits[j] = jth bit of each scalar, LSB first: (256, *batch) uint32
    limb_idx = jnp.arange(256) // 16
    bit_idx = jnp.arange(256) % 16
    bits = (scalars_std[limb_idx] >> bit_idx.reshape((256,) + (1,) * len(batch))) & 1

    def body(carry, bit):
        acc, base = carry
        added = add(acc, base)
        acc = select(bit == 1, added, acc)
        base = double(base)
        return (acc, base), None

    acc0 = identity(batch)
    base0 = from_affine((x, y))
    (acc, _), _ = jax.lax.scan(body, (acc0, base0), bits)
    return acc


# -- host <-> device conversion helpers -------------------------------------

def encode_points(points):
    """List of host affine points (int x, int y) or None -> (2, 16, N) device
    Montgomery limbs; identity encoded as (0, 0)."""
    import numpy as np
    xs = [0 if p is None else p[0] for p in points]
    ys = [0 if p is None else p[1] for p in points]
    ex = F.encode(xs)
    ey = F.encode(ys)
    return jnp.asarray(np.stack([ex, ey]))


def decode_points(xy):
    """(2, 16, N) device Montgomery affine limbs -> list of host points."""
    import numpy as np
    arr = np.asarray(xy)
    xs = F.decode(arr[0])
    ys = F.decode(arr[1])
    return [None if x == 0 and y == 0 else (x, y) for x, y in zip(xs, ys)]
