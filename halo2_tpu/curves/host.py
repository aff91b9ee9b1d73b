"""Host-side (pure Python big-int) BN254 G1/G2 arithmetic — the golden model.

Used for: SRS setup scalar math, verifier-side small point ops, and as the
differential-test oracle for the device (limb-vector) kernels in
`halo2_tpu.curves.g1`.  The reference obtains this from the external
`pairing_bn256` crate (/root/reference/halo2_proofs/Cargo.toml:34); here the
golden model is exact integer arithmetic.

Points are `(x, y)` tuples of Python ints, or `None` for the identity.
"""

from __future__ import annotations

from halo2_tpu.fields.bn254 import FQ_MODULUS, FR_MODULUS

Q = FQ_MODULUS
R = FR_MODULUS

G1_GEN = (1, 2)
B = 3


def is_on_curve(p) -> bool:
    if p is None:
        return True
    x, y = p
    return (y * y - x * x * x - B) % Q == 0


def neg(p):
    if p is None:
        return None
    x, y = p
    return (x, (-y) % Q)


def add(p, q):
    """Affine addition with full special-case handling."""
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if (y1 + y2) % Q == 0:
            return None
        return double(p)
    lam = (y2 - y1) * pow(x2 - x1, Q - 2, Q) % Q
    x3 = (lam * lam - x1 - x2) % Q
    y3 = (lam * (x1 - x3) - y1) % Q
    return (x3, y3)


def double(p):
    if p is None:
        return None
    x, y = p
    if y == 0:
        return None
    lam = 3 * x * x * pow(2 * y, Q - 2, Q) % Q
    x3 = (lam * lam - 2 * x) % Q
    y3 = (lam * (x - x3) - y) % Q
    return (x3, y3)


def mul(p, k: int):
    """Scalar multiplication (double-and-add)."""
    k %= R
    acc = None
    while k:
        if k & 1:
            acc = add(acc, p)
        p = double(p)
        k >>= 1
    return acc


def msm(points, scalars):
    """Naive host MSM for testing: sum scalar_i * P_i."""
    acc = None
    for p, s in zip(points, scalars):
        acc = add(acc, mul(p, s))
    return acc


def random_point(rng):
    """A uniformly random G1 point (via random scalar times the generator)."""
    return mul(G1_GEN, rng.randrange(1, R))
