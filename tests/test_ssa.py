"""Differential tests for the CIOS/SSA limb engine (fields/ssa.py).

The SSA formulation is what runs inside every Pallas kernel on TPU; off-TPU
those kernels fall back to the vectorized limbs.py path, so this file pins
the SSA code itself against Python-bigint golden values on CPU (the same
strategy as test_field.py; reference semantics: the `pairing_bn256` field
crate used by /root/reference/halo2_proofs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_tpu.fields.bn254 import Fq, Fr
from halo2_tpu.fields import ssa


@pytest.mark.parametrize("F", [Fr, Fq], ids=["Fr", "Fq"])
def test_ssa_ops_match_bigint(F):
    rs = np.random.RandomState(42)

    def rand_elems(k):
        out = []
        for _ in range(k):
            v = 1
            for _ in range(5):
                v = v * int(rs.randint(1, 2 ** 62))
            out.append(v % F.p)
        return out

    xs = rand_elems(48) + [0, 1, F.p - 1, F.p - 2]
    ys = rand_elems(48) + [F.p - 1, 0, F.p - 1, 1]
    a = jnp.asarray(F.encode(xs))
    b = jnp.asarray(F.encode(ys))
    al, bl = ssa.split_limbs(a), ssa.split_limbs(b)
    K = ssa.SSAField(F.p_np, F.p_inv_np[0])

    cases = [
        (K.mul(al, bl), [x * y % F.p for x, y in zip(xs, ys)], "mul"),
        (K.square(al), [x * x % F.p for x in xs], "square"),
        (K.add(al, bl), [(x + y) % F.p for x, y in zip(xs, ys)], "add"),
        (K.sub(al, bl), [(x - y) % F.p for x, y in zip(xs, ys)], "sub"),
        (K.neg(al), [(-x) % F.p for x in xs], "neg"),
    ]
    for got_limbs, want, name in cases:
        got = F.decode(np.asarray(ssa.join_limbs(got_limbs)))
        assert got == want, f"{F.name} SSA {name} mismatch"


def test_ssa_formulas_match_vectorized():
    """The complete-add formulas under the SSA field adapter must agree with
    the vectorized Fq.raw path (the off-TPU fallback)."""
    from halo2_tpu.curves import formulas

    rs = np.random.RandomState(7)
    n = 8
    K = ssa.SSAField(Fq.p_np, Fq.p_inv_np[0])

    def rand_coord():
        vals = [int(v) % Fq.p for v in rs.randint(1, 2 ** 60, size=n)]
        return jnp.asarray(Fq.encode(vals))

    p = tuple(rand_coord() for _ in range(3))
    q = tuple(rand_coord() for _ in range(3))

    got = formulas.add_complete(
        K, tuple(ssa.split_limbs(c) for c in p),
        tuple(ssa.split_limbs(c) for c in q))
    want = formulas.add_complete(Fq.raw, p, q)
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(ssa.join_limbs(g)), np.asarray(w))

    got_d = formulas.double_complete(K, tuple(ssa.split_limbs(c) for c in p))
    want_d = formulas.double_complete(Fq.raw, p)
    for g, w in zip(got_d, want_d):
        assert np.array_equal(np.asarray(ssa.join_limbs(g)), np.asarray(w))
