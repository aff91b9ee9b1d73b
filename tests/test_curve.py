"""G1 device-kernel differential tests vs the host big-int golden model."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from halo2_tpu.curves import g1, host
from halo2_tpu.fields.bn254 import Fr, Fq

rng = random.Random(0xBEEF)


def rand_points(n):
    return [host.random_point(rng) for _ in range(n)]


def dev(points):
    return g1.encode_points(points)


def roundtrip_proj(p_proj):
    return g1.decode_points(jnp.stack(g1.to_affine(p_proj)))


def test_encode_decode():
    pts = rand_points(8) + [None]
    assert g1.decode_points(dev(pts)) == pts


def test_add_mixed_and_complete():
    n = 16
    ps, qs = rand_points(n), rand_points(n)
    dp = g1.from_affine(tuple(dev(ps)))
    dq_aff = tuple(dev(qs))
    got = roundtrip_proj(g1.add_mixed(dp, dq_aff))
    assert got == [host.add(p, q) for p, q in zip(ps, qs)]
    # full projective add
    got2 = roundtrip_proj(g1.add(dp, g1.from_affine(dq_aff)))
    assert got2 == got


def test_add_edge_cases():
    p = rand_points(1)[0]
    cases_p = [p, p, None, p]
    cases_q = [p, host.neg(p), p, None]
    dp = g1.from_affine(tuple(dev(cases_p)))
    # identity affine input is not valid for add_mixed; use projective add,
    # mapping the identity-tagged affine (0,0) to projective (0:1:0)
    dq_aff = tuple(dev(cases_q))
    dq = g1.from_affine(dq_aff)
    ident = g1.identity((4,))
    dq = g1.select(g1.is_identity(dq_aff), ident, dq)
    dp = g1.select(g1.is_identity(tuple(dev(cases_p))), ident, dp)
    got = roundtrip_proj(g1.add(dp, dq))
    assert got == [host.add(a, b) for a, b in zip(cases_p, cases_q)]


def test_double():
    ps = rand_points(8)
    dp = g1.from_affine(tuple(dev(ps)))
    got = roundtrip_proj(g1.double(dp))
    assert got == [host.double(p) for p in ps]
    # doubling the identity
    got_id = roundtrip_proj(g1.double(g1.identity((2,))))
    assert got_id == [None, None]


def test_complete_add_handles_doubling():
    ps = rand_points(4)
    dp = g1.from_affine(tuple(dev(ps)))
    got = roundtrip_proj(g1.add(dp, dp))
    assert got == [host.double(p) for p in ps]


def test_scalar_mul():
    n = 6
    ps = rand_points(n)
    ks = [rng.randrange(Fr.p) for _ in range(n - 2)] + [0, 1]
    import halo2_tpu.fields.limbs as lb
    scal = jnp.asarray(lb.ints_to_limbs_np(ks))
    got = roundtrip_proj(g1.scalar_mul(tuple(dev(ps)), scal))
    assert got == [host.mul(p, k) for p, k in zip(ps, ks)]


def test_generator():
    gen = g1.generator()
    assert g1.decode_points(jnp.stack([gen[0][:, None], gen[1][:, None]]).reshape(2, 16, 1)) == [(1, 2)]
