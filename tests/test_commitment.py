"""Params: setup invariants, commit(coeff) == commit_lagrange(values),
serialization roundtrip, KZG pairing identity on the SRS."""

import io
import random

import jax.numpy as jnp
import pytest

from halo2_tpu.curves import g1, host
from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.msm import msm
from halo2_tpu.ntt.ntt import get_ntt
from halo2_tpu.pairing import bn254 as pr
from halo2_tpu.poly.commitment import Params

rng = random.Random(0x5E75)
K = 3


@pytest.fixture(scope="module")
def params():
    return Params.unsafe_setup(K, seed=42)


def msm_affine(params_base, scal_ints):
    proj = msm((params_base[0], params_base[1]), jnp.asarray(Fr.encode(scal_ints)))
    return g1.decode_points(jnp.stack(g1.to_affine(tuple(p[:, None] for p in proj))))[0]


def test_setup_g_is_powers_chain(params):
    """g_{i+1} relates to g_i by the same unknown s: check via pairing-free
    structure — g[0] must be the generator; Lagrange basis sums to g[0]+...
    Instead verify commit consistency below; here check g[0] == G1 gen."""
    g_pts = g1.decode_points(params.g)
    assert g_pts[0] == host.G1_GEN
    gl_pts = g1.decode_points(params.g_lagrange)
    # sum of all Lagrange bases = sum_i L_i(s) * G = 1's poly at s * G...
    # specifically sum_i L_i(X) = 1, so sum gl = G1 generator
    acc = None
    for p in gl_pts:
        acc = host.add(acc, p)
    assert acc == host.G1_GEN


def test_commit_coeff_equals_commit_lagrange(params):
    """The key backend invariant (commitment.rs:439-495 test)."""
    n = params.n
    coeffs = [rng.randrange(Fr.p) for _ in range(n)]
    ntt = get_ntt(K)
    evals = Fr.decode(ntt.forward(jnp.asarray(Fr.encode(coeffs))))
    c1 = msm_affine(params.g, coeffs)
    c2 = msm_affine(params.g_lagrange, evals)
    assert c1 == c2


def test_srs_pairing_structure(params):
    """e(g[1], G2) == e(g[0], s_g2): g[1] = s*G."""
    g_pts = g1.decode_points(params.g)
    assert pr.pairing_check([
        (g_pts[1], pr.G2_GEN),
        (host.neg(g_pts[0]), params.s_g2),
    ])


def test_serialization_roundtrip(params):
    buf = io.BytesIO()
    params.write(buf)
    buf.seek(0)
    back = Params.read(buf)
    assert back.k == params.k
    assert g1.decode_points(back.g) == g1.decode_points(params.g)
    assert g1.decode_points(back.g_lagrange) == g1.decode_points(params.g_lagrange)
    assert back.s_g2 == params.s_g2


def test_verifier_params(params):
    pv = params.verifier(2)
    assert len(pv.g_lagrange) == 2
    vals = [5, 7]
    com = pv.commit_lagrange(vals)
    gl_pts = g1.decode_points(params.g_lagrange)
    expect = host.add(host.mul(gl_pts[0], 5), host.mul(gl_pts[1], 7))
    assert com == expect
