"""EvaluationDomain transform tests against host big-int polynomial math."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.poly.domain import EvaluationDomain, Polynomial

rng = random.Random(31337)
P = Fr.p


def poly_eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % P
    return acc


@pytest.fixture(scope="module")
def dom():
    return EvaluationDomain(j=4, k=4)  # n=16, quotient degree 3, ext_n=64


def test_shapes(dom):
    assert dom.n == 16
    assert dom.extended_n == 64
    assert pow(dom.omega, dom.n, P) == 1 and pow(dom.omega, dom.n // 2, P) != 1
    assert pow(dom.extended_omega, dom.extended_n, P) == 1
    assert pow(dom.g_coset, 3, P) == 1 and dom.g_coset != 1


def test_lagrange_coeff_roundtrip(dom):
    vals = [rng.randrange(P) for _ in range(dom.n)]
    lag = dom.lagrange_from_ints(vals)
    coeff = dom.lagrange_to_coeff(lag)
    # evaluations at omega^i must reproduce vals
    cs = Fr.decode(coeff.values)
    assert [poly_eval(cs, pow(dom.omega, i, P)) for i in range(dom.n)] == vals
    back = dom.coeff_to_lagrange(coeff)
    assert Fr.decode(back.values) == vals


def test_coeff_to_extended_is_coset_eval(dom):
    cs_int = [rng.randrange(P) for _ in range(dom.n)]
    coeff = dom.coeff_from_ints(cs_int)
    ext = dom.coeff_to_extended(coeff)
    got = Fr.decode(ext.values)
    expect = [
        poly_eval(cs_int, dom.g_coset * pow(dom.extended_omega, i, P) % P)
        for i in range(dom.extended_n)
    ]
    assert got == expect


def test_extended_to_coeff_roundtrip(dom):
    cs_int = [rng.randrange(P) for _ in range(dom.n)]
    coeff = dom.coeff_from_ints(cs_int)
    ext = dom.coeff_to_extended(coeff)
    back = dom.extended_to_coeff(ext)
    got = Fr.decode(back)
    tail = dom.n * dom.quotient_poly_degree
    assert got == cs_int + [0] * (tail - dom.n)


def test_divide_by_vanishing(dom):
    # h(X) = (X^n - 1) * q(X) for random q of degree < n*(qd-1)
    q_int = [rng.randrange(P) for _ in range(dom.n * (dom.quotient_poly_degree - 1))]
    h_int = [(-c) % P for c in q_int] + [0] * dom.n
    for i, c in enumerate(q_int):
        h_int[dom.n + i] = (h_int[dom.n + i] + c) % P
    # evaluate h on the extended coset directly (host), upload as extended
    ext_points = [dom.g_coset * pow(dom.extended_omega, i, P) % P for i in range(dom.extended_n)]
    h_ext = [poly_eval(h_int, pt) for pt in ext_points]
    h_poly = Polynomial(jnp.asarray(Fr.encode(h_ext)), "extended")
    q_got_ext = dom.divide_by_vanishing_poly(h_poly)
    expect = [poly_eval(q_int, pt) for pt in ext_points]
    assert Fr.decode(q_got_ext.values) == expect


def test_rotate_extended(dom):
    vals = [rng.randrange(P) for _ in range(dom.extended_n)]
    arr = jnp.asarray(Fr.encode(vals))
    rot = dom.rotate_extended(arr, 1)
    shift = 1 << (dom.extended_k - dom.k)
    assert Fr.decode(rot) == vals[shift:] + vals[:shift]
    rot_neg = dom.rotate_extended(arr, -1)
    assert Fr.decode(rot_neg) == vals[-shift:] + vals[:-shift]


def test_l_i_range(dom):
    # l_i(x) computed barycentric must match direct lagrange interpolation
    x = rng.randrange(P)
    xn = pow(x, dom.n, P)
    rots = [-2, -1, 0, 1, 5]
    got = dom.l_i_range(x, xn, rots)
    for rot, g in zip(rots, got):
        i = rot % dom.n
        num, den = 1, 1
        wi = pow(dom.omega, i, P)
        for j in range(dom.n):
            if j == i:
                continue
            wj = pow(dom.omega, j, P)
            num = num * (x - wj) % P
            den = den * (wi - wj) % P
        assert g == num * pow(den, P - 2, P) % P


def test_extended_to_coeff_streamed_matches(dom, monkeypatch):
    """The streamed large-domain path (HALO2_TPU_STREAM_NTT_MIN forced to 1)
    must produce bit-identical quotient coefficients."""
    cs_int = [rng.randrange(P) for _ in range(dom.n)]
    base = np.asarray(dom.coeff_to_extended(dom.coeff_from_ints(cs_int)).values)
    direct = dom.extended_to_coeff(Polynomial(jnp.asarray(base), "extended"))
    monkeypatch.setenv("HALO2_TPU_STREAM_NTT_MIN", "1")
    streamed = dom.extended_to_coeff(Polynomial(jnp.asarray(base), "extended"))
    assert np.array_equal(np.asarray(direct), np.asarray(streamed))
