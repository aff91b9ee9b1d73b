"""Pairing sanity: bilinearity and non-degeneracy (host-side, pure Python)."""

import pytest

from halo2_tpu.curves import host
from halo2_tpu.pairing import bn254 as pr


def test_g2_generator_on_curve():
    assert pr.g2_is_on_curve(pr.G2_GEN)
    assert pr.g2_is_on_curve(pr.g2_mul(pr.G2_GEN, 5))
    # order: r * G2 = identity
    assert pr.g2_mul(pr.G2_GEN, pr.R) is None


def test_fq12_arithmetic():
    a = pr.FQ12(tuple(range(1, 13)))
    b = pr.FQ12(tuple(range(7, 19)))
    assert a * a.inv() == pr.FQ12.one()
    assert (a * b) / b == a
    assert a ** (pr.Q ** 12 - 1) == pr.FQ12.one()  # Fermat in FQ12


@pytest.mark.slow
def test_pairing_bilinear():
    g1 = host.G1_GEN
    g2 = pr.G2_GEN
    e = pr.pairing(g2, g1)
    assert e != pr.FQ12.one()
    # e(2P, Q) == e(P, Q)^2 == e(P, 2Q)
    e2a = pr.pairing(g2, host.mul(g1, 2))
    e2b = pr.pairing(pr.g2_mul(g2, 2), g1)
    assert e2a == e * e
    assert e2b == e * e
    # e(aP, bQ) == e(P, Q)^(ab)
    a, b = 117, 2031
    eab = pr.pairing(pr.g2_mul(g2, b), host.mul(g1, a))
    assert eab == e ** (a * b)


@pytest.mark.slow
def test_pairing_check_kzg_style():
    # simulate a KZG check: commit C = s*G1; prove C opens to s at ...
    # sanity: e(s*G1, G2) * e(-G1, s*G2) == 1
    s = 0xDEADBEEF
    lhs = host.mul(host.G1_GEN, s)
    assert pr.pairing_check([
        (lhs, pr.G2_GEN),
        (host.neg(host.G1_GEN), pr.g2_mul(pr.G2_GEN, s)),
    ])
    assert not pr.pairing_check([
        (lhs, pr.G2_GEN),
        (host.neg(host.G1_GEN), pr.g2_mul(pr.G2_GEN, s + 1)),
    ])


def test_frobenius_matches_generic_pow():
    a = pr.FQ12(tuple(range(3, 15)))
    assert pr.frobenius(a) == a ** pr.Q
    assert pr.frobenius_k(a, 2) == a ** (pr.Q ** 2)
    assert pr.conjugate(a) == a ** (pr.Q ** 6)


def test_final_exponentiation_matches_generic_pow():
    f = pr.FQ12(tuple(range(5, 17)))
    assert pr.final_exponentiation(f) == f ** ((pr.Q ** 12 - 1) // pr.R)


@pytest.mark.slow
def test_prepared_miller_matches_generic():
    from halo2_tpu.curves import host
    g1 = host.mul(host.G1_GEN, 777)
    g2 = pr.g2_mul(pr.G2_GEN, 1234)
    prep = pr.G2Prepared(g2)
    fast = pr.final_exponentiation(prep.miller_loop(g1))
    slow = pr.miller_loop(pr.twist(g2), pr.cast_g1_to_fq12(g1))
    assert fast == slow


def test_g2_line_disk_cache_roundtrip(tmp_path, monkeypatch):
    """The on-disk prepared-lines format must reconstruct a G2Prepared
    whose Miller loop matches a freshly computed one (bn254.prepare_g2
    disk path)."""
    from halo2_tpu.curves import host
    import halo2_tpu.pairing.bn254 as pr

    monkeypatch.setattr(pr, "_G2_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(pr, "_PREPARED_CACHE", {})
    q = pr.g2_mul(pr.G2_GEN, 987654321)
    fresh = pr.prepare_g2(q)          # computes + writes the file
    monkeypatch.setattr(pr, "_PREPARED_CACHE", {})
    loaded = pr.prepare_g2(q)         # must come from disk
    assert loaded is not fresh
    p = host.mul(host.G1_GEN, 31337)
    assert loaded.miller_loop(p) == fresh.miller_loop(p)
    assert pr.final_exponentiation(
        loaded.miller_loop(p)) == pr.pairing(q, p)
