"""MSM differential tests vs host golden model."""

import random

import jax.numpy as jnp
import pytest

from halo2_tpu.curves import g1, host
from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.msm import msm_host_result

rng = random.Random(0xD15C0)


@pytest.fixture(autouse=True)
def _force_device_msm(monkeypatch):
    """These are differential tests OF the device MSM paths — disable the
    CPU-backend host fallback (msm.msm._host_fallback_ok) so they keep
    covering the device code."""
    monkeypatch.setenv("HALO2_TPU_MSM_HOST_MAX", "0")


def run_case(n, scalars=None, lanes=4, max_bits=256):
    pts = [host.random_point(rng) for _ in range(n)]
    if scalars is None:
        scalars = [rng.randrange(Fr.p) for _ in range(n)]
    dev_pts = g1.encode_points(pts)
    dev_scal = jnp.asarray(Fr.encode(scalars))
    got = msm_host_result((dev_pts[0], dev_pts[1]), dev_scal,
                          lanes=lanes, max_bits=max_bits)
    expect = host.msm(pts, scalars)
    assert got == expect


def test_msm_small():
    run_case(8)


def test_msm_with_zeros_and_ones():
    scal = [0, 1, 0, 1, 2, Fr.p - 1, 0, 12345]
    run_case(8, scalars=scal)


def test_msm_all_zero():
    run_case(4, scalars=[0, 0, 0, 0], lanes=2)


def test_msm_nondivisible_lanes():
    run_case(7, lanes=4)  # exercises padding


def test_msm_bounded_bits():
    # u16 scalars with max_bits=16 (the blinding-row fast path)
    scal = [rng.randrange(1 << 16) for _ in range(8)]
    run_case(8, scalars=scal, max_bits=16)


def test_msm_single_point():
    run_case(1, lanes=1)


@pytest.mark.slow
def test_msm_larger():
    run_case(128, lanes=16)


def test_msm_sorted_path():
    """Scatter-free sorted MSM matches host, incl. degenerate digit
    distributions (all-equal scalars)."""
    from halo2_tpu.msm.sorted import msm_sorted
    from halo2_tpu.curves import g1 as g1m
    import jax.numpy as jnp

    n = 4096
    base = [host.random_point(rng) for _ in range(8)]
    pts = [base[i % 8] for i in range(n)]
    dev_pts = g1m.encode_points(pts)
    # mixed scalars incl. a big all-ones stretch (degenerate buckets)
    scalars = [1] * (n // 2) + [rng.randrange(1 << 16) for _ in range(n // 2)]
    dev_scal = jnp.asarray(Fr.encode(scalars))
    proj = msm_sorted((dev_pts[0], dev_pts[1]), dev_scal, max_bits=16,
                      group=2, block=512)
    aff = g1m.to_affine(tuple(c[:, None] for c in proj))
    got = g1m.decode_points(jnp.stack(aff))[0]
    # host expectation over multiset (sum over 8 distinct points)
    expect = host.msm(pts, scalars)
    assert got == expect
