"""Regressions for the round-3 advisor findings (ADVICE.md round 3):
signed-negative numpy arrays must reduce mod p, never wrap through uint64;
vanishing blinding coefficients must be uniform over Fr, not [0, 2^253);
RangeCheckRel bounds are u32 (reference range_check.rs:13-15)."""

import numpy as np
import pytest

from halo2_tpu.fields.bn254 import Fr

P = Fr.p


def _mini_cs(num_advice=1):
    class _CS:
        num_advice_columns = num_advice
    return _CS()


def _column(n=16):
    class _Col:
        index = 0
    return _Col()


def test_assign_advice_bulk_signed_negatives_reduce_mod_p():
    from halo2_tpu.plonk.prover import WitnessCollection
    wc = WitnessCollection(_mini_cs(), 16, 14, [])
    vals = np.array([-1, -7, 3, 0], dtype=np.int64)
    wc.assign_advice_bulk(_column(), 0, vals)
    got = wc.advice[0]
    expect = [int(v) % P for v in vals]
    assert [int(got[i]) for i in range(4)] == expect
    assert wc.max_value[0] == max(expect)


def test_assign_advice_bulk_unsigned_fast_path_unchanged():
    from halo2_tpu.plonk.prover import WitnessCollection
    wc = WitnessCollection(_mini_cs(), 16, 14, [])
    vals = np.array([5, 7, 11], dtype=np.uint64)
    wc.assign_advice_bulk(_column(), 0, vals)
    assert isinstance(wc.advice[0], np.ndarray)
    assert wc.advice[0][:3].tolist() == [5, 7, 11]
    assert wc.max_value[0] == 11


def test_native_encode_signed_negatives_match_list_path():
    from halo2_tpu import native
    if not native.available():
        pytest.skip("native encoder unavailable")
    signed = np.array([-1, 5, -123456789], dtype=np.int64)
    via_array = native.encode_mont_np(signed, Fr)
    via_list = native.encode_mont_np([int(v) for v in signed], Fr)
    assert np.array_equal(via_array, via_list)


def test_vanishing_random_coeffs_uniform_over_fr():
    import random
    from halo2_tpu.plonk.vanishing import VanishingProver
    rng = random.Random(1234)
    n = 64
    limbs = VanishingProver._random_coeffs(rng, n)
    vals = Fr.decode(np.asarray(limbs))
    assert all(0 <= v < P for v in vals)
    # with uniform-mod-p sampling ~33.6% of draws exceed 2^253; the old
    # truncated sampler could NEVER produce one (prob of this passing by
    # luck under the old sampler: 0; failing under the new one: ~4e-12)
    assert any(v >= (1 << 253) for v in vals)


def test_range_check_rel_rejects_negative_min():
    from halo2_tpu.plonk.range_check import RangeCheckRel
    with pytest.raises(AssertionError):
        RangeCheckRel(_column(), _column(), -1, 5, 1)
    with pytest.raises(AssertionError):
        RangeCheckRel(_column(), _column(), 0, 1 << 33, 1)
