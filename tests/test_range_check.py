"""Range-check-by-sorted-column (the reference's range-check.rs example
class): origin column values constrained to [MIN, MAX] via sort column +
shuffle, with automatic prover-side fill and counting sort."""

import pytest

from halo2_tpu.dev import MockProver
from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.plonk import Circuit
from halo2_tpu.plonk.keygen import keygen
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.commitment import Params

P = Fr.p
K = 5
USABLE = 26  # 2^5 - (blinding_factors() + 1) for this circuit
MIN, MAX, STEP = 0, 7, 1
VALUES = [3, 5, 7, 1, 0, 2]


class RcConfig:
    def __init__(self, origin, l0, lact, llast):
        self.origin = origin
        self.l0, self.lact, self.llast = l0, lact, llast


class RangeCheckCircuit(Circuit):
    def __init__(self, values=None):
        self.values = values

    def without_witnesses(self):
        return RangeCheckCircuit()

    def configure(self, meta):
        l0 = meta.fixed_column()
        lact = meta.fixed_column()
        llast = meta.fixed_column()
        origin = meta.advice_column_range(l0, lact, llast, MIN, MAX, STEP)
        return RcConfig(origin, l0, lact, llast)

    def synthesize(self, config, layouter):
        vals = self.values or [None] * len(VALUES)

        def fn(region):
            region.assign_fixed("l0", config.l0, 0, 1)
            for r in range(USABLE):
                region.assign_fixed("lact", config.lact, r, 1)
            region.assign_fixed("llast", config.llast, USABLE - 1, 1)
            for i, v in enumerate(vals):
                region.assign_advice("v", config.origin, i, v)
        layouter.assign_region("rc", fn)


def test_usable_rows_assumption():
    from halo2_tpu.plonk.circuit import ConstraintSystem
    cs = ConstraintSystem()
    RangeCheckCircuit().configure(cs)
    cs.chunk_lookups()
    cs.chunk_shuffles()
    assert cs.usable_rows(1 << K) == USABLE


def test_mock_range_check():
    MockProver.run(K, RangeCheckCircuit(VALUES), []).assert_satisfied()


def test_mock_out_of_range():
    with pytest.raises(ValueError):
        # the prover-side sort refuses out-of-range values
        MockProver.run(K, RangeCheckCircuit([3, 99]), []).verify()


def test_prove_verify_range_check():
    params = Params.unsafe_setup(K, seed=21)
    vk, pk = keygen(params, RangeCheckCircuit())
    proof = create_proof(params, pk, RangeCheckCircuit(VALUES), [], seed=4)
    pv = params.verifier(1)
    assert verify_proof(pv, vk, [], proof)
