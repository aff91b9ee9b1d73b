"""E2E for logup lookups (incl. multi-set chunking) and shuffles —
milestones 2+3 (the reference's lookup_api.rs / shuffle_api.rs example
class)."""

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

TABLE = list(range(10))
VALS_A = [3, 1, 4, 1, 5, 9, 2, 6]
VALS_B = [6, 2, 9, 5, 1, 4, 1, 3]  # permutation of VALS_A


class LkShConfig:
    def __init__(self, a, b, tc):
        self.a, self.b, self.tc = a, b, tc


class LookupShuffleCircuit(Circuit):
    """Advice a, b: both range-checked against a fixed table via ONE shared
    logup (two input sets -> exercises set chunking and z chaining); b must
    be a shuffle of a; plus one copy constraint."""

    def __init__(self, vals_a=None, vals_b=None):
        self.vals_a = vals_a
        self.vals_b = vals_b

    def without_witnesses(self):
        return LookupShuffleCircuit()

    def configure(self, meta):
        a = meta.advice_column()
        b = meta.advice_column()
        tc = meta.table_column()
        meta.enable_equality(a)
        meta.enable_equality(b)
        # both lookups share the table -> merged into one logup argument;
        # degree forces the second input into an extra set
        meta.lookup("a_range", lambda m: [(m.query_advice(a, 0), tc)])
        meta.lookup("b_range", lambda m: [(m.query_advice(b, 0), tc)])
        meta.shuffle("ab_shuffle",
                     lambda m: [(m.query_advice(a, 0), m.query_advice(b, 0))])
        return LkShConfig(a, b, tc)

    def synthesize(self, config, layouter):
        def table_fn(region):
            for i, v in enumerate(TABLE):
                region.assign_fixed("t", config.tc.inner, i, v)
        layouter.assign_table("table", table_fn)

        va = self.vals_a or [None] * len(VALS_A)
        vb = self.vals_b or [None] * len(VALS_B)

        def vals_fn(region):
            cells_a, cells_b = [], []
            for i in range(len(va)):
                cells_a.append(region.assign_advice("a", config.a, i, va[i]))
                cells_b.append(region.assign_advice("b", config.b, i, vb[i]))
            # copy constraint: a[0] == b[7] (3 == 3)
            region.constrain_equal(cells_a[0].cell, cells_b[7].cell)
            return cells_a, cells_b
        layouter.assign_region("vals", vals_fn)


@pytest.fixture(scope="module")
def setup():
    params = Params.unsafe_setup(K, seed=99)
    vk, pk = keygen(params, LookupShuffleCircuit())
    return params, vk, pk


def test_chunking_structure(setup):
    _, vk, _ = setup
    assert len(vk.cs.lookups) == 1  # merged by shared table
    assert len(vk.cs.lookups[0].input_expressions_sets) == 2  # chunked
    assert len(vk.cs.shuffles) == 1


def test_mock_lookup_shuffle():
    MockProver.run(K, LookupShuffleCircuit(VALS_A, VALS_B), []).assert_satisfied()
    # out-of-range value
    bad = list(VALS_A)
    bad[0] = 77
    fails = MockProver.run(K, LookupShuffleCircuit(bad, VALS_B), []).verify()
    assert any(f.kind == "lookup" for f in fails)
    # not a permutation
    bad_b = list(VALS_B)
    bad_b[0] = 2
    fails = MockProver.run(K, LookupShuffleCircuit(VALS_A, bad_b), []).verify()
    assert any(f.kind == "shuffle" for f in fails)


def test_prove_verify_lookup_shuffle(setup):
    params, vk, pk = setup
    proof = create_proof(params, pk, LookupShuffleCircuit(VALS_A, VALS_B), [],
                         seed=3)
    pv = params.verifier(1)
    assert verify_proof(pv, vk, [], proof)


def test_bad_witness_rejected(setup):
    params, vk, pk = setup
    bad = list(VALS_A)
    bad[2] = 77  # not in table (and breaks the shuffle)
    with pytest.raises(ValueError):
        # honest prover refuses: input value missing from table
        create_proof(params, pk, LookupShuffleCircuit(bad, VALS_B), [], seed=3)


def test_shuffle_violation_rejected(setup):
    params, vk, pk = setup
    bad_b = list(VALS_B)
    bad_b[0] = 5  # in table, but now b has two 5s and no 6 -> not a shuffle
    proof = create_proof(params, pk, LookupShuffleCircuit(VALS_A, bad_b), [],
                         seed=3)
    pv = params.verifier(1)
    assert not verify_proof(pv, vk, [], proof)
