"""Every argument in ONE proof: gate + compressed selector, permutation,
shared-table logup (2 chunked input sets), shuffle, range check, public
input — proven and verified under BOTH multiopen schemes (VERDICT round-1
item 7; the reference's lookup_api + shuffle_api + range-check examples
combined)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))

import numpy as np  # noqa: E402

from halo2_tpu.circuit import FlatFloorPlanner  # noqa: E402
from halo2_tpu.dev import MockProver  # noqa: E402
from halo2_tpu.plonk.keygen import keygen  # noqa: E402
from halo2_tpu.plonk.prover import create_proof  # noqa: E402
from halo2_tpu.plonk.verifier import verify_proof  # noqa: E402
from halo2_tpu.poly.commitment import Params  # noqa: E402

from bench_all_args import AllArgsCircuit  # noqa: E402

K = 9


@pytest.fixture(scope="module")
def setup():
    params = Params.unsafe_setup(K, seed=7)
    from halo2_tpu.plonk.circuit import ConstraintSystem
    cs = ConstraintSystem()
    AllArgsCircuit(1).configure(cs)
    cs.chunk_lookups()
    cs.chunk_shuffles()
    rows = cs.usable_rows(1 << K)
    vk, pk = keygen(params, AllArgsCircuit(rows),
                    floor_planner=FlatFloorPlanner)
    return params, vk, pk, rows


def test_structure(setup):
    _, vk, _, _ = setup
    cs = vk.cs
    assert len(cs.lookups) == 1
    assert len(cs.lookups[0].input_expressions_sets) == 2  # chunked sets
    assert len(cs.shuffles) >= 1
    assert len(cs.range_check) == 1
    assert cs.num_selectors == 1 and len(cs.selector_map) == 1


def test_mock(setup):
    _, _, _, rows = setup
    a0 = int(np.random.RandomState(5).randint(0, 16, size=1)[0])
    MockProver.run(K, AllArgsCircuit(rows), [[a0]],
                   floor_planner=FlatFloorPlanner).assert_satisfied()


@pytest.mark.parametrize("use_gwc", [True, False], ids=["gwc", "shplonk"])
def test_prove_verify_all_args(setup, use_gwc):
    params, vk, pk, rows = setup
    a0 = int(np.random.RandomState(5).randint(0, 16, size=1)[0])
    proof = create_proof(params, pk, AllArgsCircuit(rows), [[a0]], seed=0,
                         use_gwc=use_gwc, floor_planner=FlatFloorPlanner)
    assert verify_proof(params.verifier(1), vk, [[a0]], proof,
                        use_gwc=use_gwc)
    # wrong public input rejected
    assert not verify_proof(params.verifier(1), vk, [[(a0 + 1) % 17]], proof,
                            use_gwc=use_gwc)
