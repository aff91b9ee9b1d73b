"""V1 two-pass floor planner: slot-in strategy + end-to-end proof.

Strategy expectations mirror the reference's strategy.rs test_slot_in
(circuit/floor_planner/v1/strategy.rs:228-265)."""

import pytest

from halo2_tpu.circuit import (
    V1FloorPlanner, _RegionShape, _slot_in_biggest_advice_first,
    _first_fit_region)
from halo2_tpu.dev import MockProver
from halo2_tpu.plonk.circuit import Column
from tests.test_e2e import SimpleCircuit, expected_out


def _shape(idx, cols, rows):
    s = _RegionShape(idx)
    s.columns = set(cols)
    s.row_count = rows
    return s


def _slot_in_plain(shapes):
    """slot_in without the biggest-advice-first sort (strategy.rs:165-194)."""
    allocs = {}
    return [
        _first_fit_region(allocs, sorted(s.columns), s.row_count, 0, None)
        for s in shapes
    ]


def test_slot_in_reference_vectors():
    a0, a1, a2 = (Column(i, "advice") for i in range(3))
    starts = _slot_in_plain([
        _shape(0, [a0, a1], 15),
        _shape(1, [a2], 10),
        _shape(2, [a2, a0], 10),
    ])
    # region 1 fits beside region 0 (disjoint columns); region 2 must wait
    # for a0 to free at row 15 (a2 rows 10..15 are NOT big enough: slack).
    assert starts == [0, 0, 15]


def test_slot_in_fills_holes():
    a0, a1 = (Column(i, "advice") for i in range(2))
    starts = _slot_in_plain([
        _shape(0, [a0], 5),
        _shape(1, [a0, a1], 10),
        _shape(2, [a1], 5),   # fits in a1's hole at rows 0..5
    ])
    assert starts == [0, 5, 0]


def test_biggest_advice_first_order_preserved():
    a0, a1 = (Column(i, "advice") for i in range(2))
    shapes = [_shape(0, [a0], 2), _shape(1, [a0, a1], 8)]
    starts, _ = _slot_in_biggest_advice_first(shapes)
    # the big region is packed first (row 0); the small one lands after it
    assert starts[1] == 0 and starts[0] == 8


def test_mock_with_v1():
    a, b = 3, 5
    MockProver.run(4, SimpleCircuit(a, b), [[expected_out(a, b)]],
                   floor_planner=V1FloorPlanner).assert_satisfied()


def test_e2e_proof_with_v1():
    from halo2_tpu.plonk.keygen import keygen
    from halo2_tpu.plonk.prover import create_proof
    from halo2_tpu.plonk.verifier import verify_proof
    from halo2_tpu.poly.commitment import Params

    a, b = 3, 5
    out = expected_out(a, b)
    params = Params.unsafe_setup(4, seed=7)
    vk, pk = keygen(params, SimpleCircuit(), floor_planner=V1FloorPlanner)
    proof = create_proof(params, pk, SimpleCircuit(a, b), [[out]],
                         floor_planner=V1FloorPlanner, seed=0)
    assert verify_proof(params.verifier(1), vk, [[out]], proof)
