"""MockProver catches gate and copy violations without crypto."""

import pytest

from halo2_tpu.dev import MockProver
from halo2_tpu.fields.bn254 import Fr
from tests.test_e2e import SimpleCircuit, expected_out

P = Fr.p


def test_mock_satisfied():
    a, b = 3, 5
    MockProver.run(4, SimpleCircuit(a, b), [[expected_out(a, b)]]).assert_satisfied()


def test_mock_bad_instance():
    prover = MockProver.run(4, SimpleCircuit(3, 5), [[999]])
    fails = prover.verify()
    assert any(f.kind == "permutation" for f in fails)


def test_mock_bad_gate():
    class Bad(SimpleCircuit):
        def synthesize(self, config, layouter):
            def fn(region):
                region.enable_selector("s", config.s_mul, 0)
                region.assign_advice("x", config.a0, 0, 3)
                region.assign_advice("y", config.a1, 0, 5)
                return region.assign_advice("xy", config.a0, 1, 16)
            c = layouter.assign_region("m1", fn)
            layouter.constrain_instance(c.cell, config.instance, 0)

    prover = MockProver.run(4, Bad(), [[16]])
    fails = prover.verify()
    assert any(f.kind == "gate" for f in fails)


def test_mock_cell_not_assigned():
    """A region that enables a gate's selector but never assigns one of the
    gate's queried cells yields CellNotAssigned with the region and offset
    (dev.rs:143-155, 962-999)."""
    class Unassigned(SimpleCircuit):
        def synthesize(self, config, layouter):
            def fn(region):
                region.enable_selector("s", config.s_mul, 0)
                region.assign_advice("x", config.a0, 0, 3)
                # a1@0 (rhs) and a0@1 (out) are never assigned
                return None
            layouter.assign_region("m1", fn)

    prover = MockProver.run(4, Unassigned(), [[0]])
    fails = prover.verify()
    cna = [f for f in fails if f.kind == "cell_not_assigned"]
    assert cna, f"expected CellNotAssigned, got {fails}"
    cols = {f.column for f in cna}
    assert ("advice", 1) in cols  # a1 @ rotation 0
    assert ("advice", 0) in cols  # a0 @ rotation 1
    loc = cna[0].location
    assert loc.region_name == "m1" and loc.region_index == 0


def test_mock_verify_at_rows():
    """Row-subset verification (dev.rs:940): checking only rows before the
    broken one passes; including it fails; out-of-range rows raise."""
    class Bad(SimpleCircuit):
        def synthesize(self, config, layouter):
            def ok(region):
                region.enable_selector("s", config.s_mul, 0)
                region.assign_advice("x", config.a0, 0, 2)
                region.assign_advice("y", config.a1, 0, 3)
                region.assign_advice("xy", config.a0, 1, 6)
                return None
            layouter.assign_region("m_ok", ok)

            def bad(region):
                region.enable_selector("s", config.s_mul, 0)
                region.assign_advice("x", config.a0, 0, 3)
                region.assign_advice("y", config.a1, 0, 5)
                return region.assign_advice("xy", config.a0, 1, 16)
            c = layouter.assign_region("m_bad", bad)
            layouter.constrain_instance(c.cell, config.instance, 0)

    prover = MockProver.run(4, Bad(), [[16]])
    # the bad region starts at row 2 (m_ok occupies rows 0-1)
    early = prover.verify_at_rows(range(0, 2), range(0, 2))
    assert not any(f.kind == "gate" for f in early)
    full = prover.verify_at_rows(range(0, 4), range(0, 4))
    assert any(f.kind == "gate" for f in full)
    with pytest.raises(ValueError):
        prover.verify_at_rows([10 ** 9], [])


def test_mock_instance_mismatch_reports_values():
    """The permutation failure for a wrong public input reports both the
    instance value and the circuit's value."""
    prover = MockProver.run(4, SimpleCircuit(3, 5), [[999]])
    fails = [f for f in prover.verify() if f.kind == "permutation"]
    assert fails
    got = expected_out(3, 5)
    assert any(hex(999) in f.detail and hex(got) in f.detail for f in fails)


def test_expression_lazy_and_complexity():
    """Expression.evaluate_lazy short-circuits zero products;
    complexity() mirrors circuit.rs:820-860 costs."""
    from halo2_tpu.plonk.circuit import Constant, Sum, Product

    zero, five = Constant(0), Constant(5)
    calls = []

    def counting_const(v):
        calls.append(v)
        return v

    h = (counting_const, None, None, None,
         lambda a: (-a) % P, lambda a, b: (a + b) % P,
         lambda a, b: a * b % P, lambda a, s: a * s % P)
    # zero * five: the right side must never be evaluated
    assert Product(zero, five).evaluate_lazy(*h, 0) == 0
    assert calls == [0]
    # five * zero evaluates both (left is non-zero)
    calls.clear()
    assert Product(five, zero).evaluate_lazy(*h, 0) == 0
    assert calls == [5, 0]
    assert Constant(3).complexity() == 0
    assert Sum(five, zero).complexity() == 15
    assert Product(five, zero).complexity() == 30
