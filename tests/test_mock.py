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
