"""Two-chip composition example — the analogue of the reference's
examples/two-chip.rs: an Add chip and a Mul chip composed into a Field chip
computing d = (a + b) * c, laid out by the V1 two-pass floor planner, with
the result exposed as a public input.

Run: python examples/two_chip_example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from halo2_tpu.circuit import Chip, V1FloorPlanner
from halo2_tpu.dev import MockProver
from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.plonk import Circuit

P = Fr.p


class AddChip(Chip):
    """d = a + b over one advice-column pair (two-chip.rs AddChip)."""

    @classmethod
    def configure(cls, meta, advice):
        s_add = meta.selector()

        def add_gate(m):
            lhs = m.query_advice(advice[0], 0)
            rhs = m.query_advice(advice[1], 0)
            out = m.query_advice(advice[0], 1)
            s = m.query_selector(s_add)
            return [("add", s * (lhs + rhs - out))]

        meta.create_gate("add", add_gate)
        return cls({"advice": advice, "s_add": s_add})

    def add(self, layouter, a, b):
        cfg = self.config

        def fn(region):
            region.enable_selector("add", cfg["s_add"], 0)
            ca = region.assign_advice("lhs", cfg["advice"][0], 0, a.value)
            cb = region.assign_advice("rhs", cfg["advice"][1], 0, b.value)
            region.constrain_equal(ca.cell, a.cell)
            region.constrain_equal(cb.cell, b.cell)
            s = None if (a.value is None or b.value is None) \
                else (a.value + b.value) % P
            return region.assign_advice("sum", cfg["advice"][0], 1, s)

        return layouter.assign_region("add", fn)


class MulChip(Chip):
    """d = a * b (two-chip.rs MulChip)."""

    @classmethod
    def configure(cls, meta, advice):
        s_mul = meta.selector()

        def mul_gate(m):
            lhs = m.query_advice(advice[0], 0)
            rhs = m.query_advice(advice[1], 0)
            out = m.query_advice(advice[0], 1)
            s = m.query_selector(s_mul)
            return [("mul", s * (lhs * rhs - out))]

        meta.create_gate("mul", mul_gate)
        return cls({"advice": advice, "s_mul": s_mul})

    def mul(self, layouter, a, b):
        cfg = self.config

        def fn(region):
            region.enable_selector("mul", cfg["s_mul"], 0)
            ca = region.assign_advice("lhs", cfg["advice"][0], 0, a.value)
            cb = region.assign_advice("rhs", cfg["advice"][1], 0, b.value)
            region.constrain_equal(ca.cell, a.cell)
            region.constrain_equal(cb.cell, b.cell)
            s = None if (a.value is None or b.value is None) \
                else (a.value * b.value) % P
            return region.assign_advice("prod", cfg["advice"][0], 1, s)

        return layouter.assign_region("mul", fn)


class FieldChip(Chip):
    """Composes AddChip and MulChip: add_and_mul = (a + b) * c."""

    @classmethod
    def configure(cls, meta, advice, instance):
        for c in advice:
            meta.enable_equality(c)
        meta.enable_equality(instance)
        add = AddChip.configure(meta, advice)
        mul = MulChip.configure(meta, advice)
        return cls({"advice": advice, "instance": instance,
                    "add": add, "mul": mul})

    def load_private(self, layouter, value):
        col = self.config["advice"][0]
        return layouter.assign_region(
            "load private",
            lambda region: region.assign_advice("private", col, 0, value))

    def add_and_mul(self, layouter, a, b, c):
        ab = self.config["add"].add(layouter.namespace("a + b"), a, b)
        return self.config["mul"].mul(layouter.namespace("(a+b) * c"), ab, c)

    def expose_public(self, layouter, num, row):
        layouter.constrain_instance(num.cell, self.config["instance"], row)


class FieldCircuit(Circuit):
    def __init__(self, a=None, b=None, c=None):
        self.a, self.b, self.c = a, b, c

    def without_witnesses(self):
        return FieldCircuit()

    def configure(self, meta):
        advice = [meta.advice_column(), meta.advice_column()]
        instance = meta.instance_column()
        return FieldChip.configure(meta, advice, instance)

    def synthesize(self, config, layouter):
        a = config.load_private(layouter.namespace("load a"), self.a)
        b = config.load_private(layouter.namespace("load b"), self.b)
        c = config.load_private(layouter.namespace("load c"), self.c)
        d = config.add_and_mul(layouter, a, b, c)
        config.expose_public(layouter.namespace("expose d"), d, 0)


def main():
    a, b, c = 2, 3, 4
    d = (a + b) * c % P
    prover = MockProver.run(4, FieldCircuit(a, b, c), [[d]],
                            floor_planner=V1FloorPlanner)
    prover.assert_satisfied()
    print(f"two-chip circuit satisfied: ({a} + {b}) * {c} = {d}")

    bad = MockProver.run(4, FieldCircuit(a, b, c), [[d + 1]],
                         floor_planner=V1FloorPlanner)
    fails = bad.verify()
    assert fails, "wrong public input must fail"
    print(f"wrong instance rejected with {len(fails)} failure(s)")


if __name__ == "__main__":
    main()
