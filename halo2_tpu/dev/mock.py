"""MockProver: the no-crypto debugging backend.

Mirrors /root/reference/halo2_proofs/src/dev.rs (MockProver::run /
verify_at_rows): synthesizes into plain host matrices and re-evaluates every
gate row, permutation cycle, (and, as they land, logup / shuffle / range
check) directly — no params, no keys, no device.
"""

from __future__ import annotations

from dataclasses import dataclass

from halo2_tpu.circuit import Assignment, Cell, SimpleFloorPlanner
from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.plonk.circuit import ConstraintSystem, eval_expression_host

P = Fr.p


@dataclass
class VerifyFailure:
    kind: str       # "gate" | "permutation" | "lookup" | "shuffle"
    detail: str

    def __repr__(self):
        return f"{self.kind}: {self.detail}"


class _MockAssembly(Assignment):
    def __init__(self, cs: ConstraintSystem, n: int, usable_rows: int, instances):
        self.cs = cs
        self.n = n
        self.usable_rows = usable_rows
        self.instance = instances
        self.advice = [[0] * n for _ in range(cs.num_advice_columns)]
        self.fixed = [[0] * n for _ in range(cs.num_fixed_columns)]
        self.copies: list[tuple[Cell, Cell]] = []

    def enable_selector(self, selector, row):
        self._check(row)
        self.fixed[selector.column.index][row] = 1

    def assign_advice(self, column, row, value):
        self._check(row)
        if value is not None:
            self.advice[column.index][row] = value % P

    def assign_fixed(self, column, row, value):
        self._check(row)
        if value is not None:
            self.fixed[column.index][row] = value % P

    def copy(self, left, right):
        self.copies.append((left, right))

    def query_instance(self, column, row):
        self._check(row)
        return self.instance[column.index][row]

    def fill_from_row(self, column, from_row, value):
        if value is None:
            return
        for r in range(from_row, self.usable_rows):
            self.fixed[column.index][r] = value % P

    def _check(self, row):
        if row >= self.usable_rows:
            raise ValueError(f"row {row} exceeds usable rows {self.usable_rows}")

    def cell_value(self, column, row: int) -> int:
        row %= self.n
        if column.ctype == "advice":
            return self.advice[column.index][row]
        if column.ctype == "fixed":
            return self.fixed[column.index][row]
        return self.instance[column.index][row]


class MockProver:
    def __init__(self, cs, config, assembly, n):
        self.cs = cs
        self.config = config
        self.assembly = assembly
        self.n = n

    @classmethod
    def run(cls, k: int, circuit, instances, floor_planner=None) -> "MockProver":
        cs = ConstraintSystem()
        config = circuit.configure(cs)
        cs.chunk_lookups()
        cs.chunk_shuffles()
        n = 1 << k
        if n < cs.minimum_rows():
            raise ValueError(f"k={k} too small")
        usable = cs.usable_rows(n)
        inst_cols = [list(c) + [0] * (n - len(c)) for c in instances]
        if len(inst_cols) != cs.num_instance_columns:
            raise ValueError("wrong number of instance columns")
        assembly = _MockAssembly(cs, n, usable, inst_cols)
        planner = floor_planner or SimpleFloorPlanner
        planner.synthesize(assembly, circuit, config, cs.constants)
        from halo2_tpu.plonk.range_check import fill_and_sort
        for rel in cs.range_check:
            fill_and_sort(assembly.advice, rel, usable, -1)
        return cls(cs, config, assembly, n)

    def verify(self) -> list:
        failures = []
        cs, asm = self.cs, self.assembly
        usable = asm.usable_rows

        for gate in cs.gates:
            for pi, poly in enumerate(gate.polys):
                for row in range(usable):
                    val = eval_expression_host(
                        poly,
                        lambda q, r=row: asm.cell_value(
                            cs.fixed_queries[q.query_index][0], r + q.rotation),
                        lambda q, r=row: asm.cell_value(
                            cs.advice_queries[q.query_index][0], r + q.rotation),
                        lambda q, r=row: asm.cell_value(
                            cs.instance_queries[q.query_index][0], r + q.rotation),
                    )
                    if val != 0:
                        name = gate.constraint_names[pi] or str(pi)
                        failures.append(VerifyFailure(
                            "gate", f"{gate.name}/{name} not satisfied at row {row}"))
                        break  # one failure per constraint is enough

        for left, right in asm.copies:
            lv = asm.cell_value(left.column, left.row)
            rv = asm.cell_value(right.column, right.row)
            if lv != rv:
                failures.append(VerifyFailure(
                    "permutation",
                    f"copy {left.column}@{left.row} != {right.column}@{right.row}"))

        failures.extend(self._verify_lookups())
        failures.extend(self._verify_shuffles())
        return failures

    def _verify_lookups(self):
        out = []
        cs, asm = self.cs, self.assembly
        usable = asm.usable_rows

        def eval_at(expr, row):
            return eval_expression_host(
                expr,
                lambda q: asm.cell_value(cs.fixed_queries[q.query_index][0], row + q.rotation),
                lambda q: asm.cell_value(cs.advice_queries[q.query_index][0], row + q.rotation),
                lambda q: asm.cell_value(cs.instance_queries[q.query_index][0], row + q.rotation),
            )

        for li, lookup in enumerate(cs.lookups):
            table = set()
            for row in range(usable):
                table.add(tuple(eval_at(t, row) for t in lookup.table_expressions))
            for input_set in lookup.input_expressions_sets:
                for inputs in input_set:
                    for row in range(usable):
                        tup = tuple(eval_at(e, row) for e in inputs)
                        if tup not in table:
                            out.append(VerifyFailure(
                                "lookup", f"lookup {li} input at row {row} "
                                          f"not in table"))
                            break
        return out

    def _verify_shuffles(self):
        out = []
        cs, asm = self.cs, self.assembly
        usable = asm.usable_rows

        def eval_at(expr, row):
            return eval_expression_host(
                expr,
                lambda q: asm.cell_value(cs.fixed_queries[q.query_index][0], row + q.rotation),
                lambda q: asm.cell_value(cs.advice_queries[q.query_index][0], row + q.rotation),
                lambda q: asm.cell_value(cs.instance_queries[q.query_index][0], row + q.rotation),
            )

        for si, group in enumerate(cs.shuffles):
            for unit in group.units:
                left = sorted(tuple(eval_at(e, r) for e in unit.input_expressions)
                              for r in range(usable))
                right = sorted(tuple(eval_at(e, r) for e in unit.shuffle_expressions)
                               for r in range(usable))
                if left != right:
                    out.append(VerifyFailure(
                        "shuffle", f"shuffle group {si} is not a permutation"))
        return out

    def assert_satisfied(self):
        failures = self.verify()
        if failures:
            raise AssertionError("MockProver failures:\n" +
                                 "\n".join(map(repr, failures)))
