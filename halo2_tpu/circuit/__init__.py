"""Circuit layout layer: regions, layouter, floor planners.

Python re-design of /root/reference/halo2_proofs/src/circuit.rs (548 LoC) and
circuit/floor_planner/: the `Layouter`/`Region` API that user circuits drive,
an `Assignment` backend protocol that keygen and the prover implement, and
two floor planners:

  * SimpleFloorPlanner — single-pass sequential region placement (the
    upstream `single_pass.rs` behavior): each region starts at the current
    per-column high-water mark across all columns.
  * FlatFloorPlanner  — the fork's parallel-witness planner
    (floor_planner/flat.rs:31-95): regions keep ABSOLUTE offsets with no
    relocation, enabling parallel synthesis of independent regions.

Values are canonical Python ints mod Fr.p (or callables returning one).
"""

from __future__ import annotations

from dataclasses import dataclass

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.plonk.circuit import Column, Selector

P = Fr.p


@dataclass(frozen=True)
class Cell:
    column: Column
    row: int


@dataclass
class AssignedCell:
    cell: Cell
    value: int | None

    def value_or(self, default: int) -> int:
        return self.value if self.value is not None else default


def _resolve(value):
    v = value() if callable(value) else value
    if v is None:
        return None
    return v % P


class Assignment:
    """Backend protocol (plonk/circuit.rs:299-403)."""

    def enter_region(self, name):  # noqa: D401
        pass

    def exit_region(self):
        pass

    def enable_selector(self, selector: Selector, row: int):
        raise NotImplementedError

    def assign_advice(self, column: Column, row: int, value):
        raise NotImplementedError

    def assign_fixed(self, column: Column, row: int, value):
        raise NotImplementedError

    def copy(self, left: Cell, right: Cell):
        raise NotImplementedError

    def query_instance(self, column: Column, row: int):
        raise NotImplementedError

    def fill_from_row(self, column: Column, from_row: int, value):
        pass

    def assign_advice_bulk(self, column: Column, from_row: int, values):
        """Vectorized advice assignment (default: per-cell loop)."""
        for i, v in enumerate(values):
            self.assign_advice(column, from_row + i, v)

    def is_in_prove_mode(self) -> bool:
        return False


class Region:
    """A region view handed to user assignment closures."""

    def __init__(self, layouter: "_RegionLayouter"):
        self._l = layouter

    def assign_advice(self, annotation, column: Column, offset: int, value) -> AssignedCell:
        return self._l.assign_advice(column, offset, _resolve(value))

    def assign_advice_from_constant(self, annotation, column: Column, offset: int,
                                    constant: int) -> AssignedCell:
        cell = self._l.assign_advice(column, offset, constant % P)
        self._l.constrain_constant(cell.cell, constant % P)
        return cell

    def assign_advice_from_instance(self, annotation, instance: Column, row: int,
                                    advice: Column, offset: int) -> AssignedCell:
        value = self._l.backend.query_instance(instance, row)
        cell = self._l.assign_advice(advice, offset, value)
        self._l.backend.copy(Cell(instance, row), cell.cell)
        return cell

    def assign_fixed(self, annotation, column: Column, offset: int, value) -> AssignedCell:
        return self._l.assign_fixed(column, offset, _resolve(value))

    def assign_advice_bulk(self, annotation, column: Column, offset: int,
                           values) -> None:
        """Assign a contiguous run of advice values in one call — the
        fast path for row-filling circuits (the fork's parallel witness
        synthesis analogue)."""
        row0 = self._l._abs(offset + len(values) - 1) - (len(values) - 1)
        self._l.backend.assign_advice_bulk(column, row0, values)
        self._l.layouter.mark(column, row0 + len(values) - 1)

    def enable_selector(self, annotation, selector: Selector, offset: int):
        self._l.enable_selector(selector, offset)

    def constrain_equal(self, left: Cell, right: Cell):
        self._l.backend.copy(left, right)

    def constrain_constant(self, cell: Cell, constant: int):
        self._l.constrain_constant(cell, constant % P)


class _RegionLayouter:
    def __init__(self, layouter: "SingleChipLayouter", start: int):
        self.layouter = layouter
        self.backend = layouter.backend
        self.start = start
        self.rows_used = 0
        self.table_track = None  # {column: (first_value, rows_used)}

    def _abs(self, offset: int) -> int:
        self.rows_used = max(self.rows_used, offset + 1)
        return self.start + offset

    def assign_advice(self, column, offset, value) -> AssignedCell:
        row = self._abs(offset)
        self.backend.assign_advice(column, row, value)
        self.layouter.mark(column, row)
        return AssignedCell(Cell(column, row), value)

    def assign_fixed(self, column, offset, value) -> AssignedCell:
        row = self._abs(offset)
        self.backend.assign_fixed(column, row, value)
        self.layouter.mark(column, row)
        if self.table_track is not None:
            first, rows = self.table_track.get(column, (value, 0))
            self.table_track[column] = (first, max(rows, offset + 1))
        return AssignedCell(Cell(column, row), value)

    def enable_selector(self, selector, offset):
        row = self._abs(offset)
        self.backend.enable_selector(selector, row)
        self.layouter.mark(selector.column, row)

    def constrain_constant(self, cell, constant):
        self.layouter.constrain_constant(cell, constant)


class SingleChipLayouter:
    """Sequential region placement over one 'chip' (single_pass semantics)."""

    def __init__(self, backend: Assignment, constants: list[Column], flat: bool = False):
        self.backend = backend
        self.constants = constants
        self.flat = flat
        self.columns_high_water: dict[Column, int] = {}
        self._constants_used = 0
        self._pending_constants: list[tuple[Cell, int]] = []

    # region placement ----------------------------------------------------
    def _next_start(self) -> int:
        if self.flat:
            return 0
        return max(self.columns_high_water.values(), default=0)

    def mark(self, column: Column, row: int):
        cur = self.columns_high_water.get(column, 0)
        if row + 1 > cur:
            self.columns_high_water[column] = row + 1

    def assign_region(self, name, fn):
        start = self._next_start()
        rl = _RegionLayouter(self, start)
        self.backend.enter_region(name)
        result = fn(Region(rl))
        self.backend.exit_region()
        return result

    def assign_table(self, name, fn):
        """Table region: after assignment, each touched fixed column is
        filled to the end of the usable area with its FIRST assigned value
        (the DefaultTableValue logic of floor_planner/single_pass.rs:29-150,
        so lookups against default rows remain closed)."""
        start = self._next_start()
        rl = _RegionLayouter(self, start)
        rl.table_track = {}
        self.backend.enter_region(name)
        result = fn(Region(rl))
        self.backend.exit_region()
        for col, (first_val, rows) in rl.table_track.items():
            self.backend.fill_from_row(col, start + rows, first_val)
        return result

    def constrain_instance(self, cell: Cell, instance: Column, row: int):
        self.backend.copy(cell, Cell(instance, row))

    def constrain_constant(self, cell: Cell, constant: int):
        if not self.constants:
            raise ValueError("no constants column configured (enable_constant)")
        col = self.constants[0]
        row = self._constants_used
        self._constants_used += 1
        self.backend.assign_fixed(col, row, constant)
        self.mark(col, row)
        self.backend.copy(Cell(col, row), cell)

    def namespace(self, name):
        return self

    def get_root(self):
        return self


class SimpleFloorPlanner:
    """Single-pass sequential planner."""

    @staticmethod
    def synthesize(backend: Assignment, circuit, config, constants):
        layouter = SingleChipLayouter(backend, constants, flat=False)
        circuit.synthesize(config, layouter)


class FlatFloorPlanner:
    """Absolute-offset planner (fork's flat.rs): regions at offset 0, no
    relocation — circuits place their own absolute rows."""

    @staticmethod
    def synthesize(backend: Assignment, circuit, config, constants):
        layouter = SingleChipLayouter(backend, constants, flat=True)
        circuit.synthesize(config, layouter)
