"""Region-based assignment engine (SimpleFloorPlanner equivalent).

Behavioral equivalent of the reference's external halo2 single-chip layouter
(SURVEY.md 2.2 `Layouter`/`SimpleFloorPlanner`): each region is measured with
a dry "shape" pass (columns used + row span), then placed at the maximum
cursor over the region-columns it touches, and cursors advance to
start + row_count.  This reproduces halo2's (quirky, sparse) row layout —
e.g. the Collatz circuit's quadratic row usage that forces k=10
(reference: circuits/src/collatz.rs:121-135 assigns offsets row, row+1 inside
region `row`).

Constants queued by assign_advice_from_constant / constrain_constant are
flushed after each region into the constants-enabled fixed column at its own
cursor, with an equality copy — matching halo2's SingleChipLayouter.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..field.bn254 import FR_MOD
from .constraint_system import Column, ConstraintSystem, Selector


@dataclass(frozen=True)
class Cell:
    region_index: int
    column: Column
    offset: int


@dataclass(frozen=True)
class AssignedCell:
    """A cell plus the (possibly unknown) value written into it — the gadget
    API's unit of data flow (halo2's AssignedCell equivalent)."""

    cell: Cell
    value: int | None


def _as_cell(c) -> Cell:
    return c.cell if isinstance(c, AssignedCell) else c


class Assignment:
    """The synthesized trace: column values + copy constraints."""

    def __init__(self, cs: ConstraintSystem, k: int, instances=None):
        self.cs = cs
        self.k = k
        self.n = 1 << k
        n = self.n
        self.advice = [[None] * n for _ in range(cs.num_advice)]
        self.fixed = [[0] * n for _ in range(cs.num_fixed)]
        self.selectors = [[0] * n for _ in range(cs.num_selectors)]
        self.instances = instances or [[] for _ in range(cs.num_instance)]
        self.copies: list[tuple[tuple[Column, int], tuple[Column, int]]] = []
        self.max_row_touched = -1
        # (name, start_row, row_count, columns) per region — consumed by the
        # layout renderer (viz/), the CircuitLayout equivalent
        self.regions: list[tuple[str, int, int, list]] = []

    def instance_value(self, col: int, row: int):
        vals = self.instances[col]
        return vals[row] % FR_MOD if row < len(vals) else 0



class _RegionShape:
    def __init__(self):
        self.columns = set()
        self.row_count = 0

    def track(self, col, offset: int):
        self.columns.add(col)
        self.row_count = max(self.row_count, offset + 1)


class Region:
    def __init__(self, layouter: "SimpleLayouter", index: int, shape_mode: bool,
                 start: int = 0, shape: _RegionShape | None = None):
        self._l = layouter
        self.index = index
        self._shape_mode = shape_mode
        self.start = start
        self.shape = shape if shape is not None else _RegionShape()
        self.queued_constants: list[tuple[int, Cell]] = []

    # -- assignment ------------------------------------------------------------

    def _abs(self, offset: int) -> int:
        row = self.start + offset
        if row >= self._l.asg.n:
            raise ValueError(
                f"row {row} out of range for k={self._l.asg.k} "
                f"(circuit needs a larger k)"
            )
        self._l.asg.max_row_touched = max(self._l.asg.max_row_touched, row)
        return row

    def assign_advice(self, column: Column, offset: int, value) -> AssignedCell:
        assert column.kind == "advice"
        v = None
        if self._shape_mode:
            self.shape.track(column, offset)
        else:
            v = value() if callable(value) else value
            if v is not None:
                v = v % FR_MOD
            self._l.asg.advice[column.index][self._abs(offset)] = v
        return AssignedCell(Cell(self.index, column, offset), v)

    def assign_fixed(self, column: Column, offset: int, value) -> AssignedCell:
        assert column.kind == "fixed"
        v = None
        if self._shape_mode:
            self.shape.track(column, offset)
        else:
            v = value() if callable(value) else value
            if v is None:
                raise ValueError("fixed assignments must be known")
            v = v % FR_MOD
            self._l.asg.fixed[column.index][self._abs(offset)] = v
        return AssignedCell(Cell(self.index, column, offset), v)

    def assign_advice_from_constant(self, column: Column, offset: int, constant: int) -> AssignedCell:
        acell = self.assign_advice(column, offset, constant)
        if not self._shape_mode:
            self.queued_constants.append((constant % FR_MOD, acell.cell))
        return acell

    def assign_advice_from_instance(
        self, instance_column: Column, row: int, advice_column: Column, offset: int
    ) -> Cell:
        value = None
        if not self._shape_mode and self._l.asg.instances is not None:
            vals = self._l.asg.instances[instance_column.index]
            value = vals[row] % FR_MOD if row < len(vals) else None
        acell = self.assign_advice(advice_column, offset, value)
        if not self._shape_mode:
            self._l._add_copy_abs(
                (advice_column, self._l.region_starts[self.index] + offset),
                (instance_column, row),
            )
        return acell

    def constrain_constant(self, cell, constant: int) -> None:
        if not self._shape_mode:
            self.queued_constants.append((constant % FR_MOD, _as_cell(cell)))

    def copy_advice(self, src: AssignedCell, column: Column, offset: int) -> AssignedCell:
        """Assign src's value here and equality-constrain the two cells."""
        acell = self.assign_advice(column, offset, src.value)
        self.constrain_equal(acell, src)
        return acell

    def enable_selector(self, selector: Selector, offset: int) -> None:
        if self._shape_mode:
            self.shape.track(selector, offset)
        else:
            self._l.asg.selectors[selector.index][self._abs(offset)] = 1

    def constrain_equal(self, a, b) -> None:
        if self._shape_mode:
            return
        self._l._add_copy(_as_cell(a), _as_cell(b))


class SimpleLayouter:
    def __init__(self, cs: ConstraintSystem, assignment: Assignment):
        self.cs = cs
        self.asg = assignment
        self.cursors: dict = {}
        self.region_starts: list[int] = []

    # -- copies ------------------------------------------------------------------

    def _resolve(self, cell: Cell) -> tuple[Column, int]:
        return (cell.column, self.region_starts[cell.region_index] + cell.offset)

    def _add_copy(self, a: Cell, b: Cell) -> None:
        self._add_copy_abs(self._resolve(a), self._resolve(b))

    def _add_copy_abs(self, left, right) -> None:
        for col, _row in (left, right):
            if col not in self.cs.permutation_columns:
                raise ValueError(f"column {col} lacks enable_equality")
        self.asg.copies.append((left, right))

    # -- regions ----------------------------------------------------------------

    def assign_region(self, name: str, fn):
        index = len(self.region_starts)
        shape_region = Region(self, index, shape_mode=True)
        fn(shape_region)
        shape = shape_region.shape
        start = max(
            (self.cursors.get(c, 0) for c in shape.columns), default=0
        )
        self.region_starts.append(start)
        for c in shape.columns:
            self.cursors[c] = start + shape.row_count
        self.asg.regions.append(
            (name, start, shape.row_count, sorted(shape.columns, key=str))
        )
        region = Region(self, index, shape_mode=False, start=start, shape=shape)
        out = fn(region)
        for constant, cell in region.queued_constants:
            self._assign_constant(constant, cell)
        return out

    def _assign_constant(self, constant: int, cell: Cell) -> None:
        if not self.cs.constants_columns:
            raise ValueError("no constants column enabled (enable_constant)")
        col = self.cs.constants_columns[0]
        row = self.cursors.get(col, 0)
        if row >= self.asg.n:
            raise ValueError("constants column overflow")
        self.asg.fixed[col.index][row] = constant
        self.asg.max_row_touched = max(self.asg.max_row_touched, row)
        self.cursors[col] = row + 1
        self._add_copy_abs((col, row), self._resolve(cell))

    # -- top-level instance binding ------------------------------------------------

    def constrain_instance(self, cell, instance_column: Column, row: int) -> None:
        self._add_copy_abs(self._resolve(_as_cell(cell)), (instance_column, row))

    def namespace(self, _name: str) -> "SimpleLayouter":
        return self


def synthesize(circuit, cs: ConstraintSystem, config, k: int, instances=None) -> Assignment:
    """Run a circuit's synthesize pass; returns the trace + copies.

    `instances` may be None at keygen (advice values become None too).
    """
    asg = Assignment(cs, k, instances)
    layouter = SimpleLayouter(cs, asg)
    circuit.synthesize(config, layouter)
    # synthesizing against an already-compressed cs (the prover's path):
    # refill the selector combination columns so host-side expression
    # evaluation (e.g. lookup witness generation) sees the keygen values
    for (sidx, col, root) in getattr(cs, "selector_assignment", ()):
        vals = asg.fixed[col]
        for row, v in enumerate(asg.selectors[sidx]):
            if v:
                vals[row] = root
    return asg
