"""ConstraintSystem: the configure-time circuit IR.

Equivalent of the reference's external `halo2_proofs::plonk::ConstraintSystem`
(SURVEY.md 2.2): columns, gates (expression ASTs), selectors, equality-enabled
columns (the permutation argument), the constants column, and the query lists
whose registration ORDER defines the transcript layout of evaluations.

Divergence from halo2 (documented): simple selectors are NOT compressed into
shared fixed columns at keygen — each selector becomes its own fixed column
appended after the user fixed columns.  This affects vk bytes, not soundness.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .expression import (
    AdviceQuery,
    Expression,
    FixedQuery,
    InstanceQuery,
    SelectorExpr,
)


@dataclass(frozen=True)
class Column:
    index: int
    kind: str  # "advice" | "fixed" | "instance"

    def __repr__(self):
        return f"{self.kind}[{self.index}]"


@dataclass(frozen=True)
class Selector:
    index: int

    def __repr__(self):
        return f"selector[{self.index}]"


@dataclass
class Gate:
    name: str
    polys: list


class ConstraintSystem:
    def __init__(self) -> None:
        self.num_advice = 0
        self.num_fixed = 0
        self.num_instance = 0
        self.num_selectors = 0
        self.gates: list[Gate] = []
        self.advice_queries: list[tuple[int, int]] = []  # (col, rot)
        self.fixed_queries: list[tuple[int, int]] = []
        self.instance_queries: list[tuple[int, int]] = []
        self.permutation_columns: list[Column] = []  # order of enable_equality
        self.constants_columns: list[Column] = []
        self.lookups: list = []  # (name, [(input_expr, table_expr)])
        self._finalized = False

    # ---- column allocation ---------------------------------------------------

    def advice_column(self) -> Column:
        c = Column(self.num_advice, "advice")
        self.num_advice += 1
        return c

    def fixed_column(self) -> Column:
        c = Column(self.num_fixed, "fixed")
        self.num_fixed += 1
        return c

    def instance_column(self) -> Column:
        c = Column(self.num_instance, "instance")
        self.num_instance += 1
        return c

    def selector(self) -> Selector:
        s = Selector(self.num_selectors)
        self.num_selectors += 1
        return s

    complex_selector = selector  # no compression, so they're identical here

    # ---- features ------------------------------------------------------------

    def enable_equality(self, column: Column) -> None:
        # like halo2: registers a cur-rotation query and adds the column to the
        # permutation argument
        self._query_any(column, 0)
        if column not in self.permutation_columns:
            self.permutation_columns.append(column)

    def enable_constant(self, column: Column) -> None:
        assert column.kind == "fixed"
        if column not in self.constants_columns:
            self.constants_columns.append(column)
        self.enable_equality(column)

    # ---- queries --------------------------------------------------------------

    def _register(self, queries: list, column: Column, rotation: int) -> int:
        key = (column.index, rotation)
        for i, q in enumerate(queries):
            if q == key:
                return i
        queries.append(key)
        return len(queries) - 1

    def _query_any(self, column: Column, rotation: int):
        if column.kind == "advice":
            return self.query_advice(column, rotation)
        if column.kind == "fixed":
            return self.query_fixed(column, rotation)
        return self.query_instance(column, rotation)

    def query_advice(self, column: Column, rotation: int = 0) -> AdviceQuery:
        idx = self._register(self.advice_queries, column, rotation)
        return AdviceQuery(idx, column.index, rotation)

    def query_fixed(self, column: Column, rotation: int = 0) -> FixedQuery:
        idx = self._register(self.fixed_queries, column, rotation)
        return FixedQuery(idx, column.index, rotation)

    def query_instance(self, column: Column, rotation: int = 0) -> InstanceQuery:
        idx = self._register(self.instance_queries, column, rotation)
        return InstanceQuery(idx, column.index, rotation)

    def query_selector(self, selector: Selector) -> SelectorExpr:
        return SelectorExpr(selector.index)

    # ---- gates ----------------------------------------------------------------

    def create_gate(self, name: str, builder) -> None:
        """builder(self) -> expression or list of expressions."""
        exprs = builder(self)
        if isinstance(exprs, Expression):
            exprs = [exprs]
        exprs = list(exprs)
        assert exprs, "gates must have at least one constraint"
        self.gates.append(Gate(name, exprs))

    def lookup(self, name: str, builder) -> None:
        """builder(self) -> list of (input_expr, table_expr) pairs."""
        pairs = list(builder(self))
        assert pairs
        self.lookups.append((name, pairs))

    # ---- finalization: selectors become fixed columns --------------------------

    def finalize(self) -> None:
        """Rewrite SelectorExpr nodes into fixed-column queries (one fresh
        fixed column per selector, appended after user fixed columns)."""
        if self._finalized:
            return
        self._finalized = True
        self.selector_fixed_base = self.num_fixed
        sel_query_idx = {}
        for s in range(self.num_selectors):
            col = Column(self.selector_fixed_base + s, "fixed")
            sel_query_idx[s] = self._register(self.fixed_queries, col, 0)
        self.num_fixed += self.num_selectors

        def rewrite(e: Expression) -> Expression:
            from .expression import Negated, Product, Scaled, Sum

            if isinstance(e, SelectorExpr):
                return FixedQuery(
                    sel_query_idx[e.selector_index],
                    self.selector_fixed_base + e.selector_index,
                    0,
                )
            if isinstance(e, Sum):
                return Sum(rewrite(e.a), rewrite(e.b))
            if isinstance(e, Product):
                return Product(rewrite(e.a), rewrite(e.b))
            if isinstance(e, Negated):
                return Negated(rewrite(e.expr))
            if isinstance(e, Scaled):
                return Scaled(rewrite(e.expr), e.scalar)
            return e

        for g in self.gates:
            g.polys = [rewrite(p) for p in g.polys]
        self.lookups = [
            (name, [(rewrite(i), rewrite(t)) for (i, t) in pairs])
            for (name, pairs) in self.lookups
        ]

    # ---- derived quantities ------------------------------------------------------

    def gate_degree(self) -> int:
        return max((p.degree() for g in self.gates for p in g.polys), default=1)

    def degree(self) -> int:
        # permutation argument needs degree >= 3; lookups >= 5 (input*table product)
        d = max(self.gate_degree(), 3)
        if self.lookups:
            d = max(d, 5)
        return d

    def permutation_chunk_len(self) -> int:
        return self.degree() - 2

    def num_permutation_chunks(self) -> int:
        c = self.permutation_chunk_len()
        return (len(self.permutation_columns) + c - 1) // c

    def blinding_factors(self) -> int:
        """halo2's formula: max(3, max #advice queries per column) + 2."""
        per_col = {}
        for col, _rot in self.advice_queries:
            per_col[col] = per_col.get(col, 0) + 1
        factors = max(per_col.values(), default=1)
        factors = max(3, factors)
        return factors + 2

    def minimum_rows(self) -> int:
        return self.blinding_factors() + 3

    # canonical structural description (feeds the vk transcript hash)
    def pinned(self) -> str:
        gates = [
            (g.name, [repr(p) for p in g.polys]) for g in self.gates
        ]
        return repr(
            {
                "num_advice": self.num_advice,
                "num_fixed": self.num_fixed,
                "num_instance": self.num_instance,
                "num_selectors": self.num_selectors,
                "gates": gates,
                "advice_queries": self.advice_queries,
                "fixed_queries": self.fixed_queries,
                "instance_queries": self.instance_queries,
                "permutation_columns": [repr(c) for c in self.permutation_columns],
                "constants": [repr(c) for c in self.constants_columns],
                "lookups": [
                    (n, [(repr(i), repr(t)) for i, t in ps]) for n, ps in self.lookups
                ],
            }
        )
