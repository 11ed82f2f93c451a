"""ConstraintSystem: the configure-time circuit IR.

Equivalent of the reference's external `halo2_proofs::plonk::ConstraintSystem`
(SURVEY.md 2.2): columns, gates (expression ASTs), selectors, equality-enabled
columns (the permutation argument), the constants column, and the query lists
whose registration ORDER defines the transcript layout of evaluations.

Selector compression follows halo2's keygen behavior (halo2_proofs
plonk/circuit.rs `compress_selectors` + plonk/circuit/compress_selectors.rs
`process`): after synthesis determines each selector's activation rows,
disjoint *simple* selectors are packed into shared fixed columns — selector
i in a combination of size m is encoded as column value root_i, and its
occurrences are substituted with the degree-m expression
`q * prod_{r != root_i} (r - q)` which vanishes off the selector's rows.
Complex selectors (and simple selectors unused in gates) get their own 0/1
fixed column.  The packing is degree-bounded by the pre-compression
cs.degree() so the quotient degree never grows.
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
    is_simple: bool = True

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
        self.selector_simple: list[bool] = []
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
        """A *simple* selector: may only multiply a gate (never appear in a
        sum) — eligible for compression into a shared fixed column."""
        s = Selector(self.num_selectors, True)
        self.num_selectors += 1
        self.selector_simple.append(True)
        return s

    def complex_selector(self) -> Selector:
        """A selector usable in arbitrary expressions (e.g. lookup gating);
        always materialized as its own 0/1 fixed column."""
        s = Selector(self.num_selectors, False)
        self.num_selectors += 1
        self.selector_simple.append(False)
        return s

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

    # ---- selector compression (post-synthesis) ---------------------------------

    def _selector_degrees(self) -> list[int]:
        """Per selector: max degree of any gate poly containing it (0 if it
        never appears in a gate — reference: halo2 plonk/circuit.rs keygen
        degree scan; lookups are excluded like halo2, which only permits
        complex selectors there)."""
        degrees = [0] * self.num_selectors
        for g in self.gates:
            for p in g.polys:
                found: set[int] = set()

                def visit(e):
                    if isinstance(e, SelectorExpr):
                        found.add(e.selector_index)

                p.traverse(visit)
                if found:
                    d = p.degree()
                    for s in found:
                        degrees[s] = max(degrees[s], d)
        return degrees

    def compress_selectors(self, selectors: list[list[int]]) -> list[list[int]]:
        """Pack selector activation columns into fixed columns and substitute
        every SelectorExpr occurrence; returns the new fixed columns' row
        values (appended after the user fixed columns, in allocation order).

        Mirrors halo2's `compress_selectors::process`: greedy first-fit over
        selectors whose activations are pairwise disjoint, bounded so the
        substituted gate degree never exceeds the pre-compression degree().
        """
        from .expression import Constant

        assert not self._finalized, "compress_selectors called twice"
        self._finalized = True
        assert len(selectors) == self.num_selectors
        n = len(selectors[0]) if selectors else 0

        degrees = self._selector_degrees()
        max_degree = self.degree()  # pre-compression bound

        combination_polys: list[list[int]] = []
        replacements: list = [None] * self.num_selectors
        # (selector_index, fixed_column_index, root): lets a later synthesis
        # against this (compressed) cs refill the combination columns from
        # fresh selector activations (the prover's host fixed view)
        assignment_map: list[tuple[int, int, int]] = []

        def alloc_query() -> FixedQuery:
            col = self.fixed_column()
            qidx = self._register(self.fixed_queries, col, 0)
            return FixedQuery(qidx, col.index, 0)

        # complex selectors and gate-unused simple selectors: own 0/1 column
        packable: list[tuple[int, list[int], int]] = []  # (idx, acts, maxdeg)
        for i in range(self.num_selectors):
            acts = [1 if v else 0 for v in selectors[i]]
            if degrees[i] == 0 or not self.selector_simple[i]:
                q = alloc_query()
                replacements[i] = q
                combination_polys.append(acts)
                assignment_map.append((i, q.column_index, 1))
            else:
                packable.append((i, acts, degrees[i]))

        # exclusion matrix: selectors active on a shared row can't combine
        m = len(packable)
        excl = [[False] * m for _ in range(m)]
        for a in range(m):
            for b in range(a):
                if any(
                    x and y for x, y in zip(packable[a][1], packable[b][1])
                ):
                    excl[a][b] = excl[b][a] = True

        added = [False] * m
        for i in range(m):
            if added[i]:
                continue
            added[i] = True
            if packable[i][2] > max_degree:
                raise ValueError("selector gate exceeds circuit degree bound")
            d = packable[i][2] - 1
            combination = [packable[i]]
            combo_idx = [i]
            for j in range(i + 1, m):
                if d + len(combination) == max_degree:
                    break  # no room for any further member
                if added[j]:
                    continue
                if any(excl[j][x] for x in combo_idx):
                    continue
                new_d = max(d, packable[j][2] - 1)
                if new_d + len(combination) + 1 > max_degree:
                    continue
                d = new_d
                combination.append(packable[j])
                combo_idx.append(j)
                added[j] = True

            q = alloc_query()
            size = len(combination)
            assignment = [0] * n
            for root, (sidx, acts, _deg) in enumerate(combination, start=1):
                # degree-`size` expression: zero unless the column holds root
                expr: Expression = q
                for other in range(1, size + 1):
                    if other != root:
                        expr = expr * (Constant(other) - q)
                for row, a in enumerate(acts):
                    if a:
                        assignment[row] = root
                replacements[sidx] = expr
                assignment_map.append((sidx, q.column_index, root))
            combination_polys.append(assignment)

        def rewrite(e: Expression) -> Expression:
            from .expression import Negated, Product, Scaled, Sum

            if isinstance(e, SelectorExpr):
                return replacements[e.selector_index]
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
        self.selector_replacements = replacements
        self.selector_assignment = assignment_map
        return combination_polys

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
