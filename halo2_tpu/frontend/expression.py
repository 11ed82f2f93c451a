"""Gate expression AST.

Equivalent of the reference's external `halo2_proofs::plonk::Expression`
(SURVEY.md 2.2 "PLONKish IR").  Expressions are built during `configure` via
ConstraintSystem.query_* and combined with Python operators; they are later
evaluated either on host ints (MockProver) or as fused batched device ops over
the extended evaluation domain (plonk/evaluation.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..field.bn254 import FR_MOD


class Expression:
    def degree(self) -> int:
        raise NotImplementedError

    # -- operator sugar (field semantics mod r) ------------------------------
    def __add__(self, other):
        return Sum(self, _wrap(other))

    def __radd__(self, other):
        return Sum(_wrap(other), self)

    def __sub__(self, other):
        return Sum(self, Negated(_wrap(other)))

    def __rsub__(self, other):
        return Sum(_wrap(other), Negated(self))

    def __mul__(self, other):
        if isinstance(other, int):
            return Scaled(self, other % FR_MOD)
        return Product(self, _wrap(other))

    def __rmul__(self, other):
        if isinstance(other, int):
            return Scaled(self, other % FR_MOD)
        return Product(_wrap(other), self)

    def __neg__(self):
        return Negated(self)

    def traverse(self, visit):
        visit(self)
        for child in getattr(self, "children", ()):  # type: ignore[attr-defined]
            child.traverse(visit)


def _wrap(v) -> "Expression":
    if isinstance(v, Expression):
        return v
    if isinstance(v, int):
        return Constant(v % FR_MOD)
    raise TypeError(f"cannot use {type(v)} in an expression")


@dataclass(frozen=True)
class Constant(Expression):
    value: int

    def degree(self) -> int:
        return 0


@dataclass(frozen=True)
class FixedQuery(Expression):
    query_index: int
    column_index: int
    rotation: int

    def degree(self) -> int:
        return 1


@dataclass(frozen=True)
class AdviceQuery(Expression):
    query_index: int
    column_index: int
    rotation: int

    def degree(self) -> int:
        return 1


@dataclass(frozen=True)
class InstanceQuery(Expression):
    query_index: int
    column_index: int
    rotation: int

    def degree(self) -> int:
        return 1


@dataclass(frozen=True)
class SelectorExpr(Expression):
    selector_index: int

    def degree(self) -> int:
        return 1


@dataclass(frozen=True)
class Sum(Expression):
    a: Expression
    b: Expression

    def degree(self) -> int:
        return max(self.a.degree(), self.b.degree())

    @property
    def children(self):
        return (self.a, self.b)


@dataclass(frozen=True)
class Product(Expression):
    a: Expression
    b: Expression

    def degree(self) -> int:
        return self.a.degree() + self.b.degree()

    @property
    def children(self):
        return (self.a, self.b)


@dataclass(frozen=True)
class Scaled(Expression):
    expr: Expression
    scalar: int

    def degree(self) -> int:
        return self.expr.degree()

    @property
    def children(self):
        return (self.expr,)


@dataclass(frozen=True)
class Negated(Expression):
    expr: Expression

    def degree(self) -> int:
        return self.expr.degree()

    @property
    def children(self):
        return (self.expr,)


def evaluate(
    expr: Expression,
    *,
    constant,
    fixed,
    advice,
    instance,
    selector,
    add,
    mul,
    neg,
    scale=None,
):
    """Generic fold over the AST; callbacks decide host-int vs device-array."""

    def go(e):
        if isinstance(e, Constant):
            return constant(e.value)
        if isinstance(e, FixedQuery):
            return fixed(e)
        if isinstance(e, AdviceQuery):
            return advice(e)
        if isinstance(e, InstanceQuery):
            return instance(e)
        if isinstance(e, SelectorExpr):
            return selector(e)
        if isinstance(e, Sum):
            return add(go(e.a), go(e.b))
        if isinstance(e, Product):
            return mul(go(e.a), go(e.b))
        if isinstance(e, Negated):
            return neg(go(e.expr))
        if isinstance(e, Scaled):
            if scale is not None:
                return scale(go(e.expr), e.scalar)
            return mul(go(e.expr), constant(e.scalar))
        raise TypeError(f"unknown expression node {type(e)}")

    return go(expr)
