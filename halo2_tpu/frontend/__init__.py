from . import constraint_system, expression, layouter, mock
from .constraint_system import Column, ConstraintSystem, Selector
from .layouter import Assignment, Cell, Region, SimpleLayouter, synthesize
from .mock import MockProver

__all__ = [
    "constraint_system",
    "expression",
    "layouter",
    "mock",
    "Column",
    "ConstraintSystem",
    "Selector",
    "Assignment",
    "Cell",
    "Region",
    "SimpleLayouter",
    "synthesize",
    "MockProver",
]
