"""MockProver: full constraint evaluation without cryptography.

Equivalent of the reference's external `halo2_proofs::dev::MockProver`
(SURVEY.md 2.2, section 4 "the reference's primary fake backend"): evaluates
every gate polynomial at every row over the synthesized assignment, checks
equality (copy) constraints cell-by-cell, and checks instance bindings.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..field.bn254 import FR_MOD
from .constraint_system import ConstraintSystem
from .expression import evaluate
from .layouter import Assignment, synthesize


@dataclass
class VerifyFailure:
    kind: str
    detail: str

    def __repr__(self):
        return f"{self.kind}: {self.detail}"


class MockProver:
    def __init__(self, cs: ConstraintSystem, asg: Assignment):
        self.cs = cs
        self.asg = asg

    @staticmethod
    def run(k: int, circuit, instances=None) -> "MockProver":
        # like halo2's MockProver: selectors are evaluated directly from
        # their activation rows, never compressed into fixed columns
        cs = ConstraintSystem()
        config = type(circuit).configure(cs)
        asg = synthesize(circuit, cs, config, k, instances=instances or [])
        return MockProver(cs, asg)

    # -- value accessors (unassigned advice treated as zero) --------------------

    def _advice(self, col: int, row: int) -> int:
        v = self.asg.advice[col][row % self.asg.n]
        return 0 if v is None else v

    def _fixed(self, col: int, row: int) -> int:
        return self.asg.fixed[col][row % self.asg.n]

    def _cell_value(self, column, row: int) -> int:
        if column.kind == "advice":
            return self._advice(column.index, row)
        if column.kind == "fixed":
            return self._fixed(column.index, row)
        return self.asg.instance_value(column.index, row)

    # -- checks ---------------------------------------------------------------------

    def verify(self) -> list[VerifyFailure]:
        failures: list[VerifyFailure] = []
        n = self.asg.n

        for gate in self.cs.gates:
            for poly_idx, poly in enumerate(gate.polys):
                for row in range(n):
                    val = evaluate(
                        poly,
                        constant=lambda v: v,
                        fixed=lambda q, r=row: self._fixed(q.column_index, r + q.rotation),
                        advice=lambda q, r=row: self._advice(q.column_index, r + q.rotation),
                        instance=lambda q, r=row: self.asg.instance_value(
                            q.column_index, (r + q.rotation) % n
                        ),
                        selector=lambda q, r=row: self.asg.selectors[
                            q.selector_index
                        ][r],
                        add=lambda a, b: (a + b) % FR_MOD,
                        mul=lambda a, b: (a * b) % FR_MOD,
                        neg=lambda a: (-a) % FR_MOD,
                        scale=lambda a, s: (a * s) % FR_MOD,
                    )
                    if val % FR_MOD != 0:
                        failures.append(
                            VerifyFailure(
                                "gate",
                                f"'{gate.name}' poly {poly_idx} not satisfied at row {row}",
                            )
                        )
                        break  # one failure per poly is enough signal

        # lookup arguments: every input tuple over the usable rows must appear
        # among the table tuples (halo2 MockProver behavior)
        if self.cs.lookups:
            usable = n - self.cs.blinding_factors() - 1

            def eval_at(poly, row):
                return evaluate(
                    poly,
                    constant=lambda v: v,
                    fixed=lambda q, r=row: self._fixed(q.column_index, r + q.rotation),
                    advice=lambda q, r=row: self._advice(q.column_index, r + q.rotation),
                    instance=lambda q, r=row: self.asg.instance_value(
                        q.column_index, (r + q.rotation) % n
                    ),
                    selector=lambda q, r=row: self.asg.selectors[
                        q.selector_index
                    ][r],
                    add=lambda a, b: (a + b) % FR_MOD,
                    mul=lambda a, b: (a * b) % FR_MOD,
                    neg=lambda a: (-a) % FR_MOD,
                    scale=lambda a, s: (a * s) % FR_MOD,
                ) % FR_MOD

            for name, pairs in self.cs.lookups:
                table = {
                    tuple(eval_at(te, row) for _ie, te in pairs)
                    for row in range(usable)
                }
                for row in range(usable):
                    tup = tuple(eval_at(ie, row) for ie, _te in pairs)
                    if tup not in table:
                        failures.append(
                            VerifyFailure(
                                "lookup",
                                f"'{name}' input {tup} at row {row} not in table",
                            )
                        )
                        break

        for (ca, ra), (cb, rb) in self.asg.copies:
            va = self._cell_value(ca, ra)
            vb = self._cell_value(cb, rb)
            if va != vb:
                failures.append(
                    VerifyFailure(
                        "copy",
                        f"{ca}@{ra} = {va} != {cb}@{rb} = {vb}",
                    )
                )
        return failures

    def assert_satisfied(self) -> None:
        failures = self.verify()
        if failures:
            raise AssertionError(f"MockProver: {len(failures)} failures: {failures[:5]}")
