"""Collatz circuit: proves a 32-entry Collatz trajectory reaches 1.

Behavioral parity with the reference (reference: circuits/src/collatz.rs):
  * columns: equality-enabled `witness` advice, `is_odd`/`is_one` flag advice
    (unconstrained advice — the reference's own soundness gap, preserved;
    reference: collatz.rs:13-14), selectors `selector` and `final_entry`;
  * gates: is_even (1-is_odd)(x - 2y), is_odd (1-is_one)(is_odd(3x+1-y)),
    is_one is_one((x-y)+(x-1)), final_element (1-x), each gated by a selector;
  * witness: 31 step regions each assigning offsets row, row+1 (reproducing
    halo2's sparse SimpleFloorPlanner layout that needs k=10), 1 final region;
  * no instance column / public inputs (reference: utils.rs:82);
  * JSON input {"x": [...]} resized to 32 with 1s (reference: collatz.rs:256-261).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from ..field.bn254 import FR_MOD
from ..frontend import ConstraintSystem

TRACE_LEN = 32


@dataclass
class CollatzConfig:
    witness: object
    is_odd: object
    is_one: object
    selector: object
    final_entry: object


class CollatzCircuit:
    def __init__(self, x=None):
        # x: list of 32 ints, or None for keygen
        self.x = x if x is not None else [None] * TRACE_LEN
        assert len(self.x) == TRACE_LEN

    @staticmethod
    def configure(meta: ConstraintSystem) -> CollatzConfig:
        witness = meta.advice_column()
        is_odd = meta.advice_column()
        is_one = meta.advice_column()
        final_entry = meta.selector()
        selector = meta.selector()
        meta.enable_equality(witness)

        def is_even_gate(m):
            x = m.query_advice(witness, 0)
            y = m.query_advice(witness, 1)
            odd = m.query_advice(is_odd, 0)
            sel = m.query_selector(selector)
            return [sel * ((1 - odd) * (x - 2 * y))]

        def is_odd_gate(m):
            x = m.query_advice(witness, 0)
            y = m.query_advice(witness, 1)
            odd = m.query_advice(is_odd, 0)
            one = m.query_advice(is_one, 0)
            sel = m.query_selector(selector)
            return [sel * (1 - one) * (odd * (3 * x + 1 - y))]

        def is_one_gate(m):
            x = m.query_advice(witness, 0)
            y = m.query_advice(witness, 1)
            one = m.query_advice(is_one, 0)
            sel = m.query_selector(selector)
            return [sel * one * ((x - y) + (x - 1))]

        def final_gate(m):
            x = m.query_advice(witness, 0)
            sel = m.query_selector(final_entry)
            return [sel * (1 - x)]

        meta.create_gate("is_even", is_even_gate)
        meta.create_gate("is_odd", is_odd_gate)
        meta.create_gate("is_one", is_one_gate)
        meta.create_gate("final_element", final_gate)
        return CollatzConfig(
            witness=witness,
            is_odd=is_odd,
            is_one=is_one,
            selector=selector,
            final_entry=final_entry,
        )

    def synthesize(self, config: CollatzConfig, layouter) -> None:
        c = config
        n_rows = TRACE_LEN

        for row in range(n_rows - 1):
            xv = self.x[row]
            yv = self.x[row + 1]
            odd = None if xv is None else xv % 2
            one = None if xv is None else int((xv - 1) % FR_MOD == 0)

            def build(region, row=row, xv=xv, yv=yv, odd=odd, one=one):
                # assigns at offsets row / row+1 within the region — this
                # mirrors the reference's layout quirk exactly
                region.enable_selector(c.selector, row)
                region.assign_advice(c.witness, row, xv)
                region.assign_advice(c.witness, row + 1, yv)
                region.assign_advice(c.is_odd, row, odd)
                region.assign_advice(c.is_one, row, one)

            layouter.assign_region(f"entry_{row}", build)

        def build_last(region):
            region.assign_advice(c.witness, n_rows - 1, self.x[n_rows - 1])
            region.enable_selector(c.final_entry, n_rows - 1)

        layouter.assign_region("final output", build_last)


# ---- reference-compatible helpers ---------------------------------------------


def collatz_conjecture(n: int) -> list[int]:
    """Fixed-length-32 trajectory, padded with 1s (reference: collatz.rs:212-228)."""
    ans = [n]
    i = 1
    while n > 1 and i < TRACE_LEN:
        n = 3 * n + 1 if n & 1 else n // 2
        ans.append(n)
        i += 1
    ans += [1] * (TRACE_LEN - len(ans))
    return ans[:TRACE_LEN]


def parse_string(s: str) -> dict:
    return json.loads(s)


def create_circuit(seq: list[int]) -> CollatzCircuit:
    return CollatzCircuit([v % FR_MOD for v in seq])


def empty_circuit() -> CollatzCircuit:
    return CollatzCircuit()


def create_circuit_from_string(s: str) -> CollatzCircuit:
    v = parse_string(s)
    seq = list(v["x"])[:TRACE_LEN]
    seq += [1] * (TRACE_LEN - len(seq))
    return create_circuit(seq)


def simulate_circuit(_s: str = "") -> str:
    return "N/A"  # reference behavior (collatz.rs:248-250)
