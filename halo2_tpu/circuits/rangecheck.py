"""Range-check circuit: the lookup-argument workload.

The reference's three circuits use no lookups (SURVEY.md 2.2), but the
proving system implements halo2's lookup argument and the north-star config
list includes a range-check circuit (BASELINE.md "Lookup-argument circuit").
This circuit proves every witness value lies in [0, 2^BITS) via a lookup
into a fixed table column holding 0..2^BITS-1.

JSON input: {"x": [values...], "bits": B}  (bits optional, default 8).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from ..field.bn254 import FR_MOD
from ..frontend import ConstraintSystem


@dataclass
class RangeCheckConfig:
    value: object  # advice column
    table: object  # fixed column
    q: object  # selector gating the lookup input


class RangeCheckCircuit:
    def __init__(self, values: list[int] | None, bits: int = 8,
                 count: int | None = None):
        self.values = values
        self.bits = bits
        # circuit structure (selector layout) must not depend on the witness:
        # the empty circuit used at keygen needs the same row count
        self.count = count if count is not None else (len(values) if values else 1)

    @staticmethod
    def configure(meta: ConstraintSystem) -> RangeCheckConfig:
        value = meta.advice_column()
        table = meta.fixed_column()
        q = meta.complex_selector()

        def lookup_builder(m):
            qv = m.query_selector(q)
            v = m.query_advice(value)
            t = m.query_fixed(table)
            # gated input: rows without q enabled look up 0 (in the table)
            return [(qv * v, t)]

        meta.lookup("range check", lookup_builder)
        return RangeCheckConfig(value=value, table=table, q=q)

    def synthesize(self, config: RangeCheckConfig, layouter) -> None:
        bits = self.bits
        values = self.values

        def table_region(region):
            for i in range(1 << bits):
                region.assign_fixed(config.table, i, i)

        layouter.assign_region("table", table_region)

        count = self.count

        def values_region(region):
            for i in range(count):
                region.enable_selector(config.q, i)
                region.assign_advice(
                    config.value, i, None if values is None else values[i]
                )

        layouter.assign_region("values", values_region)


def parse_string(s: str) -> dict:
    return json.loads(s)


def create_circuit(values: list[int], bits: int = 8) -> RangeCheckCircuit:
    return RangeCheckCircuit([v % FR_MOD for v in values], bits)


def empty_circuit(bits: int = 8, count: int = 1) -> RangeCheckCircuit:
    return RangeCheckCircuit(None, bits, count=count)


def create_circuit_from_string(s: str) -> RangeCheckCircuit:
    v = parse_string(s)
    return create_circuit(list(v["x"]), int(v.get("bits", 8)))


def simulate_circuit(s: str) -> str:
    v = parse_string(s)
    bits = int(v.get("bits", 8))
    ok = all(0 <= int(x) < (1 << bits) for x in v["x"])
    return "in range" if ok else "OUT OF RANGE"
