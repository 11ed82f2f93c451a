"""Arithmetic (vanilla-PLONK) circuit: proves x^2 * y^2 + constant = z.

Re-implementation of the reference circuit (behavioral parity with
reference: circuits/src/arithmetic_circuit.rs:172-268):
  * columns: 3 equality-enabled advice l/r/o, 5 fixed sl/sr/so/sm/sc,
    1 equality-enabled instance PI;
  * gate: l*sl + r*sr + l*r*sm - o*so + sc = 0;
  * witness: 3 mul regions + 1 add region, copies x=x, y=y, x2->a2, y2->b2,
    c2->a3; public inputs [constant, z] at instance rows 0 and 1
    (reference: wasm.rs:93-94);
  * JSON input {x, y, constant, z?} with u64 values
    (reference: arithmetic_circuit.rs:39-45).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from ..field.bn254 import FR_MOD
from ..frontend import ConstraintSystem


@dataclass
class ArithmeticConfig:
    l: object
    r: object
    o: object
    sl: object
    sr: object
    so: object
    sm: object
    sc: object
    pi: object


class ArithmeticCircuit:
    """x, y may be None (keygen); constant is always known."""

    def __init__(self, x=None, y=None, constant: int = 0):
        self.x = x
        self.y = y
        self.constant = constant % FR_MOD

    @staticmethod
    def configure(meta: ConstraintSystem) -> ArithmeticConfig:
        l = meta.advice_column()
        r = meta.advice_column()
        o = meta.advice_column()
        meta.enable_equality(l)
        meta.enable_equality(r)
        meta.enable_equality(o)
        sm = meta.fixed_column()
        sl = meta.fixed_column()
        sr = meta.fixed_column()
        so = meta.fixed_column()
        sc = meta.fixed_column()
        pi = meta.instance_column()
        meta.enable_equality(pi)

        def gate(m):
            ql = m.query_advice(l, 0)
            qr = m.query_advice(r, 0)
            qo = m.query_advice(o, 0)
            qsl = m.query_fixed(sl, 0)
            qsr = m.query_fixed(sr, 0)
            qso = m.query_fixed(so, 0)
            qsm = m.query_fixed(sm, 0)
            qsc = m.query_fixed(sc, 0)
            return [ql * qsl + qr * qsr + ql * qr * qsm + qo * qso * (FR_MOD - 1) + qsc]

        meta.create_gate("plonk", gate)
        return ArithmeticConfig(l=l, r=r, o=o, sl=sl, sr=sr, so=so, sm=sm, sc=sc, pi=pi)

    def synthesize(self, config: ArithmeticConfig, layouter) -> None:
        c = config

        def raw_multiply(values):
            def build(region):
                lv, rv, ov = values() if callable(values) else values
                lhs = region.assign_advice(c.l, 0, lv)
                rhs = region.assign_advice(c.r, 0, rv)
                out = region.assign_advice(c.o, 0, ov)
                region.assign_fixed(c.sm, 0, 1)
                region.assign_fixed(c.so, 0, 1)
                return (lhs, rhs, out)

            return layouter.assign_region("mul", build)

        def raw_add(values):
            def build(region):
                lv, rv, ov = values() if callable(values) else values
                lhs = region.assign_advice(c.l, 0, lv)
                rhs = region.assign_advice(c.r, 0, rv)
                out = region.assign_advice(c.o, 0, ov)
                region.assign_fixed(c.sl, 0, 1)
                region.assign_fixed(c.sr, 0, 1)
                region.assign_fixed(c.so, 0, 1)
                return (lhs, rhs, out)

            return layouter.assign_region("add", build)

        def copy(a, b):
            layouter.assign_region("copy", lambda region: region.constrain_equal(a, b))

        x, y, const = self.x, self.y, self.constant
        unknown = x is None or y is None

        def vals(f):
            return (None, None, None) if unknown else f()

        a0, b0, c0 = raw_multiply(lambda: vals(lambda: (x, x, x * x % FR_MOD)))
        copy(a0, b0)
        a1, b1, c1 = raw_multiply(lambda: vals(lambda: (y, y, y * y % FR_MOD)))
        copy(a1, b1)
        a2, b2, c2 = raw_multiply(
            lambda: vals(
                lambda: (x * x % FR_MOD, y * y % FR_MOD, x * x * y * y % FR_MOD)
            )
        )
        copy(c0, a2)
        copy(c1, b2)
        a3, b3, c3 = raw_add(
            lambda: vals(
                lambda: (
                    x * x * y * y % FR_MOD,
                    const,
                    (x * x * y * y + const) % FR_MOD,
                )
            )
        )
        copy(c2, a3)
        layouter.constrain_instance(b3, c.pi, 0)
        layouter.constrain_instance(c3, c.pi, 1)


# ---- reference-compatible helpers (JSON surface) -----------------------------


def parse_string(s: str) -> dict:
    return json.loads(s)


def create_circuit(x: int, y: int, constant: int) -> ArithmeticCircuit:
    return ArithmeticCircuit(x=x % FR_MOD, y=y % FR_MOD, constant=constant)


def empty_circuit(constant: int) -> ArithmeticCircuit:
    return ArithmeticCircuit(x=None, y=None, constant=constant)


def create_circuit_from_string(s: str) -> ArithmeticCircuit:
    v = parse_string(s)
    return create_circuit(v["x"], v["y"], v["constant"])


def public_inputs(s: str) -> list[int]:
    """[constant, z] exactly as the reference builds them (wasm.rs:93-94)."""
    v = parse_string(s)
    x, y, constant = v["x"], v["y"], v["constant"]
    z = v.get("z")
    if z is None:
        z = (x * x * y * y + constant) % FR_MOD
    return [constant % FR_MOD, z % FR_MOD]


def simulate_circuit(s: str) -> str:
    """u64 wrap-around semantics like the reference's Rust u64 math
    (reference: arithmetic_circuit.rs:298-301)."""
    v = parse_string(s)
    mask = (1 << 64) - 1
    val = ((v["x"] * v["x"] % (mask + 1)) * (v["y"] * v["y"] % (mask + 1)) + v["constant"]) & mask
    return str(val)
