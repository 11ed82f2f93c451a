"""Poseidon preimage circuit: proves knowledge of a message hashing to a
public Poseidon digest.

Behavioral parity with the reference circuit
(reference: circuits/src/poseidon_circuit.rs:28-124):
  * production instantiation WIDTH=3 RATE=2 L=2, R_F=8, R_P=N_ROUNDS_P[3]=60;
  * config: WIDTH state advice (first RATE double as message-input columns),
    equality-enabled instance `expected`, partial_sbox advice, 2xWIDTH fixed
    rc columns, enable_constant(rc_b[0]);
  * synthesize: load L message words, Hash gadget, constrain the output cell
    to instance row 0;
  * JSON input {"x":[u64;L], "output"?: "0x..."} resized to L with 1s
    (reference: poseidon_circuit.rs:237-241);
  * public input = hash output (parsed from hex or recomputed).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from ..field.bn254 import FR_MOD
from ..frontend import ConstraintSystem
from ..hashes.poseidon import PoseidonSpec, hash_constant_length, wasm_spec
from .pow5 import PoseidonHashGadget, Pow5Chip

WASM_WIDTH, WASM_RATE, WASM_L = 3, 2, 2


@dataclass
class PoseidonCircuitConfig:
    input: list
    expected: object
    pow5: object


class PoseidonCircuit:
    """message: list of L ints, or None for keygen."""

    spec_params = (WASM_WIDTH, WASM_RATE)
    L = WASM_L

    def __init__(self, message=None):
        self.message = message
        if message is not None:
            assert len(message) == self.L

    @classmethod
    def configure(cls, meta: ConstraintSystem) -> PoseidonCircuitConfig:
        width, rate = cls.spec_params
        spec = PoseidonSpec.make(width, rate)
        state = [meta.advice_column() for _ in range(width)]
        expected = meta.instance_column()
        meta.enable_equality(expected)
        partial_sbox = meta.advice_column()
        rc_a = [meta.fixed_column() for _ in range(width)]
        rc_b = [meta.fixed_column() for _ in range(width)]
        meta.enable_constant(rc_b[0])
        pow5 = Pow5Chip.configure(meta, spec, state, partial_sbox, rc_a, rc_b)
        return PoseidonCircuitConfig(input=state[:rate], expected=expected, pow5=pow5)

    def synthesize(self, config: PoseidonCircuitConfig, layouter) -> None:
        chip = Pow5Chip(config.pow5)

        def load_message(region):
            cells = []
            for i in range(self.L):
                v = None if self.message is None else self.message[i]
                cells.append(region.assign_advice(config.input[i], 0, v))
            return cells

        message_cells = layouter.assign_region("load message", load_message)
        gadget = PoseidonHashGadget(chip, self.L)
        output = gadget.hash(layouter, message_cells)
        layouter.constrain_instance(output, config.expected, 0)


# ---- reference-compatible helpers ---------------------------------------------


def parse_string(s: str) -> dict:
    return json.loads(s)


def create_circuit(message: list[int]) -> PoseidonCircuit:
    return PoseidonCircuit([v % FR_MOD for v in message])


def empty_circuit() -> PoseidonCircuit:
    return PoseidonCircuit(None)


def create_circuit_from_string(s: str) -> PoseidonCircuit:
    v = parse_string(s)
    msg = list(v["x"])[: WASM_L]
    msg += [1] * (WASM_L - len(msg))
    return create_circuit(msg)


def make_circuit_class(width: int, rate: int, length: int):
    """Width-generic PoseidonCircuit variant (the reference's const generics
    WIDTH/RATE/L — its native main.rs draws a WIDTH=12 RATE=11 L=11 layout,
    main.rs:25-34, while WASM uses 3/2/2)."""
    assert rate == width - 1

    class _PoseidonCircuitW(PoseidonCircuit):
        spec_params = (width, rate)
        L = length

    _PoseidonCircuitW.__name__ = f"PoseidonCircuitW{width}"
    return _PoseidonCircuitW


def poseidon_solution(message: list[int]) -> int:
    """Off-circuit hash (reference: wasm_poseidon_solution,
    poseidon_circuit.rs:292-299)."""
    return hash_constant_length(wasm_spec(), [v % FR_MOD for v in message])


def expected_output_from_string(s: str) -> int:
    """Public input: parse 'output' hex if present, else recompute the hash
    from the claimed message (reference: wasm.rs:154-168)."""
    v = parse_string(s)
    msg = list(v["x"])[: WASM_L]
    msg += [1] * (WASM_L - len(msg))
    out = v.get("output")
    if out:
        return int(out, 16) % FR_MOD
    return poseidon_solution(msg)


def simulate_circuit(s: str) -> str:
    """Debug-formatted Fr like the reference (poseidon_circuit.rs:269-290)."""
    v = parse_string(s)
    msg = list(v["x"])[: WASM_L]
    msg += [1] * (WASM_L - len(msg))
    return f"{poseidon_solution(msg):#066x}"
