"""circomlib-style Poseidon (t = 2) over BN254 Fr.

Behavioral equivalent of the reference's (dead, never-called) `poseidon()` /
`sbox` / `mix` helpers (circuits/src/poseidon_circuit.rs:153-214) that
consume the base64 constants of circuits/src/constants.rs via unstringify.
Included for component parity; constants live decoded in
circomlib_constants.py.
"""

from __future__ import annotations

from ..field.bn254 import FR_MOD
from .circomlib_constants import MDS, ROUND_CONSTANTS

N_ROUNDS_F = 8
N_ROUNDS_P = [56, 57, 56, 60, 60, 63, 64, 63]  # circomlib table, index t-2


def sbox(x: int) -> int:
    """x^5 (poseidon_circuit.rs:153-156)."""
    y = x * x % FR_MOD
    return y * y % FR_MOD * x % FR_MOD


def mix(state: list[int], m: list[list[int]]) -> list[int]:
    """MDS matrix multiply (poseidon_circuit.rs:159-169)."""
    return [
        sum(m[x][y] * state[y] for y in range(len(state))) % FR_MOD
        for x in range(len(state))
    ]


def poseidon(inputs: list[int]) -> int:
    """circomlib Poseidon permutation-and-squeeze for t = len(inputs) + 1.

    Only t = 2 constants ship (one input), matching the reference
    (poseidon_circuit.rs:170-214): partial rounds apply the sbox to state[0]
    only; returns state[0].
    """
    n_rounds_p = N_ROUNDS_P[0]
    t = len(inputs) + 1
    if len(MDS) != t:
        raise ValueError(f"invalid `M` length: Expected {len(MDS)} got {t}")

    state = [0] + [v % FR_MOD for v in inputs]
    for x in range(N_ROUNDS_F + n_rounds_p):
        for y in range(t):
            state[y] = (state[y] + ROUND_CONSTANTS[x * t + y]) % FR_MOD
            if x < N_ROUNDS_F // 2 or x >= N_ROUNDS_F // 2 + n_rounds_p:
                state[y] = sbox(state[y])
            elif y == 0:
                state[y] = sbox(state[y])
        state = mix(state, MDS)
    return state[0]
