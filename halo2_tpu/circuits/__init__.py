"""Circuit "models": the reference's three circuits plus the lookup
workload.  Index order matches the reference's WASM dispatch
(0 = Collatz, 1 = Arithmetic, 2 = Poseidon; wasm.rs:68-74)."""

from . import arithmetic, collatz, poseidon_circuit, rangecheck

CIRCUITS = {
    0: collatz,
    1: arithmetic,
    2: poseidon_circuit,
}

__all__ = ["arithmetic", "collatz", "poseidon_circuit", "rangecheck", "CIRCUITS"]
