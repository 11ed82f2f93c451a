"""High-level access to the reference's Rust prover (wasm artifact).

`ReferenceWasm` runs the checked-in `halo2_prover_bg.wasm` — the ACTUAL
halo2_proofs/halo2curves Rust stack the reference ships
(/root/reference/src/lib/wasm, built from circuits/src/wasm.rs) — through
the wasm->Python transpiler, with a seeded replacement for
crypto.getRandomValues so outputs are reproducible.

This is the ground-truth oracle for the north-star interop criteria
(BASELINE.md): params byte layout, proof byte layout, and the ultimate
cross-checks "our proof verifies under the Rust verifier" / "the Rust proof
verifies under our verifier".

Calls execute in a worker thread with a large stack (Rust recursion depth
exceeds CPython's default C stack under deep call chains).
"""

from __future__ import annotations

import os
import sys
import threading

_DEFAULT_WASM = "/root/reference/src/lib/wasm/halo2_prover_bg.wasm"
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".wasmrt_cache",
)

COLLATZ, ARITHMETIC, POSEIDON = 0, 1, 2


class ReferenceWasm:
    def __init__(self, wasm_path: str = _DEFAULT_WASM,
                 rng_seed: bytes = b"halo2-parity", verbose: bool = False):
        from .bindgen import Bindgen

        with open(wasm_path, "rb") as f:
            data = f.read()
        log = (lambda s: print(f"[wasm] {s}", file=sys.stderr)) if verbose else None
        self._b = Bindgen(data, rng_seed=rng_seed, cache_dir=_CACHE_DIR, log=log)

    # Rust call graphs (serde_json, fmt) nest deeply; give the interpreter
    # a 512 MB stack + generous recursion limit.
    def _call(self, fn, *args):
        out: list = []
        err: list = []

        def run():
            old = sys.getrecursionlimit()
            sys.setrecursionlimit(1_000_000)
            try:
                out.append(fn(*args))
            except BaseException as e:  # noqa: BLE001 — surfaced to caller
                err.append(e)
            finally:
                sys.setrecursionlimit(old)

        old_sz = threading.stack_size(512 * 1024 * 1024)
        try:
            t = threading.Thread(target=run)
            t.start()
            t.join()
        finally:
            threading.stack_size(old_sz)
        if err:
            raise err[0]
        return out[0]

    def get_circuit_count(self) -> int:
        return self._call(self._b.get_circuit_count)

    def simulate(self, s: str, circuit: int) -> str:
        return self._call(self._b.wasm_simulate_circuit, s, circuit)

    def setup(self, k: int) -> bytes:
        return self._call(self._b.setup, k)

    def prove(self, params: bytes, s: str, circuit: int) -> bytes:
        return self._call(self._b.wasm_generate_proof, params, s, circuit)

    def verify(self, params: bytes, proof: bytes, s: str, circuit: int) -> bool:
        return self._call(self._b.wasm_verify_proof, params, proof, s, circuit)
