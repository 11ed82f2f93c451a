"""The framework's public proving API — parity with the reference WASM surface.

Mirrors `circuits/src/wasm.rs` exactly: the five entry points, circuit
dispatch by integer index (0 = Collatz, 1 = Arithmetic, 2 = Poseidon,
wasm.rs:68-74), byte-serialized params, SHPLONK for the instance-less Collatz
path and GWC for the instance paths (utils.rs:72-123), and the quirk that an
invalid proof returns False rather than raising (wasm.rs:172-178 /
Circuits.tsx:128-139).

Unlike the reference — which re-runs keygen on EVERY prove and verify call
(wasm.rs:86,95,114,132,139,153) — keys are memoized per (params, circuit)
while keeping the same stateless call signatures (SURVEY.md 7.4).
"""

from __future__ import annotations

import functools
import hashlib

from .circuits import arithmetic, collatz, poseidon_circuit
from .commit import ParamsKZG
from .plonk import create_proof as _create_proof
from .plonk import keygen as _keygen
from .plonk import verify_proof as _verify_proof

CIRCUIT_COUNT = 3


def get_circuit_count() -> int:
    """reference: wasm.rs:181-184."""
    return CIRCUIT_COUNT


def setup(k: int, seed: bytes | int = b"halo2_tpu-unsafe-srs") -> bytes:
    """Generate and serialize an (unsafe, test) SRS — reference wasm.rs:48-55."""
    return ParamsKZG.setup(k, seed=seed).write()


def simulate_circuit(s: str, circuit: int) -> str:
    """reference: wasm.rs:68-74."""
    if circuit == 0:
        return collatz.simulate_circuit(s)
    if circuit == 1:
        return arithmetic.simulate_circuit(s)
    return poseidon_circuit.simulate_circuit(s)


def _dispatch(s: str, circuit: int, for_verify: bool = False):
    """(empty_circuit, filled_circuit, instances, scheme) for an index.

    Poseidon quirk preserved from the reference: PROVE takes the public
    input from the required "output" hex field (wasm.rs:116 — absent output
    panics there, raises here); VERIFY ignores "output" and recomputes the
    hash from the claimed message, which must be exactly L elements
    (wasm.rs:154-168)."""
    if circuit == 0:
        return (
            collatz.empty_circuit(),
            collatz.create_circuit_from_string(s),
            [],
            "shplonk",
        )
    if circuit == 1:
        v = arithmetic.parse_string(s)
        return (
            arithmetic.empty_circuit(int(v["constant"])),
            arithmetic.create_circuit_from_string(s),
            [arithmetic.public_inputs(s)],
            "gwc",
        )
    v = poseidon_circuit.parse_string(s)
    if for_verify:
        msg = list(v["x"])
        if len(msg) != poseidon_circuit.WASM_L:
            raise ValueError("poseidon verify needs exactly L message words")
        instance = poseidon_circuit.poseidon_solution(msg)
    else:
        out = v.get("output")
        if out is None:
            raise ValueError("poseidon prove requires the 'output' hex field")
        instance = int(out, 16) % poseidon_circuit.FR_MOD
    return (
        poseidon_circuit.empty_circuit(),
        poseidon_circuit.create_circuit_from_string(s),
        [[instance]],
        "gwc",
    )


@functools.lru_cache(maxsize=8)
def _cached_params(params_bytes: bytes) -> ParamsKZG:
    return ParamsKZG.read(params_bytes)


_KEY_CACHE: dict = {}


def _keys(params: ParamsKZG, params_bytes: bytes, circuit: int, empty):
    extra = getattr(empty, "constant", 0) or 0
    key = (hashlib.blake2b(params_bytes, digest_size=16).digest(), circuit, extra)
    if key not in _KEY_CACHE:
        _KEY_CACHE[key] = _keygen(params, empty)
    return _KEY_CACHE[key]


def generate_proof(
    params_bytes: bytes, s: str, circuit: int, rng_seed: bytes | None = None
) -> bytes:
    """reference: wasm.rs:77-122 (keygen + create_proof per call)."""
    params = _cached_params(bytes(params_bytes))
    empty, filled, instances, scheme = _dispatch(s, circuit)
    pk = _keys(params, bytes(params_bytes), circuit, empty)
    return _create_proof(
        params, pk, filled, instances, scheme=scheme, rng_seed=rng_seed
    )


def verify_proof(params_bytes: bytes, proof: bytes, s: str, circuit: int) -> bool:
    """reference: wasm.rs:125-179 — NEVER raises for an invalid proof."""
    try:
        params = _cached_params(bytes(params_bytes))
        empty, _filled, instances, scheme = _dispatch(s, circuit, for_verify=True)
        pk = _keys(params, bytes(params_bytes), circuit, empty)
        return _verify_proof(params, pk.vk, bytes(proof), instances, scheme=scheme)
    except Exception:
        return False
