"""Prover orchestration helpers — parity with the reference's utils.rs.

Thin wrappers with the same names/shapes as `circuits/src/utils.rs:26-165`:
generate_params, generate_keys, generate_proof (SHPLONK, no instances),
generate_proof_with_instance (GWC), verify, verify_with_instance,
run_mock_prover, hex_to_fr, draw_graph.
"""

from __future__ import annotations

from ..commit import ParamsKZG
from ..field.bn254 import FR_MOD
from ..frontend import MockProver
from ..plonk import ProvingKey, create_proof, keygen, verify_proof


def generate_params(k: int) -> ParamsKZG:
    """reference: utils.rs:59-61 (unsafe deterministic test SRS)."""
    return ParamsKZG.setup(k)


def generate_keys(params: ParamsKZG, circuit) -> ProvingKey:
    """reference: utils.rs:63-70."""
    return keygen(params, circuit)


def generate_proof(params: ParamsKZG, pk: ProvingKey, circuit,
                   rng_seed: bytes | None = None) -> bytes:
    """No-instance path — ProverSHPLONK (reference: utils.rs:72-93)."""
    return create_proof(params, pk, circuit, [], scheme="shplonk",
                        rng_seed=rng_seed)


def generate_proof_with_instance(params: ParamsKZG, pk: ProvingKey, circuit,
                                 public_input: list[int],
                                 rng_seed: bytes | None = None) -> bytes:
    """With-instance path — ProverGWC (reference: utils.rs:95-123)."""
    return create_proof(params, pk, circuit, [list(public_input)],
                        scheme="gwc", rng_seed=rng_seed)


def verify(params: ParamsKZG, vk, proof: bytes) -> bool:
    """VerifierSHPLONK, no instances (reference: utils.rs:125-140)."""
    return verify_proof(params, vk, proof, [], scheme="shplonk")


def verify_with_instance(params: ParamsKZG, vk, proof: bytes,
                         public_input: list[int]) -> bool:
    """VerifierGWC (reference: utils.rs:141-158; unlike the reference, an
    invalid proof returns False instead of panicking)."""
    return verify_proof(params, vk, proof, [list(public_input)], scheme="gwc")


def run_mock_prover(k: int, circuit, public_input: list[int]):
    """reference: utils.rs:42-57 — prints failures rather than raising."""
    instances = [list(public_input)] if public_input else []
    prover = MockProver.run(k, circuit, instances=instances)
    failures = prover.verify()
    if failures:
        for f in failures:
            print(f)
    else:
        print("Mock prover satisfied.")
    return failures


def hex_to_fr(hx: str) -> int:
    """reference: utils.rs:160-165 — 0x-prefixed hex string to Fr."""
    return int(hx, 16) % FR_MOD


def draw_graph(k: int, circuit, path: str) -> None:
    """reference: utils.rs:25-40 (CircuitLayout -> SVG, native only)."""
    from ..viz import render_layout

    render_layout(k, circuit, path)
