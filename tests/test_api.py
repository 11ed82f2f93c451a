"""Public API surface tests — parity with the reference WASM ABI
(circuits/src/wasm.rs; SURVEY.md 7.4 behavioral quirks)."""

import json

import pytest

from halo2_tpu import api


def test_circuit_count():
    assert api.get_circuit_count() == 3  # wasm.rs:181-184


def test_simulate_all():
    assert api.simulate_circuit("{}", 0) == "N/A"  # collatz.rs:248-250
    s = json.dumps({"x": 3, "y": 4, "constant": 7, "z": 0})
    assert api.simulate_circuit(s, 1) == str(3 * 3 * 4 * 4 + 7)
    out = api.simulate_circuit(json.dumps({"x": [1, 2]}), 2)
    assert out.startswith("0x") and len(out) == 66


@pytest.fixture(scope="module")
def params4():
    return api.setup(4, seed=b"api-test")


def test_api_prove_verify_arithmetic(params4):
    s = json.dumps({"x": 2, "y": 3, "constant": 5, "z": 2 * 2 * 3 * 3 + 5})
    proof = api.generate_proof(params4, s, 1, rng_seed=b"api")
    assert api.verify_proof(params4, proof, s, 1)
    # wrong public input -> False, not an exception (wasm.rs:172-178)
    bad = json.dumps({"x": 2, "y": 3, "constant": 5, "z": 999})
    assert api.verify_proof(params4, proof, bad, 1) is False
    # garbage proof -> False
    assert api.verify_proof(params4, b"\x00" * 7, s, 1) is False
    # determinism under a fixed seed
    assert proof == api.generate_proof(params4, s, 1, rng_seed=b"api")
