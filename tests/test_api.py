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


def test_vk_serialization_roundtrip(params4):
    """Checkpoint subsystem: vk write/read (SURVEY.md section 5)."""
    from halo2_tpu.circuits import arithmetic
    from halo2_tpu.commit import ParamsKZG
    from halo2_tpu.plonk import keygen
    from halo2_tpu.plonk.keygen import VerifyingKey

    params = ParamsKZG.read(params4)
    pk = keygen(params, arithmetic.empty_circuit(5))
    blob = pk.vk.write()
    vk2 = VerifyingKey.read(blob, arithmetic.empty_circuit(5))
    assert vk2.k == pk.vk.k
    assert vk2.fixed_commitments == pk.vk.fixed_commitments
    assert vk2.permutation_commitments == pk.vk.permutation_commitments
    assert vk2.transcript_repr == pk.vk.transcript_repr


def test_poseidon_prove_requires_output_verify_recomputes():
    """Reference asymmetry (wasm.rs:116 vs 154-168): prove needs 'output',
    verify ignores it and recomputes from the message."""
    import pytest as _pytest

    from halo2_tpu.api import _dispatch

    with _pytest.raises(ValueError):
        _dispatch(json.dumps({"x": [1, 2]}), 2)  # prove without output
    out = api.simulate_circuit(json.dumps({"x": [1, 2]}), 2)
    _e, _f, inst, scheme = _dispatch(json.dumps({"x": [1, 2], "output": out}), 2)
    assert scheme == "gwc"
    # verify path ignores a bogus output field
    _e, _f, inst2, _ = _dispatch(
        json.dumps({"x": [1, 2], "output": "0xdead"}), 2, for_verify=True
    )
    assert inst == inst2
