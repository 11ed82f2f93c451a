"""Full-size end-to-end proofs for the remaining two reference circuits
(SURVEY.md §4 'End-to-end prove+verify tests').  These take several minutes
each on the CPU backend (XLA compile dominates), so they are marked slow and
deselected by default:  python -m pytest tests/test_e2e_slow.py -m slow

See also tests/test_api.py for the arithmetic path, which runs in the
default suite."""

import json

import pytest

from halo2_tpu import api


@pytest.mark.slow
def test_poseidon_e2e_api():
    params = api.setup(7, seed=b"slow-poseidon")
    # the reference requires the output hex for PROVE (wasm.rs:116); the UI
    # gets it from simulate
    out_hex = api.simulate_circuit(json.dumps({"x": [1, 2]}), 2)
    s = json.dumps({"x": [1, 2], "output": out_hex})
    proof = api.generate_proof(params, s, 2, rng_seed=b"p")
    assert api.verify_proof(params, proof, s, 2)
    # verify recomputes the hash from the claimed message (wasm.rs:154-168)
    wrong = json.dumps({"x": [1, 3]})
    assert api.verify_proof(params, proof, wrong, 2) is False


@pytest.mark.slow
def test_collatz_e2e_api():
    params = api.setup(10, seed=b"slow-collatz")
    # the JSON carries the FULL trajectory (the reference resizes the given
    # list to 32 rows padded with 1s, collatz.rs:256-261 — a bare starting
    # value like [6] pads to [6,1,1,...], an unsatisfiable witness)
    from halo2_tpu.circuits.collatz import collatz_conjecture

    s = json.dumps({"x": collatz_conjecture(6)})
    proof = api.generate_proof(params, s, 0, rng_seed=b"c")
    assert api.verify_proof(params, proof, s, 0)
    bad = bytearray(proof)
    bad[3] ^= 0x40
    assert api.verify_proof(params, bytes(bad), s, 0) is False
