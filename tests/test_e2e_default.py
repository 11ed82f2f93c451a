"""Default-lane end-to-end proofs for ALL THREE reference circuits
(round-3 review ask #5: the flagship e2e paths must run in the default
suite, not only behind -m slow).

Same API path as the reference (wasm.rs prove/verify dispatch), at the
smallest domain each circuit fits: poseidon k=6 (the reference web app uses
k=10, its tests k=7 — k only changes the domain size, not the circuit),
collatz k=10 (the reference's own size — our floor-planner stacks each
trace entry's region, needing ~525 rows).  The full-size variants stay in tests/test_e2e_slow.py.

Arithmetic already runs in the default lane (tests/test_e2e_prove.py,
tests/test_api.py, tests/test_proof_fuzz.py).
"""

import json

from halo2_tpu import api


def test_poseidon_e2e_default():
    params = api.setup(6, seed=b"default-poseidon")
    out_hex = api.simulate_circuit(json.dumps({"x": [1, 2]}), 2)
    s = json.dumps({"x": [1, 2], "output": out_hex})
    proof = api.generate_proof(params, s, 2, rng_seed=b"p")
    assert api.verify_proof(params, proof, s, 2) is True
    # verify recomputes the hash from the claimed message (wasm.rs:154-168)
    assert api.verify_proof(params, proof, json.dumps({"x": [1, 3]}), 2) is False


def test_collatz_e2e_default():
    params = api.setup(10, seed=b"default-collatz")
    # the JSON carries the FULL trajectory (the reference resizes the given
    # list to 32 rows padded with 1s, collatz.rs:256-261 — a bare starting
    # value like [6] pads to [6,1,1,...], an unsatisfiable witness)
    from halo2_tpu.circuits.collatz import collatz_conjecture

    s = json.dumps({"x": collatz_conjecture(6)})
    proof = api.generate_proof(params, s, 0, rng_seed=b"c")
    assert api.verify_proof(params, proof, s, 0) is True
    bad = bytearray(proof)
    bad[3] ^= 0x40
    assert api.verify_proof(params, bytes(bad), s, 0) is False
