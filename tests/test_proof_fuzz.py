"""Adversarial malformed-proof fuzzing (round-3 review ask #10).

The reference's API contract is that an invalid proof yields `false`, never
an exception (wasm.rs:172-178; the UI relies on it, Circuits.tsx:128-139).
This parametrized suite throws truncated / bit-flipped / garbage /
wrong-scheme / wrong-instance proofs at BOTH multiopen verifiers and asserts
every case returns False without raising — both at the plonk layer
(verify_proof) and at the public API layer (api.verify_proof).
"""

import json

import pytest

from halo2_tpu import api
from halo2_tpu.circuits import arithmetic
from halo2_tpu.commit import ParamsKZG
from halo2_tpu.plonk import create_proof, keygen, verify_proof

X, Y, CONST = 3, 4, 7
Z = X * X * Y * Y + CONST


@pytest.fixture(scope="module")
def setup_bundle():
    params = ParamsKZG.setup(4, seed=b"fuzz-srs-k4")
    pk = keygen(params, arithmetic.empty_circuit(CONST))
    proofs = {
        scheme: create_proof(
            params,
            pk,
            arithmetic.create_circuit(X, Y, CONST),
            instances=[[CONST, Z]],
            scheme=scheme,
            rng_seed=b"fuzz",
        )
        for scheme in ("gwc", "shplonk")
    }
    return params, pk, proofs


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_valid_proof_baseline(setup_bundle, scheme):
    params, pk, proofs = setup_bundle
    assert verify_proof(params, pk.vk, proofs[scheme], [[CONST, Z]], scheme=scheme)


def _mutations(proof: bytes):
    n = len(proof)
    cases = {
        "empty": b"",
        "single_byte": b"\x00",
        "truncated_head": proof[: n // 8],
        "truncated_mid": proof[: n // 2],
        "truncated_tail": proof[:-1],
        "extended": proof + b"\xff" * 16,
        "garbage_same_len": bytes((i * 37 + 11) % 256 for i in range(n)),
        "all_zero": b"\x00" * n,
        "all_ff": b"\xff" * n,
    }
    # bit flips spread across the transcript (commitments, evals, final args)
    for frac in (0, 8, 4, 2, 3, 1):
        off = (n - 1) if frac == 1 else n // (frac or n)
        off = min(off, n - 1)
        bad = bytearray(proof)
        bad[off] ^= 0x40
        cases[f"bitflip_at_{off}"] = bytes(bad)
    return cases


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_malformed_proofs_return_false(setup_bundle, scheme):
    params, pk, proofs = setup_bundle
    for name, bad in _mutations(proofs[scheme]).items():
        ok = verify_proof(params, pk.vk, bad, [[CONST, Z]], scheme=scheme)
        assert ok is False, f"{scheme}/{name} did not cleanly reject"


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_wrong_scheme_and_instance_return_false(setup_bundle, scheme):
    params, pk, proofs = setup_bundle
    other = "shplonk" if scheme == "gwc" else "gwc"
    # proof verified under the other multiopen argument
    assert verify_proof(params, pk.vk, proofs[scheme], [[CONST, Z]], scheme=other) is False
    # wrong instance values
    assert verify_proof(params, pk.vk, proofs[scheme], [[CONST, Z + 1]], scheme=scheme) is False
    assert verify_proof(params, pk.vk, proofs[scheme], [[CONST + 1, Z]], scheme=scheme) is False
    # wrong instance shapes
    assert verify_proof(params, pk.vk, proofs[scheme], [[CONST]], scheme=scheme) is False
    assert verify_proof(params, pk.vk, proofs[scheme], [], scheme=scheme) is False


def test_api_layer_never_raises():
    """api.verify_proof mirrors wasm.rs:172-178: False, never an exception."""
    params = api.setup(4, seed=b"fuzz-api-k4")
    s = json.dumps({"x": X, "y": Y, "constant": CONST, "z": Z})
    proof = api.generate_proof(params, s, 1, rng_seed=b"fuzz")
    assert api.verify_proof(params, proof, s, 1) is True
    for name, bad in _mutations(proof).items():
        assert api.verify_proof(params, bad, s, 1) is False, name
    # garbage params must also yield False at the API boundary
    assert api.verify_proof(b"\x01\x02", proof, s, 1) is False
