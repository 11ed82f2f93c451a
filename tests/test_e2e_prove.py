"""End-to-end prove -> verify round-trips (the reference's test_ecc style,
SURVEY.md section 4 'End-to-end prove+verify tests')."""

import pytest

from halo2_tpu.circuits import arithmetic, collatz
from halo2_tpu.commit import ParamsKZG
from halo2_tpu.plonk import create_proof, keygen, verify_proof


@pytest.fixture(scope="module")
def params_k4():
    return ParamsKZG.setup(4, seed=b"test-srs-k4")


def test_arithmetic_e2e_gwc(params_k4):
    x, y, constant = 3, 4, 7
    z = x * x * y * y + constant
    pk = keygen(params_k4, arithmetic.empty_circuit(constant))
    proof = create_proof(
        params_k4,
        pk,
        arithmetic.create_circuit(x, y, constant),
        instances=[[constant, z]],
        scheme="gwc",
        rng_seed=b"det",
    )
    assert len(proof) > 0
    assert verify_proof(params_k4, pk.vk, proof, [[constant, z]], scheme="gwc")
    # wrong public input fails
    assert not verify_proof(params_k4, pk.vk, proof, [[constant, z + 1]], scheme="gwc")
    # tampered proof fails (never raises)
    bad = bytearray(proof)
    bad[7] ^= 1
    assert not verify_proof(params_k4, pk.vk, bytes(bad), [[constant, z]], scheme="gwc")
    # truncated proof fails
    assert not verify_proof(params_k4, pk.vk, proof[:-5], [[constant, z]], scheme="gwc")


def test_arithmetic_proof_deterministic(params_k4):
    x, y, constant = 2, 5, 11
    z = x * x * y * y + constant
    pk = keygen(params_k4, arithmetic.empty_circuit(constant))
    c = arithmetic.create_circuit(x, y, constant)
    p1 = create_proof(params_k4, pk, c, [[constant, z]], rng_seed=b"same")
    p2 = create_proof(params_k4, pk, c, [[constant, z]], rng_seed=b"same")
    p3 = create_proof(params_k4, pk, c, [[constant, z]], rng_seed=b"other")
    assert p1 == p2
    assert p1 != p3
    assert verify_proof(params_k4, pk.vk, p3, [[constant, z]])
