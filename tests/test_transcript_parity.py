"""Transcript/serialization byte-layout KATs (SURVEY.md §7.3 hard part #1).

Three layers:
  * halo2curves-compatible compressed-point encoding (identity = all-zero,
    bit 7 of byte 31 = y parity) — hand-derivable vectors;
  * frozen golden challenges for the Blake2b/Challenge255 protocol
    (personalization "Halo2-Transcript", prefixes 0/1/2, from_bytes_wide
    squeeze) so the protocol cannot drift silently;
  * exact proof byte length/offsets for the arithmetic circuit derived from
    the constraint system (reference layout: create_proof at
    /root/reference/circuits/src/utils.rs:105-120 — commitments are 32-byte
    compressed points, evals 32-byte LE scalars).

The ground-truth cross-check against the actual Rust stack lives in
tests/test_parity_wasm.py (the reference's wasm binary run in-image).
"""

import json

import pytest

from halo2_tpu.ec import host as ec
from halo2_tpu.field.bn254 import FQ_MOD
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite


def test_compressed_point_encoding():
    # generator (1, 2): y even -> bare x
    assert ec.g1_to_bytes(ec.G1) == bytes([1]) + bytes(31)
    # -G = (1, q-2): y odd -> sign bit (byte 31, bit 7)
    neg = ec.g1_neg(ec.G1)
    assert ec.g1_to_bytes(neg) == bytes([1]) + bytes(30) + bytes([0x80])
    # identity: ALL-ZERO (halo2curves convention — no bit-6 infinity flag)
    assert ec.g1_to_bytes(None) == bytes(32)
    assert ec.g1_from_bytes(bytes(32)) is None
    # round trips
    for P in (ec.G1, neg, ec.g1_mul(ec.G1, 7), ec.g1_mul(ec.G1, 123456789)):
        assert ec.g1_from_bytes(ec.g1_to_bytes(P)) == P


def test_compressed_point_rejects():
    # x >= q must fail field decode
    bad = (FQ_MOD).to_bytes(32, "little")
    with pytest.raises(ValueError):
        ec.g1_from_bytes(bad)
    # x = 0 with sign bit: x^3 + 3 = 3 is a non-residue -> invalid
    zero_sign = bytearray(32)
    zero_sign[31] = 0x80
    with pytest.raises(ValueError):
        ec.g1_from_bytes(bytes(zero_sign))


def test_challenge_goldens():
    """Frozen protocol vectors: prefix bytes, personalization, state fork,
    512-bit little-endian reduction."""
    t = Blake2bWrite()
    assert hex(t.squeeze_challenge()) == (
        "0xe89c2c9ef365f095ec7aa36500bb0ba58bf7d5e17194055afb5a1c746f1786a"
    )
    t = Blake2bWrite()
    t.common_scalar(1)
    assert hex(t.squeeze_challenge()) == (
        "0x1ba5cdb93688afe0b4eaa4bf9094a4fce372769e41db9e398206953797569832"
    )
    t = Blake2bWrite()
    t.write_point(ec.G1)
    c2 = t.squeeze_challenge()
    t.write_scalar(2)
    c3 = t.squeeze_challenge()
    assert hex(c2) == (
        "0xc0ba67bd0011941b884c2942b53e055abdea83e47dfb046b33bb810b6760239"
    )
    assert hex(c3) == (
        "0xbe956293d71e9ddcefb6ba9addcd52739375aff0fef06fdce691a4a17c38f84"
    )
    # proof stream: compressed point then scalar repr
    proof = t.finalize()
    assert proof == ec.g1_to_bytes(ec.G1) + (2).to_bytes(32, "little")
    # reader re-derives identical challenges from the stream
    r = Blake2bRead(proof)
    assert r.read_point() == ec.G1
    assert r.squeeze_challenge() == c2
    assert r.read_scalar() == 2
    assert r.squeeze_challenge() == c3
    r.assert_consumed()


def expected_proof_len_gwc(cs, qd: int) -> int:
    """Proof size formula for a lookup-free GWC proof.

    commitments (32B): advice + permutation z (num_chunks) + vanishing
    random + h pieces (qd) + one GWC witness per distinct opening point;
    scalars (32B): advice evals + fixed evals + random eval + sigma evals +
    z evals (2 per chunk + 1 per non-final chunk) + h eval.
    """
    chunks = cs.num_permutation_chunks()
    points = set()
    for (_c, rot) in cs.advice_queries + cs.fixed_queries:
        points.add(rot)
    points.update({0, 1})  # x, x_next from permutation openings
    if chunks > 1:
        points.add("last")
    commits = cs.num_advice + chunks + 1 + qd + len(points)
    evals = (
        len(cs.advice_queries)
        + len(cs.fixed_queries)
        + 1  # random
        + len(cs.permutation_columns)  # sigmas
        + 2 * chunks
        + max(chunks - 1, 0)
        + 1  # h at x
    )
    return 32 * (commits + evals)


@pytest.mark.slow
def test_arithmetic_proof_layout(tmp_path):
    """Exact byte length + section offsets of a real arithmetic proof."""
    from halo2_tpu import api
    from halo2_tpu.circuits.arithmetic import empty_circuit
    from halo2_tpu.commit.srs import ParamsKZG
    from halo2_tpu.plonk import keygen

    params = ParamsKZG.setup(4)
    s = json.dumps({"x": 3, "y": 4, "constant": 5, "z": 149})
    proof = api.generate_proof(params.write(), s, 1, rng_seed=b"layout")
    pk = keygen(params, empty_circuit(5))
    cs = pk.vk.cs
    qd = cs.degree() - 1
    assert len(proof) == expected_proof_len_gwc(cs, qd)
    # section 0: advice commitments decode as curve points
    for i in range(cs.num_advice):
        ec.g1_from_bytes(proof[32 * i : 32 * (i + 1)])
