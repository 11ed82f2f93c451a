"""Transcript tests: write/read symmetry, challenge determinism, framing."""

import pytest

from halo2_tpu.ec import host
from halo2_tpu.field.bn254 import FR_MOD
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite


def test_write_read_roundtrip_and_challenge_parity():
    P = host.g1_mul(host.G1, 123456789)
    Q = host.g1_mul(host.G1, 987654321)
    w = Blake2bWrite()
    w.common_scalar(42)  # vk hash-equivalent absorption
    w.write_point(P)
    c1 = w.squeeze_challenge()
    w.write_scalar(31337)
    w.write_point(Q)
    c2 = w.squeeze_challenge()
    proof = w.finalize()
    assert len(proof) == 32 + 32 + 32  # point, scalar, point

    r = Blake2bRead(proof)
    r.common_scalar(42)
    assert r.read_point() == P
    assert r.squeeze_challenge() == c1
    assert r.read_scalar() == 31337
    assert r.read_point() == Q
    assert r.squeeze_challenge() == c2
    r.assert_consumed()
    assert 0 < c1 < FR_MOD and 0 < c2 < FR_MOD and c1 != c2


def test_challenges_depend_on_absorbed_data():
    w1 = Blake2bWrite()
    w1.common_scalar(1)
    w2 = Blake2bWrite()
    w2.common_scalar(2)
    assert w1.squeeze_challenge() != w2.squeeze_challenge()


def test_sequential_squeezes_differ():
    w = Blake2bWrite()
    a = w.squeeze_challenge()
    b = w.squeeze_challenge()
    assert a != b  # prefix byte re-absorbed each squeeze


def test_identity_point_rejected():
    w = Blake2bWrite()
    with pytest.raises(ValueError):
        w.write_point(None)


def test_tampered_proof_changes_challenges():
    w = Blake2bWrite()
    w.write_scalar(777)
    proof = bytearray(w.finalize())
    c_good = Blake2bRead(bytes(proof))
    c_good.read_scalar()
    good = c_good.squeeze_challenge()
    proof[0] ^= 1
    r = Blake2bRead(bytes(proof))
    assert r.read_scalar() != 777
    assert r.squeeze_challenge() != good


def test_truncated_proof_raises():
    w = Blake2bWrite()
    w.write_scalar(777)
    proof = w.finalize()[:16]
    r = Blake2bRead(proof)
    with pytest.raises(ValueError):
        r.read_scalar()
