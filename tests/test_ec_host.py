"""Host EC + pairing tests: group laws, serialization, pairing bilinearity."""

import pytest

from halo2_tpu.ec import host, pairing
from halo2_tpu.field.bn254 import FR_MOD


def test_g1_group_law():
    G = host.G1
    assert host.g1_is_on_curve(G)
    assert host.g1_add(G, host.g1_neg(G)) is None
    P2 = host.g1_double(G)
    assert P2 == host.g1_add(G, G) or host.g1_is_on_curve(P2)
    assert host.g1_mul(G, 2) == host.g1_double(G)
    assert host.g1_mul(G, FR_MOD) is None  # order r
    a, b = 1234567, 7654321
    assert host.g1_add(host.g1_mul(G, a), host.g1_mul(G, b)) == host.g1_mul(G, a + b)


def test_g2_group_law():
    G = host.G2
    assert host.g2_is_on_curve(G)
    assert host.g2_mul(G, FR_MOD) is None
    a, b = 99991, 31337
    assert host.g2_add(host.g2_mul(G, a), host.g2_mul(G, b)) == host.g2_mul(G, a + b)


def test_g1_serialization_roundtrip():
    for k in [1, 2, 3, 12345, FR_MOD - 1]:
        P = host.g1_mul(host.G1, k)
        assert host.g1_from_bytes(host.g1_to_bytes(P)) == P
        assert host.g1_from_uncompressed(host.g1_to_uncompressed(P)) == P
    assert host.g1_from_bytes(host.g1_to_bytes(None)) is None
    assert host.g1_from_uncompressed(host.g1_to_uncompressed(None)) is None


def test_g2_serialization_roundtrip():
    P = host.g2_mul(host.G2, 987654321)
    assert host.g2_from_uncompressed(host.g2_to_uncompressed(P)) == P


@pytest.mark.slow
def test_pairing_bilinearity():
    P = host.G1
    Qp = host.G2
    a, b = 7, 13
    e_ab = pairing.pairing(host.g1_mul(P, a), host.g2_mul(Qp, b))
    e_1 = pairing.pairing(P, Qp)
    assert e_ab == pairing.fq12_pow(e_1, a * b)
    assert not pairing.fq12_eq_one(e_1)  # non-degenerate


@pytest.mark.slow
def test_pairing_product_kzg_shape():
    # e(aG1, bG2) * e(-abG1, G2) == 1  — the shape of the KZG check
    a, b = 1234577, 998877
    pairs = [
        (host.g1_mul(host.G1, a), host.g2_mul(host.G2, b)),
        (host.g1_neg(host.g1_mul(host.G1, a * b)), host.G2),
    ]
    assert pairing.pairing_product_is_one(pairs)
    # and a corrupted product fails
    pairs_bad = [
        (host.g1_mul(host.G1, a), host.g2_mul(host.G2, b)),
        (host.g1_neg(host.g1_mul(host.G1, a * b + 1)), host.G2),
    ]
    assert not pairing.pairing_product_is_one(pairs_bad)
