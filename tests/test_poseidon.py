"""Poseidon primitive tests: Grain KATs vs the Pasta reference constants,
MDS invertibility, sponge/permute equivalence, and host/device agreement.

KAT fixtures below are the first round-constant row and MDS[0][0] of the
pasta-hadeshash sage output, as hardcoded in the reference
(reference: circuits/src/poseidon/primitives/fp.rs:13-33,1307-1314), i.e.
Grain(field=1, sbox=0, n=255, t=3, R_F=8, R_P=56) over the Pallas base field.
"""

import numpy as np

from halo2_tpu.field import FR
from halo2_tpu.field.bn254 import FR_MOD
from halo2_tpu.field.limbs import ints_to_mont_limbs, mont_limbs_to_ints
from halo2_tpu.hashes import PoseidonSpec, hash_constant_length, permute
from halo2_tpu.hashes.grain import Grain
from halo2_tpu.hashes.mds import generate_mds
from halo2_tpu.hashes.poseidon import hash_batched, permute_batched, wasm_spec

PALLAS_P = 0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001


def _from_raw(limbs64):
    x = 0
    for i, l in enumerate(limbs64):
        x |= l << (64 * i)
    return x


PALLAS_RC0 = [
    _from_raw([0x57538C2596426303, 0x4E71162F31003B70, 0x353F628F76D110F3, 0x360D7470611E473D]),
    _from_raw([0xBDB74213BF63188B, 0x4908AC2F12EBE06F, 0x5DC3C6C5FEBFAA31, 0x2BAB94D7AE222D13]),
    _from_raw([0x0939D92753CC5DC8, 0xEF77E7D736766C5D, 0x2BF03E1A29AA871F, 0x150C93FEF652FB1C]),
]
PALLAS_MDS00 = _from_raw(
    [0x323F2486D7E11B63, 0x97D7A0AB23850B56, 0xB3D59FBDC8C9EAD4, 0x0AB5E5B874A68DE7]
)


def test_grain_kat_pasta():
    g = Grain(PALLAS_P, 255, 3, 8, 56)
    rc0 = [g.next_field_element() for _ in range(3)]
    assert rc0 == PALLAS_RC0
    # skip remaining 63 RC rows, then the MDS
    for _ in range(63 * 3):
        g.next_field_element()
    mds, mds_inv = generate_mds(g, 3, 0)
    assert mds[0][0] == PALLAS_MDS00
    # MDS * MDS^-1 == I
    for i in range(3):
        for j in range(3):
            s = sum(mds[i][k] * mds_inv[k][j] for k in range(3)) % PALLAS_P
            assert s == (1 if i == j else 0)


def test_wasm_spec_params():
    spec = wasm_spec()
    assert spec.width == 3 and spec.rate == 2
    assert spec.r_f == 8 and spec.r_p == 60  # N_ROUNDS_P[3] quirk
    assert len(spec.round_constants) == 68
    # BN254 MDS is invertible
    for i in range(3):
        for j in range(3):
            s = sum(spec.mds[i][k] * spec.mds_inv[k][j] for k in range(3)) % FR_MOD
            assert s == (1 if i == j else 0)


def test_sponge_equals_direct_permute():
    # sponge(ConstantLength<2>) == permute([m0, m1, 2<<64])[0]
    spec = wasm_spec()
    m = [6, 42]
    direct = permute(spec, [m[0], m[1], 2 << 64])[0]
    assert hash_constant_length(spec, m) == direct


def _rand_fr(rng):
    return (int(rng.integers(0, 2**63)) * 2**63 * 2**63
            + int(rng.integers(0, 2**63)) * 2**63
            + int(rng.integers(0, 2**63))) % FR_MOD


def test_device_permute_matches_host(rng):
    spec = wasm_spec()
    states = [[_rand_fr(rng) for _ in range(3)] for _ in range(4)]
    want = [permute(spec, s) for s in states]
    dev_in = np.stack([ints_to_mont_limbs(s, FR_MOD) for s in states])
    out = np.asarray(permute_batched(spec, dev_in))
    got = [mont_limbs_to_ints(out[i], FR_MOD) for i in range(4)]
    assert got == want


def test_device_hash_matches_host(rng):
    spec = wasm_spec()
    msgs = [[_rand_fr(rng), _rand_fr(rng)] for _ in range(3)]
    want = [hash_constant_length(spec, m) for m in msgs]
    dev_in = np.stack([ints_to_mont_limbs(m, FR_MOD) for m in msgs])
    got = mont_limbs_to_ints(np.asarray(hash_batched(spec, dev_in)), FR_MOD)
    assert got == want
