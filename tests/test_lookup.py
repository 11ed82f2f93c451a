"""Lookup-argument tests: MockProver checks + e2e prove/verify with the
range-check circuit (BASELINE.md lookup config; the argument itself is the
halo2 permuted-pair protocol — plonk/lookup.py)."""

import pytest

from halo2_tpu.circuits import rangecheck
from halo2_tpu.frontend import MockProver
from halo2_tpu.plonk.lookup import grand_product, permute_pair


def test_permute_pair_basic():
    inp = [3, 1, 3, 2]
    table = [0, 1, 2, 3]
    a, s = permute_pair(inp, table, 4)
    assert a == sorted(inp)
    # first occurrences align
    for i in range(4):
        if i == 0 or a[i] != a[i - 1]:
            assert s[i] == a[i]
    assert sorted(s) == sorted(table)


def test_permute_pair_missing_raises():
    with pytest.raises(ValueError):
        permute_pair([5], [0, 1, 2, 3], 1)


def test_grand_product_telescopes():
    from halo2_tpu.field.bn254 import FR_MOD

    inp = [3, 1, 3, 2]
    table = [0, 1, 2, 3]
    a, s = permute_pair(inp, table, 4)
    # pad compressed/table to same multiset => z ends at 1
    beta, gamma = 0x1234, 0x5678
    z = grand_product(inp, table, a, s, beta, gamma, 4)
    assert z[0] == 1
    assert z[4] == 1  # multiset equality


def test_permute_pair_dev_matches_host():
    """Device permute-pair + z (plonk/lookup_dev.py, now the prover's path)
    produce exactly the host reference values on random data."""
    import numpy as np
    import jax.numpy as jnp

    from halo2_tpu.field import FR, mont
    from halo2_tpu.field.bn254 import FR_MOD
    from halo2_tpu.field.limbs import ints_to_mont_limbs, mont_limbs_to_int
    from halo2_tpu.plonk import lookup_dev

    rng = np.random.default_rng(7)
    u = 61
    n = 64
    # table: random values incl. duplicates; input drawn from the table
    table = [int(x) * (FR_MOD // 97) % FR_MOD for x in rng.integers(0, 40, u)]
    inp = [table[int(i)] for i in rng.integers(0, u, u)]
    a_host, s_host = permute_pair(inp, table, u)

    A_m = jnp.asarray(ints_to_mont_limbs(inp + [0] * (n - u), FR_MOD))
    S_m = jnp.asarray(ints_to_mont_limbs(table + [0] * (n - u), FR_MOD))
    ap, sp = lookup_dev.permute_pair_dev(A_m, S_m, u)
    ap_int = [mont_limbs_to_int(r, FR_MOD) for r in np.asarray(ap)]
    sp_int = [mont_limbs_to_int(r, FR_MOD) for r in np.asarray(sp)]
    assert ap_int == a_host
    assert sp_int == s_host

    beta, gamma = 0xABCD, 0x1357
    z_host = grand_product(inp, table, a_host, s_host, beta, gamma, u)
    z_dev = lookup_dev.lookup_z_dev(A_m, S_m, ap, sp, beta, gamma, u)
    z_int = [mont_limbs_to_int(r, FR_MOD) for r in np.asarray(z_dev)]
    assert z_int == z_host

    # missing value raises like the host path
    bad = jnp.asarray(ints_to_mont_limbs([12345] + inp[1:] + [0] * (n - u), FR_MOD))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        lookup_dev.permute_pair_dev(bad, S_m, u)


def test_rangecheck_mock_satisfied():
    circuit = rangecheck.create_circuit([0, 1, 77, 255, 128], bits=8)
    MockProver.run(9, circuit, instances=[]).assert_satisfied()


def test_rangecheck_mock_out_of_range_fails():
    circuit = rangecheck.create_circuit([4, 256], bits=8)
    failures = MockProver.run(9, circuit, instances=[]).verify()
    assert any(f.kind == "lookup" for f in failures)


def test_rangecheck_e2e():
    from halo2_tpu.commit import ParamsKZG
    from halo2_tpu.plonk import create_proof, keygen, verify_proof

    # bits=4 keeps k (and CPU compile time) small; the argument is identical
    params = ParamsKZG.setup(6, seed=b"lookup-test")
    pk = keygen(params, rangecheck.empty_circuit(bits=4, count=5))
    circuit = rangecheck.create_circuit([0, 1, 7, 15, 8], bits=4)
    proof = create_proof(params, pk, circuit, [], scheme="shplonk",
                         rng_seed=b"lk")
    assert verify_proof(params, pk.vk, proof, [], scheme="shplonk")
    # tampered proof rejects
    bad = bytearray(proof)
    bad[11] ^= 1
    assert not verify_proof(params, pk.vk, bytes(bad), [], scheme="shplonk")
    # gwc scheme also works with lookups
    proof2 = create_proof(params, pk, circuit, [], scheme="gwc", rng_seed=b"lk")
    assert verify_proof(params, pk.vk, proof2, [], scheme="gwc")
