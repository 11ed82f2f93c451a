"""GLV decomposition tests: parameter derivation, the exact host split, and
the vectorized device split (identity + magnitude bound, not byte equality —
the device Barrett rounding may differ from the host round-half-up by one
basis vector, which both the identity and the bound absorb)."""

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_tpu.ec import glv, host as ec_host
from halo2_tpu.field.bn254 import FQ_MOD, FR_MOD
from halo2_tpu.field.limbs import ints_to_limbs


def test_params_match_curve():
    p = glv.params()
    assert pow(p.beta, 3, FQ_MOD) == 1 and p.beta != 1
    assert pow(p.lam, 3, FR_MOD) == 1 and p.lam != 1
    assert (p.lam * p.lam + p.lam + 1) % FR_MOD == 0
    # phi(P) = lambda * P for a random point
    P = ec_host.g1_mul(ec_host.G1_GEN, 0xABCDEF123456789)
    phi = (P[0] * p.beta % FQ_MOD, P[1])
    assert phi == ec_host.g1_mul(P, p.lam)
    assert p.max_mag < 1 << 128


def test_decompose_host_identity():
    rng = np.random.default_rng(5)
    p = glv.params()
    for _ in range(50):
        k = int.from_bytes(rng.bytes(32), "little") % FR_MOD
        k1, k2 = glv.decompose_host(k)
        assert (k1 + k2 * p.lam - k) % FR_MOD == 0
        assert abs(k1) < p.max_mag and abs(k2) < p.max_mag


def test_decompose_batch_matches_identity():
    rng = np.random.default_rng(6)
    p = glv.params()
    ks = [int.from_bytes(rng.bytes(32), "little") % FR_MOD for _ in range(257)]
    ks += [0, 1, FR_MOD - 1, p.lam, FR_MOD - p.lam]
    S = jnp.asarray(ints_to_limbs(ks))
    k1m, k1n, k2m, k2n = (np.asarray(a) for a in glv.decompose_batch(S))

    def limbs_to_int(row):
        return sum(int(v) << (16 * i) for i, v in enumerate(row))

    for i, k in enumerate(ks):
        k1 = limbs_to_int(k1m[i]) * (-1 if k1n[i] else 1)
        k2 = limbs_to_int(k2m[i]) * (-1 if k2n[i] else 1)
        assert (k1 + k2 * p.lam - k) % FR_MOD == 0, i
        assert abs(k1) < 1 << 128 and abs(k2) < 1 << 128, i
        # magnitudes fit 8 limbs: the window pipeline reads only those
        assert limbs_to_int(k1m[i]) >> 128 == 0
        assert limbs_to_int(k2m[i]) >> 128 == 0


def test_decompose_scalar_mul_consistency():
    """[k]P == [k1]P + [k2]phi(P) on the curve for the device split."""
    rng = np.random.default_rng(7)
    p = glv.params()
    ks = [int.from_bytes(rng.bytes(32), "little") % FR_MOD for _ in range(4)]
    S = jnp.asarray(ints_to_limbs(ks))
    k1m, k1n, k2m, k2n = (np.asarray(a) for a in glv.decompose_batch(S))

    def limbs_to_int(row):
        return sum(int(v) << (16 * i) for i, v in enumerate(row))

    P = ec_host.g1_mul(ec_host.G1_GEN, 97531)
    phiP = (P[0] * p.beta % FQ_MOD, P[1])
    for i, k in enumerate(ks):
        want = ec_host.g1_mul(P, k)
        t1 = ec_host.g1_mul(P, limbs_to_int(k1m[i]))
        if k1n[i]:
            t1 = ec_host.g1_neg(t1)
        t2 = ec_host.g1_mul(phiP, limbs_to_int(k2m[i]))
        if k2n[i]:
            t2 = ec_host.g1_neg(t2)
        assert ec_host.g1_add(t1, t2) == want, i
