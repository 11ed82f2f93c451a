"""MSM and G1 device-kernel tests vs host ground truth."""

import jax
import numpy as np
import pytest

from halo2_tpu.ec import host, jax_g1 as g1
from halo2_tpu.ec.msm import msm_host
from halo2_tpu.field.bn254 import FR_MOD


def _rand_scalar(rng):
    return (int(rng.integers(0, 2**63)) * 2**126
            + int(rng.integers(0, 2**63)) * 2**63
            + int(rng.integers(0, 2**63))) % FR_MOD


def test_jax_point_ops_match_host(rng):
    ks = [1, 2, 3, 5, 12345, FR_MOD - 1, 99]
    pts = [host.g1_mul(host.G1, k) for k in ks]
    P = g1.points_to_device(pts)
    # doubling
    D = jax.jit(g1.pdouble)(P)
    dx, dy, dinf = (np.asarray(v) for v in g1.to_affine_batch(D))
    from halo2_tpu.field.limbs import mont_limbs_to_int
    for i, k in enumerate(ks):
        want = host.g1_double(pts[i])
        assert not dinf[i]
        got = (mont_limbs_to_int(dx[i], host.Q), mont_limbs_to_int(dy[i], host.Q))
        assert got == want
    # addition of shifted pairs, including P + (-P) and P + P
    pts2 = pts[1:] + [host.g1_neg(pts[-1])]
    Q = g1.points_to_device(pts2)
    S = jax.jit(g1.padd)(P, Q)
    sx, sy, sinf = (np.asarray(v) for v in g1.to_affine_batch(S))
    for i in range(len(ks)):
        want = host.g1_add(pts[i], pts2[i])
        if want is None:
            assert sinf[i]
        else:
            got = (mont_limbs_to_int(sx[i], host.Q), mont_limbs_to_int(sy[i], host.Q))
            assert got == want


def test_padd_identity_cases():
    pts = [host.G1, None, None]
    qts = [None, host.G1, None]
    P = g1.points_to_device(pts)
    Q = g1.points_to_device(qts)
    S = jax.jit(g1.padd)(P, Q)
    sx, sy, sinf = (np.asarray(v) for v in g1.to_affine_batch(S))
    from halo2_tpu.field.limbs import mont_limbs_to_int
    assert not sinf[0] and (mont_limbs_to_int(sx[0], host.Q), mont_limbs_to_int(sy[0], host.Q)) == host.G1
    assert not sinf[1]
    assert sinf[2]


@pytest.mark.parametrize("n,c", [(8, 4), (64, 8)])
def test_msm_matches_host(rng, n, c):
    pts = [host.g1_mul(host.G1, 1 + int(rng.integers(1, 2**31))) for _ in range(n)]
    scalars = [_rand_scalar(rng) for _ in range(n)]
    scalars[0] = 0  # zero scalar must contribute nothing
    scalars[1] = 1
    want = host.g1_msm_host(pts, scalars)
    got = msm_host(pts, scalars, c=c)
    assert got == want


def test_msm_all_zero_scalars(rng):
    pts = [host.g1_mul(host.G1, k) for k in [2, 3, 4, 5]]
    got = msm_host(pts, [0, 0, 0, 0], c=4)
    assert got is None


def test_msm_repeated_points(rng):
    # same point with same digit exercises the double branch inside the scan
    pts = [host.G1] * 8
    scalars = [5] * 8
    got = msm_host(pts, scalars, c=4)
    assert got == host.g1_mul(host.G1, 40)
