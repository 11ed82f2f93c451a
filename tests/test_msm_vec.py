"""CPU coverage of the production MSM building blocks (ec/msm_vec.py).

The full msm_vec path is validated ON-CHIP by scripts/tpu_checks.py (closed
form over 2^16 real points); on the CPU mesh each portable Jacobian add
costs seconds (the Pallas kernels fall back to thousands of small limb
ops), so these tests check the pieces — digit decomposition, the prefix
scan / tree reduce monoid plumbing, and the telescoping bucket identity the
whole design rests on — at the smallest shapes that exercise them.

Reference parity: `best_multiexp` in halo2_proofs (SURVEY.md 2.2).
"""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_tpu.ec import host as ec_host, jax_g1 as g1
from halo2_tpu.ec import msm_vec as mv
from halo2_tpu.field.bn254 import FQ_MOD, FR_MOD
from halo2_tpu.field.limbs import ints_to_limbs, mont_limbs_to_int


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _to_host(P, m):
    """Flat [16, m] Jacobian mont coords -> list of host affine points."""
    X, Y, Z = (np.asarray(a) for a in P)
    out = []
    for i in range(m):
        out.append(
            ec_host.g1_jacobian_to_affine(
                mont_limbs_to_int(X[:, i], FQ_MOD),
                mont_limbs_to_int(Y[:, i], FQ_MOD),
                mont_limbs_to_int(Z[:, i], FQ_MOD),
            )
        )
    return out


def _device_pts(n):
    pts = [ec_host.g1_mul(ec_host.G1, i + 1) for i in range(n)]
    PX, PY, _ = g1.points_to_device(pts)
    return pts, (jnp.transpose(PX), jnp.transpose(PY))


def test_digits_match_python(rng):
    n, c = 16, 13  # non-dividing width crosses limb boundaries
    scalars = [
        (int(hi) << 128 | int(lo)) % FR_MOD
        for hi, lo in zip(
            rng.integers(0, 2**63, size=n), rng.integers(0, 2**63, size=n)
        )
    ]
    S = jnp.asarray(ints_to_limbs(scalars))
    got = np.asarray(mv._digits(S, c))
    n_windows = (mv.SCALAR_BITS + c - 1) // c
    for w in range(n_windows):
        want = [(s >> (w * c)) & ((1 << c) - 1) for s in scalars]
        assert got[w].tolist() == want, f"window {w}"


def test_prefix_scan_matches_host():
    m = 8
    pts, P = _device_pts(m)
    ps = mv._prefix_scan(mv._with_ones_z(P, m), m)
    acc, want = None, []
    for p in pts:
        acc = ec_host.g1_add(acc, p)
        want.append(acc)
    assert _to_host(ps, m) == want


def test_tree_reduce_odd_count():
    m = 5  # odd length exercises the carry branch
    pts, P = _device_pts(m)
    got = _to_host(mv._tree_reduce(mv._with_ones_z(P, m), m), 1)[0]
    want = None
    for p in pts:
        want = ec_host.g1_add(want, p)
    assert got == want


def test_bucket_identity_host(rng):
    """sum_v v*bucket_v == (V-1)*T[V-1] - sum_{v<V-1} T[v] with T[v] the
    prefix of the digit-sorted stream at the last index with digit <= v —
    the identity _msm_window_partials implements, checked in host arith."""
    n, c = 32, 3
    V = 1 << c
    pts = [ec_host.g1_mul(ec_host.G1, i + 1) for i in range(n)]
    digits = rng.integers(0, V, size=n)
    order = np.argsort(digits, kind="stable")
    sd, sp = digits[order], [pts[i] for i in order]
    # T[v]
    T = []
    for v in range(V):
        last = np.searchsorted(sd, v, side="right") - 1
        acc = None
        for i in range(last + 1):
            acc = ec_host.g1_add(acc, sp[i])
        T.append(acc)
    lhs = None
    for v in range(1, V):
        bucket = None
        for p, d in zip(pts, digits):
            if d == v:
                bucket = ec_host.g1_add(bucket, p)
        lhs = ec_host.g1_add(lhs, ec_host.g1_mul(bucket, v))
    rhs = ec_host.g1_add(
        ec_host.g1_mul(T[V - 1], V - 1),
        ec_host.g1_neg(functools.reduce(ec_host.g1_add, T[: V - 1], None)),
    )
    assert lhs == rhs


def test_glv_endomorphism_host(rng):
    """phi(P) = (beta x, y) acts as multiplication by lambda, and the exact
    host decomposition k = k1 + k2*lambda holds with |ki| within the proven
    magnitude bound."""
    from halo2_tpu.ec import glv

    p = glv.params()
    for mult in (2, 7, 12345):
        P = ec_host.g1_mul(ec_host.G1, mult)
        assert (P[0] * p.beta % FQ_MOD, P[1]) == ec_host.g1_mul(P, p.lam)
    for _ in range(8):
        k = int.from_bytes(rng.bytes(32), "little") % FR_MOD
        k1, k2 = glv.decompose_host(k)
        assert (k1 + k2 * p.lam - k) % FR_MOD == 0
        assert abs(k1) <= p.max_mag and abs(k2) <= p.max_mag


def test_glv_decompose_batch_matches_host(rng):
    """The vectorized limb decomposition agrees sign+magnitude with the
    exact host decomposition (Barrett slack stays within max_mag)."""
    from halo2_tpu.ec import glv
    from halo2_tpu.field.limbs import limbs_to_int

    n = 16
    scalars = [int.from_bytes(rng.bytes(32), "little") % FR_MOD for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = FR_MOD - 1
    S = jnp.asarray(ints_to_limbs(scalars))
    k1m, k1n, k2m, k2n = glv.decompose_batch(S)
    k1m, k1n, k2m, k2n = (np.asarray(a) for a in (k1m, k1n, k2m, k2n))
    lam = glv.params().lam
    for i, k in enumerate(scalars):
        m1 = int(limbs_to_int(k1m[i]))
        m2 = int(limbs_to_int(k2m[i]))
        k1 = -m1 if k1n[i] else m1
        k2 = -m2 if k2n[i] else m2
        assert (k1 + k2 * lam - k) % FR_MOD == 0, i
        assert m1 < (1 << 128) and m2 < (1 << 128), i


@pytest.mark.slow
def test_msm_vec_glv_matches_host(rng):
    """Full msm_vec with the GLV split (forced on at tiny size) equals the
    host MSM — exercises decomposition, the phi/sign point mapping, the
    128-bit window pipeline, and the Horner fold end to end.  ~10 min of
    CPU compile; the on-chip equivalent runs in scripts/tpu_checks.py."""
    n = 16
    pts = [ec_host.g1_mul(ec_host.G1, i + 3) for i in range(n)]
    scalars = [int.from_bytes(rng.bytes(32), "little") % FR_MOD for _ in range(n)]
    PX, PY, _ = g1.points_to_device(pts)
    S = jnp.asarray(ints_to_limbs(scalars))
    got = mv.msm_vec(PX, PY, S, c=8, glv=True)
    want = ec_host.g1_msm_host(pts, scalars)
    assert got == want
    # and the non-GLV path agrees too
    assert mv.msm_vec(PX, PY, S, c=8, glv=False) == want
