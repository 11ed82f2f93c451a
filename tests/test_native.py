"""Native C++ host library (halo2_tpu/native/g1.cpp) vs the pure-Python
ground truth (ec/host.py _pt_* over bigints).

The native library accelerates host-side point work (MSM window folds,
scalar muls); these tests pin bit-exact agreement including the identity
and doubling edge cases.  Skipped when no C++ toolchain is available.
"""

import random

import pytest

from halo2_tpu import native
from halo2_tpu.ec import host as ec_host

pytestmark = pytest.mark.skipif(
    native.lib() is None, reason="native library unavailable"
)

G = ec_host.G1
R = ec_host.R


def _py_mul(P, k):
    return ec_host._pt_mul(P, k, ec_host._FQ_OPS)


def test_g1_mul_matches_python():
    rng = random.Random(7)
    for k in [0, 1, 2, 3, (1 << 255) + 12345, R - 1, rng.randrange(R)]:
        got = native.jac_to_affine(native.g1_mul_jac(G, k % R))
        assert got == _py_mul(G, k % R)


def test_g1_mul_identity_point():
    assert native.jac_to_affine(native.g1_mul_jac(None, 5)) is None
    assert native.jac_to_affine(native.g1_mul_jac(G, 0)) is None


def test_g1_add_jac_doubling_case():
    j2 = native.g1_mul_jac(G, 2)
    assert native.jac_to_affine(native.g1_add_jac(j2, j2)) == _py_mul(G, 4)


def test_g1_add_jac_inverse_case():
    j2 = native.g1_mul_jac(G, 2)
    neg = _py_mul(G, 2)
    jneg = native.g1_mul_jac((neg[0], (-neg[1]) % ec_host.Q), 1)
    assert native.jac_to_affine(native.g1_add_jac(j2, jneg)) is None


def test_g1_sum():
    pts = [_py_mul(G, i + 1) for i in range(9)] + [None]
    got = native.jac_to_affine(native.g1_sum(pts))
    assert got == _py_mul(G, sum(range(1, 10)))


def test_g1_msm_matches_naive():
    rng = random.Random(11)
    pts = [_py_mul(G, i + 2) for i in range(12)]
    ks = [rng.randrange(R) for _ in range(12)]
    want = None
    for p, k in zip(pts, ks):
        want = ec_host.g1_add(want, _py_mul(p, k))
    assert native.g1_msm(pts, ks) == want


def test_msm_fold_matches_python():
    c, V = 5, 1 << 5
    parts, expect = [], None
    for w in range(4):
        tm = _py_mul(G, 100 + 17 * w)
        st = _py_mul(G, 3 + w)
        parts.append(((tm[0], tm[1], 1), (st[0], st[1], 1)))
        contrib = ec_host.g1_add(
            _py_mul(tm, V - 1), ec_host.g1_neg(st)
        )
        expect = ec_host.g1_add(expect, _py_mul(contrib, 1 << (c * w)))
    assert native.msm_fold(parts, c) == expect


def test_msm_fold_identity_windows():
    ident = (1, 1, 0)  # z == 0 encodes the identity
    assert native.msm_fold([(ident, ident)] * 3, 4) is None
