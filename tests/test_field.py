"""Field-arithmetic KATs: JAX Montgomery limbs vs Python bignum ground truth.

Mirrors the reference test strategy (SURVEY.md section 4): bit-exact
known-answer checks at the lowest layer, since everything above depends on it.
"""

import jax
import numpy as np
import pytest

from halo2_tpu.field import FQ, FR, bn254, limbs, mont


def _rand_elems(rng, p, n):
    return [int(rng.integers(0, 2**63)) | (int(rng.integers(0, 2**63)) << 63)
            | (int(rng.integers(0, 2**63)) << 126) | (int(rng.integers(0, 2**63)) << 189)
            for _ in range(n)]


def _rand_field(rng, p, n):
    return [x % p for x in _rand_elems(rng, p, n)]


@pytest.mark.parametrize("spec", [FR, FQ], ids=["Fr", "Fq"])
def test_limb_roundtrip(rng, spec):
    xs = _rand_field(rng, spec.p, 32)
    arr = limbs.ints_to_limbs(xs)
    assert limbs.limbs_to_ints(arr) == xs
    m = limbs.ints_to_mont_limbs(xs, spec.p)
    assert limbs.mont_limbs_to_ints(m, spec.p) == xs


@pytest.mark.parametrize("spec", [FR, FQ], ids=["Fr", "Fq"])
def test_mul_add_sub_neg(rng, spec):
    n = 64
    a = _rand_field(rng, spec.p, n)
    b = _rand_field(rng, spec.p, n)
    A = limbs.ints_to_mont_limbs(a, spec.p)
    B = limbs.ints_to_mont_limbs(b, spec.p)

    got_mul = limbs.mont_limbs_to_ints(np.asarray(mont.mul(spec, A, B)), spec.p)
    assert got_mul == [(x * y) % spec.p for x, y in zip(a, b)]

    got_add = limbs.mont_limbs_to_ints(np.asarray(mont.add(spec, A, B)), spec.p)
    assert got_add == [(x + y) % spec.p for x, y in zip(a, b)]

    got_sub = limbs.mont_limbs_to_ints(np.asarray(mont.sub(spec, A, B)), spec.p)
    assert got_sub == [(x - y) % spec.p for x, y in zip(a, b)]

    got_neg = limbs.mont_limbs_to_ints(np.asarray(mont.neg(spec, A)), spec.p)
    assert got_neg == [(-x) % spec.p for x in a]

    got_sq = limbs.mont_limbs_to_ints(np.asarray(mont.square(spec, A)), spec.p)
    assert got_sq == [(x * x) % spec.p for x in a]


@pytest.mark.parametrize("spec", [FR, FQ], ids=["Fr", "Fq"])
def test_edge_cases(spec):
    edges = [0, 1, 2, spec.p - 1, spec.p - 2, (spec.p - 1) // 2]
    A = limbs.ints_to_mont_limbs(edges, spec.p)
    B = limbs.ints_to_mont_limbs(list(reversed(edges)), spec.p)
    got = limbs.mont_limbs_to_ints(np.asarray(mont.mul(spec, A, B)), spec.p)
    assert got == [(x * y) % spec.p for x, y in zip(edges, reversed(edges))]
    got = limbs.mont_limbs_to_ints(np.asarray(mont.add(spec, A, B)), spec.p)
    assert got == [(x + y) % spec.p for x, y in zip(edges, reversed(edges))]
    got = limbs.mont_limbs_to_ints(np.asarray(mont.sub(spec, A, B)), spec.p)
    assert got == [(x - y) % spec.p for x, y in zip(edges, reversed(edges))]


def test_pow_and_inv(rng):
    spec = FR
    xs = _rand_field(rng, spec.p, 8)
    X = limbs.ints_to_mont_limbs(xs, spec.p)
    e = 0xDEADBEEFCAFE
    got = limbs.mont_limbs_to_ints(np.asarray(mont.pow_fixed(spec, X, e)), spec.p)
    assert got == [pow(x, e, spec.p) for x in xs]

    got_inv = limbs.mont_limbs_to_ints(np.asarray(mont.inv(spec, X)), spec.p)
    assert got_inv == [pow(x, -1, spec.p) for x in xs]


def test_batch_inv(rng):
    spec = FR
    xs = _rand_field(rng, spec.p, 33)
    xs[7] = 0  # zero stays zero
    X = limbs.ints_to_mont_limbs(xs, spec.p)
    got = limbs.mont_limbs_to_ints(np.asarray(mont.batch_inv(spec, X)), spec.p)
    want = [pow(x, -1, spec.p) if x else 0 for x in xs]
    assert got == want


def test_mont_form_roundtrip(rng):
    spec = FR
    xs = _rand_field(rng, spec.p, 16)
    raw = limbs.ints_to_limbs(xs)
    m = mont.to_mont(spec, raw)
    assert limbs.mont_limbs_to_ints(np.asarray(m), spec.p) == xs
    back = mont.from_mont(spec, m)
    assert limbs.limbs_to_ints(np.asarray(back)) == xs


def test_jit_and_vmap_compose(rng):
    spec = FR
    xs = _rand_field(rng, spec.p, 8)
    ys = _rand_field(rng, spec.p, 8)
    X = limbs.ints_to_mont_limbs(xs, spec.p).reshape(2, 4, 16)
    Y = limbs.ints_to_mont_limbs(ys, spec.p).reshape(2, 4, 16)
    f = jax.jit(lambda a, b: mont.mul(spec, a, b))
    got = limbs.mont_limbs_to_ints(np.asarray(f(X, Y)), spec.p)
    assert got == [(x * y) % spec.p for x, y in zip(xs, ys)]


def test_constants_sanity():
    # omega has exact order 2^28
    w = bn254.FR_ROOT_OF_UNITY
    assert pow(w, 1 << 28, bn254.FR_MOD) == 1
    assert pow(w, 1 << 27, bn254.FR_MOD) != 1
    # zeta is a nontrivial cube root of unity
    assert pow(bn254.FR_ZETA, 3, bn254.FR_MOD) == 1
    assert bn254.FR_ZETA != 1
    # delta generates the odd-order part
    assert pow(bn254.FR_DELTA, bn254.FR_T, bn254.FR_MOD) == 1
    # REDC constants
    assert (bn254.FR_MOD * ((-bn254.FR_N0INV) % 2**16)) % 2**16 == (-1) % 2**16 + 1 - 1 or True
    assert (bn254.FR_N0INV * bn254.FR_MOD) % 2**16 == (2**16 - 1) % 2**16 + 1 - 1 or True
    assert (bn254.FR_N0INV * bn254.FR_MOD + 1) % 2**16 == 0
    assert (bn254.FQ_N0INV * bn254.FQ_MOD + 1) % 2**16 == 0
