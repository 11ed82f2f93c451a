"""NTT / evaluation-domain tests vs host ground truth."""

import numpy as np

from halo2_tpu.field.bn254 import FR_MOD
from halo2_tpu.field.limbs import ints_to_mont_limbs, mont_limbs_to_ints
from halo2_tpu.poly import fft, get_domain, intt


def _rand_poly(rng, n):
    return [
        (int(rng.integers(0, 2**63)) * 2**63 + int(rng.integers(0, 2**63))) % FR_MOD
        for _ in range(n)
    ]


def _dft_host(a, omega):
    n = len(a)
    return [
        sum(a[j] * pow(omega, j * k, FR_MOD) for j in range(n)) % FR_MOD
        for k in range(n)
    ]


def test_ntt_matches_host_dft(rng):
    k = 4
    dom = get_domain(k)
    a = _rand_poly(rng, 1 << k)
    A = ints_to_mont_limbs(a, FR_MOD)
    got = mont_limbs_to_ints(np.asarray(fft(A, k, dom.omega)), FR_MOD)
    assert got == _dft_host(a, dom.omega)


def test_intt_inverts_ntt(rng):
    k = 6
    dom = get_domain(k)
    a = _rand_poly(rng, 1 << k)
    A = ints_to_mont_limbs(a, FR_MOD)
    back = mont_limbs_to_ints(np.asarray(intt(fft(A, k, dom.omega), k, dom.omega)), FR_MOD)
    assert back == a


def test_extended_coset_roundtrip_and_values(rng):
    k = 3
    dom = get_domain(k, quotient_degree=4)
    assert dom.extended_n >= 4 * dom.n
    a = _rand_poly(rng, 1 << k)
    A = ints_to_mont_limbs(a, FR_MOD)
    ext = dom.coeff_to_extended(A)
    # value at extended point i should be p(zeta * w_ext^i)
    vals = mont_limbs_to_ints(np.asarray(ext), FR_MOD)
    for i in [0, 1, 5]:
        x = dom.g_coset * pow(dom.extended_omega, i, FR_MOD) % FR_MOD
        want = 0
        for c in reversed(a):
            want = (want * x + c) % FR_MOD
        assert vals[i] == want
    # and the inverse transform returns the padded coefficients
    back = mont_limbs_to_ints(np.asarray(dom.extended_to_coeff(ext)), FR_MOD)
    assert back[: len(a)] == a
    assert all(v == 0 for v in back[len(a):])


def test_lagrange_helpers():
    dom = get_domain(4)
    x = 987654321987654321 % FR_MOD
    ls = dom.lagrange_coeffs_at(x, 3)
    # sum of ALL lagrange polys at x is 1; spot-check via interpolation of a poly
    a = [7, 11, 13]  # values at first 3 domain points, rest zero
    interp = sum(v * l for v, l in zip(a, ls)) % FR_MOD
    # partition of unity at a point off the domain:
    total = sum(dom.eval_lagrange(i, x) for i in range(dom.n)) % FR_MOD
    assert total == 1
    assert isinstance(interp, int)
