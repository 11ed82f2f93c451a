"""SRS generation / serialization / commitment tests."""

import numpy as np
import pytest

from halo2_tpu.commit import ParamsKZG
from halo2_tpu.ec import host
from halo2_tpu.field.bn254 import FR_MOD
from halo2_tpu.field.limbs import ints_to_mont_limbs, mont_limbs_to_int
from halo2_tpu.ec import jax_g1 as g1
from halo2_tpu.poly import fft, get_domain


TAU = 0xDEADBEEF12345


@pytest.fixture(scope="module")
def params():
    return ParamsKZG.from_tau(3, TAU)


def test_srs_powers(params):
    xs = np.asarray(params.g_x)
    ys = np.asarray(params.g_y)
    for i in range(params.n):
        want = host.g1_mul(host.G1, pow(TAU, i, FR_MOD))
        got = (mont_limbs_to_int(xs[i], host.Q), mont_limbs_to_int(ys[i], host.Q))
        assert got == want
    assert params.s_g2 == host.g2_mul(host.G2, TAU)


def test_lagrange_srs(params):
    dom = get_domain(params.k)
    xs = np.asarray(params.gl_x)
    ys = np.asarray(params.gl_y)
    for i in [0, 1, 5]:
        li = dom.eval_lagrange(i, TAU)
        want = host.g1_mul(host.G1, li)
        got = (mont_limbs_to_int(xs[i], host.Q), mont_limbs_to_int(ys[i], host.Q))
        assert got == want


def test_commit_coeff_equals_lagrange(params, rng):
    dom = get_domain(params.k)
    coeffs = [int(rng.integers(1, 2**62)) for _ in range(params.n)]
    C = ints_to_mont_limbs(coeffs, FR_MOD)
    com_coeff = g1.point_to_host(params.commit(C))
    values = fft(C, params.k, dom.omega)
    com_lag = g1.point_to_host(params.commit_lagrange(values))
    # both must equal [p(tau)]_1
    p_tau = sum(c * pow(TAU, i, FR_MOD) for i, c in enumerate(coeffs)) % FR_MOD
    want = host.g1_mul(host.G1, p_tau)
    assert com_coeff == want
    assert com_lag == want


def test_serialization_roundtrip(params):
    data = params.write()
    assert len(data) == 4 + 2 * params.n * 64 + 256
    back = ParamsKZG.read(data)
    assert back.k == params.k
    assert np.array_equal(np.asarray(back.g_x), np.asarray(params.g_x))
    assert np.array_equal(np.asarray(back.gl_y), np.asarray(params.gl_y))
    assert back.g2 == params.g2 and back.s_g2 == params.s_g2


def test_setup_deterministic():
    a = ParamsKZG.setup(2, seed=b"seed-1")
    b = ParamsKZG.setup(2, seed=b"seed-1")
    c = ParamsKZG.setup(2, seed=b"seed-2")
    assert np.array_equal(np.asarray(a.g_x), np.asarray(b.g_x))
    assert not np.array_equal(np.asarray(a.g_x), np.asarray(c.g_x))
