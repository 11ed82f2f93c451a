"""Vector-layout (limb-major) field kernel tests.

On CPU these exercise the jnp fallback bodies — the same `_comba_columns` /
`_redc` / add/sub math the Pallas TPU kernels run; the TPU lowering itself is
validated on hardware against poly/ntt.py (bit-identical, see ntt_pallas.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_tpu.field import FR, FQ, vec
from halo2_tpu.field.bn254 import FR_MOD, FQ_MOD
from halo2_tpu.field.limbs import ints_to_mont_limbs, mont_limbs_to_ints


@pytest.fixture(scope="module")
def vals(rng):
    n = 1024
    av = [int(x) for x in rng.integers(0, 2**63, size=n)]
    bv = [int(x) for x in rng.integers(0, 2**63, size=n)]
    av[0], bv[1] = 0, 0
    av[2] = bv[2] = FR_MOD - 1
    return av, bv


def _roundtrip(spec, mod, av, bv, op, pyop):
    A = vec.to_vec(jnp.asarray(ints_to_mont_limbs(av, mod)))
    B = vec.to_vec(jnp.asarray(ints_to_mont_limbs(bv, mod)))
    got = mont_limbs_to_ints(np.asarray(vec.from_vec(op(spec, A, B), len(av))), mod)
    assert got == [pyop(a, b) % mod for a, b in zip(av, bv)]


def test_vmul_fr(vals):
    av, bv = vals
    _roundtrip(FR, FR_MOD, av, bv, vec.vmul, lambda a, b: a * b)


def test_vadd_vsub_fr(vals):
    av, bv = vals
    _roundtrip(FR, FR_MOD, av, bv, vec.vadd, lambda a, b: a + b)
    _roundtrip(FR, FR_MOD, av, bv, vec.vsub, lambda a, b: a - b)


def test_vmul_fq(vals):
    av, bv = vals
    _roundtrip(FQ, FQ_MOD, av, bv, vec.vmul, lambda a, b: a * b)


def test_vbutterfly(vals):
    av, bv = vals
    A = vec.to_vec(jnp.asarray(ints_to_mont_limbs(av, FR_MOD)))
    B = vec.to_vec(jnp.asarray(ints_to_mont_limbs(bv, FR_MOD)))
    e, o = vec.vbutterfly(FR, A, B, B)
    ge = mont_limbs_to_ints(np.asarray(vec.from_vec(e, len(av))), FR_MOD)
    go = mont_limbs_to_ints(np.asarray(vec.from_vec(o, len(av))), FR_MOD)
    assert ge == [(a + b * b) % FR_MOD for a, b in zip(av, bv)]
    assert go == [(a - b * b) % FR_MOD for a, b in zip(av, bv)]


def test_to_from_vec_padding(rng):
    n = 777  # not a multiple of 1024
    av = [int(x) for x in rng.integers(0, 2**63, size=n)]
    a = jnp.asarray(ints_to_mont_limbs(av, FR_MOD))
    v = vec.to_vec(a)
    assert v.shape[1] % vec.SUB == 0
    back = np.asarray(vec.from_vec(v, n))
    assert np.array_equal(back, np.asarray(a))


def test_fused_ntt_dispatch_small_k(rng):
    """Below MIN_FUSED_K (and on CPU) the fused entry points route to the
    portable jnp NTT — values must match it exactly."""
    from halo2_tpu.field.bn254 import FR_ROOT_OF_UNITY, FR_S
    from halo2_tpu.poly.ntt import intt, ntt
    from halo2_tpu.poly.ntt_pallas import intt_fused, ntt_fused

    k = 8
    n = 1 << k
    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_S - k), FR_MOD)
    a = jnp.asarray(
        ints_to_mont_limbs([int(x) for x in rng.integers(0, 2**63, size=n)], FR_MOD)
    )
    assert np.array_equal(np.asarray(ntt_fused(a, k, omega)), np.asarray(ntt(a, k, omega)))
    assert np.array_equal(np.asarray(intt_fused(a, k, omega)), np.asarray(intt(a, k, omega)))


def test_dif_ntt_matches_oracle(rng):
    """The DIF (glue-free) pipeline of ntt_pallas — natural-order passes,
    per-level row-permuted cross twiddles, one final digit-reversal gather
    — must be bit-identical to the portable DIT oracle.  Runs eagerly: the
    unrolled portable pass graph takes >15 min to compile under XLA-CPU but
    ~1 min to execute op-by-op.  k=15 exercises the 'lanes' + base ('none')
    pass modes; the Mosaic lowering itself is validated on-chip
    (scripts/tpu_checks.py)."""
    import jax

    from halo2_tpu.field.bn254 import FR_ROOT_OF_UNITY, FR_S
    from halo2_tpu.poly import ntt_pallas as nt
    from halo2_tpu.poly.ntt import ntt

    k = 15
    n = 1 << k
    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_S - k), FR_MOD)
    a = jnp.asarray(
        ints_to_mont_limbs([int(x) for x in rng.integers(0, 2**63, size=n)], FR_MOD)
    )
    want = np.asarray(ntt(a, k, omega))
    with jax.disable_jit():
        v = vec.to_vec(a)
        out = nt.ntt_vec(v.reshape(nt.L, -1), k, omega)
        got = np.asarray(vec.from_vec(out.reshape(nt.L, -1, nt.LANES), n))
        assert np.array_equal(got, want)
        back = nt.ntt_vec(
            vec.to_vec(jnp.asarray(got)).reshape(nt.L, -1), k, omega, inverse=True
        )
        gi = np.asarray(vec.from_vec(back.reshape(nt.L, -1, nt.LANES), n))
        assert np.array_equal(gi, np.asarray(a))


@pytest.mark.slow
def test_dif_ntt_percol_mode(rng):
    """k=17's plan includes a B=256 'percol' level — the remaining DIF pass
    mode not covered at k=15."""
    import jax

    from halo2_tpu.field.bn254 import FR_ROOT_OF_UNITY, FR_S
    from halo2_tpu.poly import ntt_pallas as nt
    from halo2_tpu.poly.ntt import ntt

    k = 17
    n = 1 << k
    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_S - k), FR_MOD)
    assert any(B > 1 and M2 for (M, B, R, M2, _, _) in nt._plan(k, omega, 1))
    a = jnp.asarray(
        ints_to_mont_limbs([int(x) for x in rng.integers(0, 2**63, size=n)], FR_MOD)
    )
    want = np.asarray(ntt(a, k, omega))
    with jax.disable_jit():
        v = vec.to_vec(a)
        out = nt.ntt_vec(v.reshape(nt.L, -1), k, omega)
        got = np.asarray(vec.from_vec(out.reshape(nt.L, -1, nt.LANES), n))
    assert np.array_equal(got, want)
