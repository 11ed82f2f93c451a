"""CPU (Pallas interpret-mode) validation of the row-major packed MSM scan
kernel (`g1_vec._rank_scan_rows_call`) and its layout helpers.

The kernel is digit-agnostic (it scans whatever rank stream it is given),
so the test feeds an unsorted stream of real curve points and checks the
per-chain inclusive prefixes against host bigint ground truth.  A small
`chunk` keeps the interpret-mode serial loop cheap; the TPU-shape variant
(chunk = SCAN_CHUNK, 2^20 points) is exercised on-chip by
scripts/msm_rows_check.py / scripts/tpu_checks.py.

Reference parity: `best_multiexp` bucket accumulation (SURVEY.md 2.2).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from halo2_tpu.ec import g1_vec as gv
from halo2_tpu.ec import host as ec_host, jax_g1 as g1
from halo2_tpu.ec import msm_vec as mv
from halo2_tpu.field.bn254 import FQ_MOD
from halo2_tpu.field.limbs import mont_limbs_to_int


@pytest.fixture
def interpret_kernel(monkeypatch):
    monkeypatch.setenv("HALO2_PALLAS_INTERPRET", "1")
    gv._rank_scan_rows_call.cache_clear()
    yield
    gv._rank_scan_rows_call.cache_clear()


def _point_stream(n):
    rng = np.random.default_rng(9)
    pts = [ec_host.g1_mul(ec_host.G1, int(s)) for s in rng.integers(1, 1 << 30, n)]
    PX, PY, _ = g1.points_to_device(pts)
    return pts, jnp.asarray(PX), jnp.asarray(PY)


def test_rows_layout_roundtrip():
    chunk, nblocks = 4, 2
    n = nblocks * 1024 * chunk
    x = jnp.arange(n, dtype=jnp.uint32)
    prep = mv._rows_prep(x, nblocks, chunk).reshape(-1)
    e = jnp.asarray(np.random.default_rng(0).integers(0, n, 64))
    assert np.array_equal(np.asarray(prep)[np.asarray(mv._rows_pos(e, chunk))],
                          np.asarray(e))


@pytest.mark.parametrize("c", [8, 13, 16])
def test_digit_tails_matches_searchsorted(c):
    n, V = 1 << 12, 1 << c
    d = jnp.asarray(
        np.random.default_rng(3).integers(0, V, n).astype(np.int32)
    )
    got = np.asarray(mv._digit_tails(d, c, n))
    sd = np.sort(np.asarray(d)).astype(np.uint16)
    want = np.searchsorted(sd, np.arange(V), side="right") - 1
    assert np.array_equal(got, want)


@pytest.mark.slow  # interpret-mode XLA:CPU compile of the madd body is
# minutes on a 1-core box; the TPU lowering is validated on-chip by
# scripts/msm_rows_check.py
@pytest.mark.parametrize("nodbl", [True, False])
def test_rank_scan_rows_kernel_matches_host(interpret_kernel, nodbl):
    chunk, nblocks = 2, 1
    n = nblocks * 1024 * chunk
    pts, PX, PY = _point_stream(n)
    packed = mv._pack_xy(PX, PY)
    ins = [mv._rows_prep(packed[:, i], nblocks, chunk) for i in range(16)]
    outs = gv._rank_scan_rows_call(chunk, nblocks, nodbl=nodbl)(*ins)
    pref = outs[0]  # fused [24, nblocks, chunk*8, 128] prefix planes
    if nodbl:
        assert int(jnp.max(outs[1])) == 0

    # host ground truth at a sample of ranks (inclusive per-chain prefix)
    rng = np.random.default_rng(1)
    sample = sorted(int(e) for e in rng.integers(0, n, 24))
    T = mv._unpack_gather(pref, mv._rows_pos(jnp.asarray(sample), chunk))
    X, Y, Z = (np.asarray(a) for a in T)
    for col, e in enumerate(sample):
        chain, r = divmod(e, chunk)
        acc = None
        for rr in range(r + 1):
            acc = ec_host.g1_add(acc, pts[chain * chunk + rr])
        got = ec_host.g1_jacobian_to_affine(
            mont_limbs_to_int(X[:, col], FQ_MOD),
            mont_limbs_to_int(Y[:, col], FQ_MOD),
            mont_limbs_to_int(Z[:, col], FQ_MOD),
        )
        assert got == acc, f"rank {e}"


@pytest.mark.parametrize("c", [8, 13, 16])
def test_digit_tails_all_matches_reference(c):
    """The fused-histogram kernel (interpret mode) == the jnp one-hot
    reference == numpy searchsorted, for all windows at once."""
    n, V = 1 << 14, 1 << c
    rng = np.random.default_rng(5)
    digits_all = jnp.asarray(
        rng.integers(0, V, (3, n)).astype(np.int32)
    )
    got = np.asarray(mv._digit_tails_all(digits_all, c, n))
    assert got.shape == (3, V)
    for w in range(3):
        sd = np.sort(np.asarray(digits_all[w])).astype(np.uint32)
        want = np.searchsorted(sd, np.arange(V), side="right") - 1
        assert np.array_equal(got[w], want), f"window {w}"


def test_row_gather_path_matches_flat_gather():
    """The transpose + row-take prefix extraction equals the flat scalar
    take it replaced (pure layout math over random packed planes)."""
    from halo2_tpu.field import vec as fv

    chunk, nblocks = 4, 2
    n = nblocks * 1024 * chunk
    K = 64
    rng = np.random.default_rng(11)
    pref = jnp.asarray(
        rng.integers(0, 1 << 32, (24, nblocks, chunk * 8, 128), dtype=np.uint64
                     ).astype(np.uint32)
    )
    idx = jnp.asarray(np.sort(rng.integers(0, n, K)).astype(np.int32))
    want = tuple(np.asarray(a) for a in
                 mv._unpack_gather(pref, mv._rows_pos(idx, chunk)))

    prefT = fv.transpose_to_rows_u32(pref.reshape(24, n))
    loc_rows = jnp.take(prefT, mv._rows_pos(idx, chunk), axis=0)
    loc_t = fv.transpose_u32(loc_rows)
    got = []
    for ci in range(3):
        limbs = []
        for j in range(8):
            v = loc_t[ci * 8 + j]
            limbs += [v & 0xFFFF, v >> 16]
        got.append(np.asarray(jnp.stack(limbs)))
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_rows_prep_fused_matches_reference():
    """The Pallas rows-prep transpose kernel (interpret mode) equals the
    XLA reshape/swapaxes reference layout."""
    chunk, nblocks, nplanes = 4, 2, 3
    n = nblocks * 1024 * chunk
    rng = np.random.default_rng(21)
    planes = [
        jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64
                                 ).astype(np.uint32))
        for _ in range(nplanes)
    ]
    import unittest.mock as mock

    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    gv._rows_prep_call.cache_clear()
    with mock.patch.object(pl, "pallas_call", interp):
        got = gv.rows_prep_fused(planes, nblocks, chunk)
    gv._rows_prep_call.cache_clear()
    for g, p in zip(got, planes):
        want = np.asarray(mv._rows_prep(p, nblocks, chunk))
        assert np.array_equal(np.asarray(g), want)
