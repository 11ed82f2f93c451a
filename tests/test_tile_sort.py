"""CPU (Pallas interpret-mode) validation of the tiled MSM grouping pieces:
the in-VMEM bitonic payload sort (`g1_vec._tile_sort_call`) and the
per-tile bucket tails (`msm_vec._digit_tails_tiled`).

The tiled pipeline replaces the reference's `best_multiexp` bucket
accumulation (SURVEY.md 2.2) grouping step; full-pipeline equality against
the host bigint oracle runs on-chip (scripts/tpu_checks.py) since the
production path is TPU-gated.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from halo2_tpu.ec import g1_vec as gv
from halo2_tpu.ec import msm_vec as mv


@pytest.mark.parametrize("ntiles,rows,vmax", [(2, 16, 8192), (1, 8, 16)])
def test_tile_sort_groups_by_key(ntiles, rows, vmax):
    rng = np.random.default_rng(0)
    m = rows * 128
    key = rng.integers(0, vmax, size=(ntiles, rows, 128), dtype=np.uint32)
    pay = rng.integers(
        0, 2**32, size=(16, ntiles, rows, 128), dtype=np.uint32
    )
    out = np.asarray(
        gv._tile_sort_call(ntiles, rows, True)(
            jnp.asarray(key), jnp.asarray(pay)
        )
    )
    for t in range(ntiles):
        k = key[t].reshape(m)
        ks = np.sort(k)
        p = pay[:, t].reshape(16, m)
        o = out[:, t].reshape(16, m)
        # payload columns are unique w.h.p. -> recover each output
        # element's key and check the stream is exactly the sorted keys
        col_key = {tuple(p[:, i]): k[i] for i in range(m)}
        implied = np.array([col_key[tuple(o[:, i])] for i in range(m)])
        assert np.array_equal(implied, ks)


@pytest.mark.parametrize("c", [8, 13])
def test_digit_tails_tiled_matches_numpy(c):
    n, tile = 1 << 15, 1 << 14
    nw, V = 3, 1 << c
    ntiles = n // tile
    rng = np.random.default_rng(5)
    d = rng.integers(0, V, size=(nw, n)).astype(np.int32)
    got = np.asarray(mv._digit_tails_tiled(jnp.asarray(d), c, n, tile))
    assert got.shape == (nw, ntiles, V)
    for w in range(nw):
        for t in range(ntiles):
            seg = d[w, t * tile : (t + 1) * tile]
            counts = np.cumsum(np.bincount(seg, minlength=V)[:V])
            want = t * tile - 1 + counts
            assert np.array_equal(got[w, t], want), (w, t)


def test_tiled_telescope_algebra():
    """The cross-tile cancellation: sum_v v*B_v computed from per-tile
    GLOBAL-prefix tails equals the direct weighted bucket sum.  Checked in
    integer arithmetic (the group law is irrelevant to the algebra)."""
    rng = np.random.default_rng(7)
    n, tile, V = 1 << 10, 1 << 8, 16
    ntiles = n // tile
    d = rng.integers(0, V, n)
    x = rng.integers(1, 1 << 20, n)  # "points" (integers under addition)
    # per-tile sorted stream
    stream = np.concatenate(
        [
            x[t * tile : (t + 1) * tile][
                np.argsort(d[t * tile : (t + 1) * tile], kind="stable")
            ]
            for t in range(ntiles)
        ]
    )
    G = np.cumsum(stream)  # global inclusive prefix
    tails = np.stack(
        [
            t * tile
            - 1
            + np.cumsum(
                np.bincount(d[t * tile : (t + 1) * tile], minlength=V)[:V]
            )
            for t in range(ntiles)
        ]
    )
    Gat = np.where(tails >= 0, G[np.clip(tails, 0, n - 1)], 0)
    t_max = Gat[:, V - 1].sum()
    sum_t = Gat[:, : V - 1].sum()
    got = (V - 1) * t_max - sum_t
    want = sum(v * x[d == v].sum() for v in range(V))
    assert got == want
