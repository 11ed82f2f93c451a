"""Production MSM on the vec (limb-major) layout.

Replaces ec/msm.py's segmented-scan bucket accumulation with a cheaper and
simpler identity: after sorting a window's points by digit, let

    T[v] = inclusive-prefix-sum of sorted points up to the last index with
           digit <= v                      (one UNSEGMENTED prefix scan)

Then bucket_v = T[v] - T[v-1] telescopes, and the weighted bucket reduction
collapses to

    sum_v v * bucket_v = (V-1) * T[V-1] - sum_{v=0}^{V-2} T[v]

— no per-bucket suffix scan at all: one prefix scan over the points (the
pairwise work-efficient scheme, ~2n point adds), a V-point gather, and one
tree reduction.  The per-window partials (T_max, sum_T) are folded on the
host (a handful of bigint point ops) where the 2^c scalar multiply and the
Horner window combination are trivial.

Field work runs through the Pallas kernels of field/vec.py via g1_vec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import vec as fv
from ..field.bn254 import FQ_MOD
from ..field.limbs import ints_to_limbs, mont_limbs_to_int
from . import host as ec_host
from . import g1_vec as gv

SCALAR_BITS = 256

# Tiled grouping pipeline (c <= 13): elements per in-VMEM sort tile.  2^18
# elements x 17 u32 planes = 17.3 MB — the whole tile sorts inside VMEM
# (v5e: 128 MB), so grouping costs one HBM read + write instead of the
# global sort's log2(n) round trips.
TILE_SORT = 1 << 18


def _digits(scalars, c: int, bits: int = SCALAR_BITS):
    """[n, 16] raw scalar limbs -> [n_windows, n] int32 digits."""
    n_windows = (bits + c - 1) // c
    outs = []
    for w in range(n_windows):
        bit0 = w * c
        limb, off = divmod(bit0, 16)
        lo = scalars[:, limb] >> off
        if off + c > 16 and limb + 1 < scalars.shape[1]:
            lo = lo | (scalars[:, limb + 1] << (16 - off))
        outs.append((lo & np.uint32((1 << c) - 1)).astype(jnp.int32))
    return jnp.stack(outs)


def _flat_point(n: int, X, Y, Z):
    return (X, Y, Z), n


def _pad_flat(a, m: int):
    """[16, m] -> [16, m_pad] with zero (identity-Z) padding, m_pad % 1024 == 0
    (or == 8*128 minimum)."""
    target = max(-(-m // fv.GROUP) * fv.GROUP, fv.GROUP)
    if target == m:
        return a
    return jnp.pad(a, ((0, 0), (0, target - m)))


def _vpadd_flat(P, Q, m: int):
    """padd on flat [16, m] coordinate tuples (zero-padded to kernel shape)."""
    rows = max(-(-m // fv.GROUP) * fv.GROUP, fv.GROUP) // fv.LANES
    Pv = tuple(_pad_flat(a, m).reshape(16, rows, fv.LANES) for a in P)
    Qv = tuple(_pad_flat(a, m).reshape(16, rows, fv.LANES) for a in Q)
    out = gv.vpadd_fused(Pv, Qv)
    return tuple(a.reshape(16, rows * fv.LANES)[:, :m] for a in out)


def _prefix_scan(P, m: int):
    """Work-efficient inclusive prefix scan of the padd monoid over flat
    [16, m] point coords (m a power of two)."""
    if m == 1:
        return P
    even = tuple(a[:, 0::2] for a in P)  # [16, m/2]
    odd = tuple(a[:, 1::2] for a in P)
    pair = _vpadd_flat(even, odd, m // 2)
    ps = _prefix_scan(pair, m // 2)  # prefix of pair sums
    # out[2i+1] = ps[i];  out[0] = P[0];  out[2i] = ps[i-1] + P[2i]  (i >= 1)
    ps_shift = tuple(
        jnp.concatenate([jnp.zeros((16, 1), dtype=a.dtype), a[:, :-1]], axis=1)
        for a in ps
    )
    evfix = _vpadd_flat(ps_shift, even, m // 2)
    # evfix[0] = identity + P[0] = P[0]  (Z-padding makes ps_shift[0] identity)
    out = []
    for e, o in zip(evfix, ps):
        merged = jnp.stack([e, o], axis=2).reshape(16, m)
        out.append(merged)
    return tuple(out)


def _with_ones_z(P, m: int):
    """(x, y) affine tuple -> (x, y, z=1) for the portable fallbacks."""
    if len(P) == 3:
        return P
    one = jnp.asarray(gv._ONE_COL.reshape(16))
    return (P[0], P[1], jnp.broadcast_to(one[:, None], (16, m)))


def _chained_pos(e, chains: int, blk: int):
    """Rank e -> flat index into the chained scan output reshaped
    [16, rows*lanes] (chain c = j*blk + s*128 + l at [r*sub+s, j*128+l])."""
    CHUNK = gv.SCAN_CHUNK
    sub = blk // 128
    lanes = chains // blk * 128
    c = e // CHUNK
    r = e % CHUNK
    j = c // blk
    sl = (c % blk) // 128
    l = c % 128
    return (r * sub + sl) * lanes + (j * 128 + l)


def _tot_flat(pref, chains: int, blk: int):
    """Chain totals (last rank per chain) of a chained scan output, in flat
    chain order [16, chains]."""
    CHUNK = gv.SCAN_CHUNK
    sub = blk // 128
    nblocks = chains // blk
    tot = tuple(a[:, (CHUNK - 1) * sub :, :] for a in pref)  # [16, sub, lanes]
    return tuple(
        a.reshape(16, sub, nblocks, 128).transpose(0, 2, 1, 3).reshape(16, chains)
        for a in tot
    )


def _rank_local_scan(xcols, ycols, n: int, nodbl: bool = False):
    """Chain scan over the 32 sort-payload limb planes (rank-major input —
    a pure [n] -> [chains, CHUNK] reshape per plane, no stacking copy).
    Returns (pref coords in CHAINED layout, chain_offsets flat [16, chains]
    exclusive, blk, flag) — flag is a uint32 scalar, nonzero iff the
    doubling-free body hit an acc == q collision (always 0 when
    nodbl=False)."""
    CHUNK = gv.SCAN_CHUNK
    chains = n // CHUNK
    blk = min(gv.RANK_BLK, chains)
    ins = [c.reshape(chains, CHUNK) for c in xcols] + [
        c.reshape(chains, CHUNK) for c in ycols
    ]
    out = gv._rank_scan_call(CHUNK, chains, mixed=True, blk=blk, nodbl=nodbl)(*ins)
    if nodbl:
        pref, flag = out[:3], jnp.max(out[3])
    else:
        pref, flag = out, jnp.uint32(0)
    tot_pref = _rank_prefix_scan(_tot_flat(pref, chains, blk), chains)
    offs = tuple(
        jnp.concatenate([jnp.zeros((16, 1), dtype=a.dtype), a[:, :-1]], axis=1)
        for a in tot_pref
    )
    return pref, offs, blk, flag


def _rank_prefix_scan(P, m: int):
    """Inclusive Jacobian prefix scan over flat rank-major [16, m] coords:
    rank-major chain scans + recursive totals scan + one offset-add pass;
    m == 1024 runs as the single butterfly-scan kernel.  Returns flat
    rank-major [16, m]."""
    CHUNK = gv.SCAN_CHUNK
    chains = m // CHUNK
    blk = min(gv.RANK_BLK, chains)
    if m == 1024:
        return gv.block_scan_1024(P)
    if m % CHUNK or chains % blk or chains % 128:
        return _prefix_scan(_with_ones_z(P, m), m)
    sub = blk // 128
    nblocks = chains // blk
    rows, lanes = CHUNK * sub, nblocks * 128
    ins = [P[ci][i].reshape(chains, CHUNK) for ci in range(3) for i in range(16)]
    pref = gv._rank_scan_call(CHUNK, chains, mixed=False, blk=blk)(*ins)
    tot_pref = _rank_prefix_scan(_tot_flat(pref, chains, blk), chains)
    offs = tuple(
        jnp.concatenate([jnp.zeros((16, 1), dtype=a.dtype), a[:, :-1]], axis=1)
        for a in tot_pref
    )
    offs_ch = tuple(
        a.reshape(16, nblocks, sub, 128)
        .transpose(0, 2, 1, 3)
        .reshape(16, sub, lanes)
        for a in offs
    )
    out = gv._offset_add_call(CHUNK, rows, lanes, sub=sub)(*pref, *offs_ch)
    # chained -> flat rank-major
    return tuple(
        a.reshape(16, CHUNK, sub, nblocks, 128)
        .transpose(0, 3, 2, 4, 1)
        .reshape(16, m)
        for a in out
    )


def _pack_xy(PX, PY):
    """[n, 16] + [n, 16] 16-bit limbs -> [n, 16] PACKED u32 planes (plane j:
    limbs 2j | 2j+1 << 16 of X for j < 8, of Y for j >= 8).  Halves the
    payload bytes the per-window digit sort moves."""
    lox = PX[:, 0::2] | (PX[:, 1::2] << 16)
    loy = PY[:, 0::2] | (PY[:, 1::2] << 16)
    return jnp.concatenate([lox, loy], axis=1)


def _rows_prep(plane, nblocks: int, chunk: int):
    """Sorted rank stream [n] -> [nblocks, chunk*8, 128] row-major blocks
    (chain b*1024 + s*128 + l owns ranks chain*chunk + r at [b, r*8+s, l])."""
    return (
        plane.reshape(nblocks, 1024, chunk)
        .swapaxes(1, 2)
        .reshape(nblocks, chunk * 8, 128)
    )


def _rows_pos(e, chunk: int):
    """Rank e -> flat index into a [nblocks, chunk*8, 128] plane."""
    chain = e // chunk
    r = e % chunk
    b = chain >> 10
    s = (chain & 1023) >> 7
    l = chain & 127
    return ((b * chunk + r) * 8 + s) * 128 + l


def _unpack_gather(pref, pos):
    """Gather the fused prefix array at flat positions and unpack to
    coordinate limb stacks: pref [24, nblocks, chunk*8, 128] (one array —
    the scan kernel writes all 24 packed planes into a single output so
    this is ONE gather op; 24 separate jnp.take calls measured ~12 ms per
    window at V=2^16, XLA gather cost being dominated by per-op overhead).
    Returns (X, Y, Z) each [16, K]."""
    K = pos.shape[0]
    N = pref.shape[1] * pref.shape[2] * pref.shape[3]
    idx = (
        jnp.arange(24, dtype=pos.dtype)[:, None] * N + pos[None, :]
    ).reshape(-1)
    v = jnp.take(pref.reshape(-1), idx).reshape(24, K)
    coords = []
    for ci in range(3):
        limbs = []
        for j in range(8):
            limbs += [v[ci * 8 + j] & 0xFFFF, v[ci * 8 + j] >> 16]
        coords.append(jnp.stack(limbs))
    return tuple(coords)


def _digit_tails(d, c: int, n: int):
    """tails[v] = (count of digits <= v) - 1, i.e. the rank of the last
    sorted element of bucket v: a digit HISTOGRAM + cumulative sum, run as
    one-hot int8 matmuls on the MXU (hist[hi, lo] = onehot_hi^T @ onehot_lo
    over row chunks).  Replaces jnp.searchsorted over the sorted keys,
    which lowered to a gather-heavy binary search measured at ~11 ms per
    window at n=2^21, V=2^16 — the histogram needs no sorted input at all.

    d: [n] int32 window digits.  Returns int32 [V] (-1 where empty prefix).
    """
    clo = min(c, 8)
    chi = c - clo
    CH, CL = 1 << chi, 1 << clo
    lo = (d & (CL - 1)).astype(jnp.int32)
    hi = (d >> clo).astype(jnp.int32)
    ar_h = jnp.arange(CH, dtype=jnp.int32)
    ar_l = jnp.arange(CL, dtype=jnp.int32)
    m = min(n, 1 << 17)  # chunk rows: one-hot operands stay ~32 MB
    hist = jnp.zeros((CH, CL), jnp.int32)
    for s in range(0, n, m):
        oh = (hi[s : s + m, None] == ar_h[None, :]).astype(jnp.int8)
        ol = (lo[s : s + m, None] == ar_l[None, :]).astype(jnp.int8)
        hist = hist + jax.lax.dot_general(
            oh, ol, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    return jnp.cumsum(hist.reshape(CH * CL)) - 1


HIST_CHUNK = 8192  # digits per histogram grid step (one-hots stay ~4 MB VMEM)


def _digit_tails_all(digits_all, c: int, n: int):
    """tails[w, v] = (count of window-w digits <= v) - 1 for ALL windows in
    one fused histogram kernel + a cumsum.  digits_all: [n_windows, n] int32
    (values < 2^c <= 2^16).  Returns int32 [n_windows, 2^c].

    (The single-tile special case of the tiled histogram: tile_chunks ==
    nchunks gives ntiles == 1.)"""
    n_windows = digits_all.shape[0]
    m = min(HIST_CHUNK, n)
    assert n % m == 0
    nchunks = n // m
    # [n_windows, n] -> (nchunks, n_windows, m): chunk-major so each grid
    # step's block covers the (n_windows, m) trailing dims whole
    d_in = jnp.transpose(
        digits_all.reshape(n_windows, nchunks, m), (1, 0, 2)
    )
    hist = _hist_tiled_call(n_windows, nchunks, m, nchunks, fv._interpret())(
        d_in
    )[0]
    tails = jnp.cumsum(hist.reshape(n_windows, 65536), axis=1) - 1
    return tails[:, : (1 << c)]


@functools.lru_cache(maxsize=None)
def _hist_tiled_call(n_windows: int, nchunks: int, m: int, tile_chunks: int,
                     interpret: bool):
    """Per-TILE digit histograms: [nchunks, n_windows, m] int32 digits ->
    [ntiles, n_windows, 256, 256] int32 counts, where tile t covers chunks
    [t*tile_chunks, (t+1)*tile_chunks).

    One-hot operands are built IN VMEM (lane-major [256, m], digits
    broadcast along sublanes — no in-kernel relayout) and contracted on the
    MXU (bf16 with f32 accumulation — exact: products are 0/1 and per-chunk
    counts are < 2^24), so the only HBM traffic is the digit read.  The
    accumulator resets at each tile boundary.  Replaces the jnp one-hot
    matmul (_digit_tails), which materialized ~1 GB of one-hot operands per
    window through HBM — measured 10.6 ms/window at n=2^21 vs ~1.3 ms."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntiles = nchunks // tile_chunks

    def kernel(d_ref, o_ref, acc):
        ci = pl.program_id(0)

        @pl.when(ci % tile_chunks == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        ar = jax.lax.broadcasted_iota(jnp.int32, (256, m), 0)
        for w in range(n_windows):
            d = d_ref[0, w, :][None, :]  # (1, m) int32 digits
            oh = (jax.lax.div(d, 256) == ar).astype(jnp.bfloat16)
            ol = ((d & 255) == ar).astype(jnp.bfloat16)
            acc[w] += jax.lax.dot_general(
                oh, ol, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(ci % tile_chunks == tile_chunks - 1)
        def _():
            o_ref[...] = acc[...].astype(jnp.int32)[None]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ntiles, n_windows, 256, 256),
                                       jnp.int32),
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((1, n_windows, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, n_windows, 256, 256),
            lambda i: (i // tile_chunks, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((n_windows, 256, 256), jnp.float32)],
        interpret=interpret,
    )


def _digit_tails_tiled(digits_all, c: int, n: int, tile: int):
    """Per-tile bucket tails with the tile base offset folded in:

        tails[w, t, v] = t*tile - 1 + #{i in tile t : digit_w[i] <= v}

    i.e. the GLOBAL rank of the last element of tile t's bucket-(<=v) prefix
    in the per-tile-sorted stream; t*tile - 1 when the prefix is empty (< 0
    only for t == 0, where it selects the identity placeholder downstream).
    Returns int32 [n_windows, ntiles, 2^c]."""
    n_windows = digits_all.shape[0]
    ntiles = n // tile
    m = min(HIST_CHUNK, n)
    assert n % m == 0 and tile % m == 0
    nchunks = n // m
    d_in = jnp.transpose(
        digits_all.reshape(n_windows, nchunks, m), (1, 0, 2)
    )
    hist = _hist_tiled_call(
        n_windows, nchunks, m, tile // m, fv._interpret()
    )(d_in)  # [ntiles, n_windows, 256, 256]
    V = 1 << c
    hi_rows = (V + 255) // 256  # digits < 2^c -> only these rows non-zero
    h = hist[:, :, :hi_rows, :].reshape(ntiles, n_windows, hi_rows * 256)
    tails = jnp.cumsum(h, axis=-1)[..., :V] - 1
    base = (jnp.arange(ntiles, dtype=jnp.int32) * tile)[:, None, None]
    return jnp.transpose(tails + base, (1, 0, 2))


def _ablate() -> set:
    """TIMING DIAGNOSTICS ONLY: comma list in HALO2_MSM_TIMING_ABLATE of
    pipeline pieces to stub out (results become WRONG; shapes/costs of the
    remaining pieces are preserved).  Pieces: sort (keys-only sort, payload
    rides unpermuted), scan (skip the rank-scan kernel), tails (skip the
    searchsorted), gathers (slices instead of prefix gathers), offsets (skip
    the chain-offset recursion), reduce (skip the bucket tree reduce)."""
    import os

    return set(
        filter(None, os.environ.get("HALO2_MSM_TIMING_ABLATE", "").split(","))
    )


def _guard_ablation():
    """The ablation set is read at TRACE time and is not part of any jit
    cache key, so a stray HALO2_MSM_TIMING_ABLATE would silently bake a
    wrong-result program into the cache.  Production entry points refuse to
    run while it is set (profiling scripts call the partials directly)."""
    ab = _ablate()
    if ab:
        raise RuntimeError(
            "HALO2_MSM_TIMING_ABLATE is set (%s): results would be wrong and "
            "the ablated program would poison the in-process jit cache; unset "
            "it (and restart the process if partials were already traced) "
            "before calling msm_vec/msm_vec_batch" % sorted(ab)
        )


def _rank_prefix_at_rows(sorted_packed, n: int, idx, safe: bool):
    """Row-major scan over the packed sorted stream + prefix values at rank
    indices `idx` [K].  Returns (T coords [16, K] triple, flag u32)."""
    ab = _ablate()
    CHUNK = gv.SCAN_CHUNK
    chains = n // CHUNK
    nblocks = chains // 1024
    if fv._interpret():
        ins = [_rows_prep(p, nblocks, CHUNK) for p in sorted_packed]
    else:
        ins = gv.rows_prep_fused(list(sorted_packed), nblocks, CHUNK)
    if "scan" in ab:
        pref = jnp.stack(list(ins) + list(ins[:8]))
        flag = jnp.uint32(0)
    else:
        outs = gv._rank_scan_rows_call(CHUNK, nblocks, nodbl=not safe)(*ins)
        pref = outs[0]  # fused [24, nblocks, chunk*8, 128]
        flag = jnp.max(outs[1]) if not safe else jnp.uint32(0)
    # chain totals (rank CHUNK-1 of every chain) -> exclusive offsets
    tot = []
    for ci in range(3):
        limbs = []
        for j in range(8):
            v = pref[ci * 8 + j, :, (CHUNK - 1) * 8 :, :].reshape(chains)
            limbs += [v & 0xFFFF, v >> 16]
        tot.append(jnp.stack(limbs))
    if "offsets" in ab:
        offs = tuple(tot)
    else:
        tot_pref = _rank_prefix_scan(tuple(tot), chains)
        offs = tuple(
            jnp.concatenate(
                [jnp.zeros((16, 1), dtype=a.dtype), a[:, :-1]], axis=1
            )
            for a in tot_pref
        )
    if "gathers" in ab:
        K = idx.shape[0]
        local = []
        for ci in range(3):
            limbs = []
            for j in range(8):
                v = pref[ci * 8 + j].reshape(-1)[:K]  # slice, not gather
                limbs += [v & 0xFFFF, v >> 16]
            local.append(jnp.stack(limbs))
        local = tuple(local)  # noqa: shapes match the gather path
        off_at = tuple(a[:, : min(K, a.shape[1])] for a in offs)
        off_at = tuple(
            jnp.pad(a, ((0, 0), (0, K - a.shape[1]))) for a in off_at
        )
    else:
        # embedding-style ROW gathers: transpose plane-major arrays to
        # row-major with the Mosaic transpose unit, then take CONTIGUOUS
        # 96/192-byte rows — XLA's gather costs per ROW, not per element
        # (the flat 24*K-scalar take this replaces measured 11.8 ms/window
        # at K=2^16; rows land at gather-overhead ~0.5 ms)
        K = idx.shape[0]
        prefT = fv.transpose_to_rows_u32(pref.reshape(24, n))  # [n, 24]
        loc_rows = jnp.take(prefT, _rows_pos(idx, CHUNK), axis=0)  # [K, 24]
        loc_t = fv.transpose_u32(loc_rows)  # [24, K]
        local = []
        for ci in range(3):
            limbs = []
            for j in range(8):
                v = loc_t[ci * 8 + j]
                limbs += [v & 0xFFFF, v >> 16]
            local.append(jnp.stack(limbs))
        local = tuple(local)
        offsT = fv.transpose_to_rows_u32(jnp.concatenate(offs, axis=0))
        off_rows = jnp.take(offsT, idx // CHUNK, axis=0)  # [K, 48]
        off_t = fv.transpose_u32(off_rows)  # [48, K]
        off_at = (off_t[:16], off_t[16:32], off_t[32:])
    return _vpadd_flat(local, off_at, idx.shape[0]), flag


def _rank_prefix_at(xcols, ycols, n: int, idx, nodbl: bool = False):
    """Inclusive-prefix values of the sorted point stream at rank indices
    `idx` [K]: rank-major scan + gathers at chained positions + one padd.
    Returns (T, flag) — see _rank_local_scan."""
    CHUNK = gv.SCAN_CHUNK
    chains = n // CHUNK
    pref, offs, blk, flag = _rank_local_scan(xcols, ycols, n, nodbl=nodbl)
    pos = _chained_pos(idx, chains, blk)
    local = tuple(jnp.take(a.reshape(16, -1), pos, axis=1) for a in pref)
    off_at = tuple(jnp.take(a, idx // CHUNK, axis=1) for a in offs)
    return _vpadd_flat(local, off_at, idx.shape[0]), flag


def _rank_reduce(P, m: int):
    """Sum of m points (flat [16, m]): rank-major chain scans for large m,
    the padded vpadd tree below; returns coords [16, 1].

    Deliberately avoids the monolithic butterfly-reduce kernels
    (gv.block_reduce): their ~14 inlined Jacobian adds cost ~530 s of
    trace+lowering on the 1-core driver host (round-5 probe), vs ~1 padd
    for the fori_loop rank-scan kernel and ONE shared vpadd lowering for
    the whole tree (every _vpadd_flat level <= GROUP pads to the same
    [16, 8, 128] kernel shape, so the lowering is lru-shared)."""
    if fv._interpret():
        return _tree_reduce(P, m)
    CHUNK = gv.SCAN_CHUNK
    chains = m // CHUNK
    blk = min(gv.RANK_BLK, chains) if chains else 0
    if m % CHUNK or not blk or chains % blk or chains % 128:
        return _tree_reduce(P, m)
    ins = [P[ci][i].reshape(chains, CHUNK) for ci in range(3) for i in range(16)]
    pref = gv._rank_scan_call(CHUNK, chains, mixed=False, blk=blk)(*ins)
    return _rank_reduce(_tot_flat(pref, chains, blk), chains)


def _tree_reduce(P, m: int):
    """Reduce m points (flat [16, m]) to one with a halving padd tree."""
    while m > 1:
        half = m // 2
        lo = tuple(a[:, :half] for a in P)
        hi = tuple(a[:, half : 2 * half] for a in P)
        s = _vpadd_flat(lo, hi, half)
        if m % 2:
            s = tuple(
                jnp.concatenate([a, b[:, -1:]], axis=1) for a, b in zip(s, P)
            )
            m = half + 1
        else:
            m = half
        P = s
    return P


@functools.partial(jax.jit, static_argnames=("c", "bits", "safe"))
def _msm_window_partials(PX, PY, scalars, c: int, bits: int = SCALAR_BITS,
                         safe: bool = False):
    """Per window: (T_max, sum_T) Jacobian partials, each [n_windows] points.

    PX, PY: [n, 16] Montgomery Fq (limbs-last for coalesced gathers).
    scalars: [n, 16] raw Fr limbs.
    Returns (coord array [n_windows, 2, 48] (host-foldable), flags
    [n_windows] uint32).

    The window loop is a lax.scan so the (heavy) per-window graph traces
    once; digits are the scanned input.

    safe=False uses the doubling-free mixed add in the rank scan (distinct
    base points assumed); flags report any acc == q collision — the caller
    must recompute with safe=True if one fires (see _padd_mixed_body).
    """
    n = PX.shape[0]
    assert n & (n - 1) == 0, "msm_vec needs a power-of-two point count"
    V = 1 << c
    digits_all = _digits(scalars, c, bits)
    one = jnp.asarray(gv._ONE_COL.reshape(16))
    assert c <= 16, "digits must fit u16 (sort keys)"

    CHUNK = gv.SCAN_CHUNK
    chains = n // CHUNK
    fast = not fv._interpret() and n % (CHUNK * 1024) == 0
    # c <= 13 selects the TILED grouping pipeline: per-tile in-VMEM bitonic
    # sort (gv._tile_sort_call) + per-tile bucket tails.  Bucket partial
    # sums are associative across tiles and the cross-tile boundary terms
    # cancel exactly in the telescope (see the tiled branch below), so the
    # global 17-operand XLA payload sort — measured ~60% of the whole MSM
    # at 2^20 — is never needed.  c == 16 keeps the legacy global-sort path
    # (explicit-c callers: dist/msm.py shards, profiling scripts).
    # (`fast` already implies n >= SCAN_CHUNK*1024 = 2^15, which the
    # histogram chunking divides — no separate size gate needed)
    tiled = fast and c <= 13
    # the point limbs ride the sort as PACKED payload operands (2 limbs per
    # u32 plane, 17 sort operands total): measured cheaper than sorting
    # (key, iota) and row-gathering the points afterwards (XLA's row gather
    # runs at gather-op overhead speed regardless of locality,
    # scripts/gather_probe.py), and packing halves the sort's byte traffic
    if tiled:
        tile = min(TILE_SORT, n)
        ntiles = n // tile
        R = tile // 128
        # [n,16] packed planes -> plane-major [16,n] ONCE (Mosaic transpose);
        # per window only the key plane changes
        payT = fv.transpose_u32(_pack_xy(PX, PY))
        pay_in = payT.reshape(16, ntiles, R, 128)
        pcols = ()
    elif fast:
        packed = _pack_xy(PX, PY)  # [n, 16]
        pcols = tuple(packed[:, i] for i in range(16))
    else:
        PXY = jnp.concatenate([PX, PY], axis=1)  # [n, 32]
        pcols = tuple(PXY[:, i] for i in range(32))

    ab = _ablate()

    # all windows' bucket tails from ONE fused histogram kernel (MXU one-hot
    # contraction in VMEM) — outside the window scan, ~8x cheaper than the
    # per-window jnp one-hot matmul it replaces
    if tiled:
        if "tails" in ab:
            step = max(1, tile // V)
            fake = (
                jnp.arange(ntiles, dtype=jnp.int32)[:, None] * tile
                + jnp.arange(V, dtype=jnp.int32)[None, :] * step
                + (step - 1)
            )
            tails_all = jnp.broadcast_to(
                fake[None], (digits_all.shape[0], ntiles, V)
            )
        else:
            tails_all = _digit_tails_tiled(digits_all, c, n, tile)
    elif fast and "tails" not in ab:
        tails_all = _digit_tails_all(digits_all, c, n)
    else:
        tails_all = jnp.zeros((digits_all.shape[0], V), jnp.int32)

    def one_window_tiled(carry, scanned):
        """Tiled grouping: per-tile sorted stream + GLOBAL prefix scan.

        With parts t and G() the global inclusive prefix of the per-tile-
        sorted stream, the per-tile bucket prefix is
        T_t[v] = G(p_t(v)) - G(end_{t-1}), and summing the window telescope
        sum_v v*B_v = (V-1)*T[V-1] - sum_{v<V-1} T[v] over tiles makes every
        G(end_{t-1}) term cancel: the partials are simply

            t_max = sum_t G(p_t(V-1)),   sum_t = sum_{t, v<V-1} G(p_t(v))

        — same (T_max, sum_T) contract as the global-sort path, so the host
        fold is unchanged."""
        d, tails_in = scanned  # [n] digits, [ntiles, V] global tail ranks
        key = d.astype(jnp.uint32).reshape(ntiles, R, 128)
        if "sort" in ab:
            sp = pay_in  # TIMING DIAGNOSTIC ONLY: skip the grouping
        else:
            sp = gv._tile_sort_call(ntiles, R, fv._interpret())(key, pay_in)
        planes = tuple(sp[j].reshape(n) for j in range(16))
        tails_flat = tails_in.reshape(-1)  # K = ntiles*V
        K = tails_flat.shape[0]
        safe_idx = jnp.clip(tails_flat, 0, n - 1)
        T, flag = _rank_prefix_at_rows(planes, n, safe_idx, safe=safe)
        none_mask = (tails_flat < 0)[None, :]  # only possible at t == 0
        T = (
            jnp.where(none_mask, one[:, None], T[0]),
            jnp.where(none_mask, one[:, None], T[1]),
            jnp.where(none_mask, 0, T[2]),
        )
        # t_max = sum over tiles of G at each tile's last rank (column V-1)
        t_max = _tree_reduce(tuple(a[:, V - 1 :: V] for a in T), ntiles)
        if "reduce" in ab:
            sum_t = t_max
        else:
            # zero out (identity) the V-1 columns, reduce everything else
            keep = (
                jnp.arange(K, dtype=jnp.int32) % V != V - 1
            )[None, :]
            sum_t = _rank_reduce(tuple(jnp.where(keep, a, 0) for a in T), K)
        out = jnp.stack(
            [
                jnp.concatenate(t_max, 0)[:, 0],
                jnp.concatenate(sum_t, 0)[:, 0],
            ],
            axis=0,
        )  # [2, 48]
        return carry, (out, flag)

    def one_window(carry, scanned):
        d, tails_in = scanned
        # bucket grouping only needs GROUPED order, not a stable sort
        if "sort" in ab and fast:
            # TIMING DIAGNOSTIC ONLY (wrong results): keys-only sort, the
            # un-permuted planes ride through — isolates the payload
            # movement cost of the sort
            sd = jax.lax.sort(d.astype(jnp.uint16), dimension=0)
            sorted_ops = (sd,) + pcols
        else:
            sorted_ops = jax.lax.sort(
                (d.astype(jnp.uint16),) + pcols,
                num_keys=1,
                is_stable=False,
                dimension=0,
            )
            sd = sorted_ops[0]
        # T[v] = prefix at last index with digit <= v (identity if none) —
        # gathered from local prefixes + per-chain offsets, no full prefix
        if "tails" in ab:
            step = max(1, n // V)
            tails = jnp.arange(V, dtype=jnp.int32) * step + (step - 1)
        elif fast:
            tails = tails_in  # fused-histogram kernel output, sort-free
        else:
            tails = (
                jnp.searchsorted(
                    sd, jnp.arange(V, dtype=jnp.uint16), side="right"
                )
                - 1
            )
        safe_idx = jnp.clip(tails, 0, n - 1)
        if fast:
            # packed sorted planes feed the row-major scan kernel
            T, flag = _rank_prefix_at_rows(
                sorted_ops[1:], n, safe_idx, safe=safe
            )
        else:
            S = jnp.stack(sorted_ops[1:], axis=0)  # [32, n] rank-major
            full = _prefix_scan(_with_ones_z((S[:16], S[16:]), n), n)
            T = tuple(jnp.take(a, safe_idx, axis=1) for a in full)
            flag = jnp.uint32(0)
        none_mask = (tails < 0)[None, :]
        T = (
            jnp.where(none_mask, one[:, None], T[0]),
            jnp.where(none_mask, one[:, None], T[1]),
            jnp.where(none_mask, 0, T[2]),
        )
        t_max = tuple(a[:, V - 1 :] for a in T)  # [16, 1] == full sum
        if "reduce" in ab:
            sum_t = t_max
        else:
            # sum over T[0..V-2]: zero-pad (identity) to V and chain-reduce
            Tpad = tuple(
                jnp.concatenate(
                    [a[:, : V - 1], jnp.zeros((16, 1), dtype=a.dtype)], axis=1
                )
                for a in T
            )
            sum_t = _rank_reduce(Tpad, V)
        out = jnp.stack(
            [
                jnp.concatenate(t_max, 0)[:, 0],
                jnp.concatenate(sum_t, 0)[:, 0],
            ],
            axis=0,
        )  # [2, 48]
        return carry, (out, flag)

    _, (outs, flags) = jax.lax.scan(
        one_window_tiled if tiled else one_window, 0, (digits_all, tails_all)
    )
    return outs, flags  # [n_windows, 2, 48], [n_windows]


def use_vec_msm(n: int) -> bool:
    """The sort+scan pipeline runs on TPU for power-of-two sizes large
    enough to amortize its kernel dispatches; elsewhere the portable
    Pippenger (ec/msm.py) is both the fallback and the test oracle."""
    return not fv._interpret() and n >= (1 << 15) and n & (n - 1) == 0


GLV_BITS = 128  # |k1|, |k2| < 2^128 (bound proven in ec/glv.py)


@functools.partial(jax.jit, static_argnames=("c", "safe"))
def _msm_window_partials_glv(PX, PY, scalars, c: int, safe: bool = False):
    """GLV-split window partials: decompose every scalar as k1 + k2*lambda,
    double the point stream with phi(P) = (beta x, y) (signs folded into Y),
    and run the bucket pipeline over 128-bit sub-scalars — half the windows
    of the direct 256-bit path for the same sort+scan volume per window.
    The split runs as one fused kernel (ec/glv.py glv_split_device)."""
    from . import glv as glv_mod

    PXa, PYa, S = glv_mod.glv_split_device(PX, PY, scalars)
    return _msm_window_partials(PXa, PYa, S, c, bits=GLV_BITS, safe=safe)


def msm_vec(PX, PY, scalars, c: int | None = None, glv: bool | None = None):
    """Full MSM; returns a host affine point (or None).

    PX, PY: [n, 16] Montgomery Fq device arrays; scalars raw Fr [n, 16].
    glv=None enables the endomorphism split automatically at sizes where
    the halved window count pays (the split itself is a few wide limb
    multiplies per scalar, fused by XLA)."""
    _guard_ablation()
    n = PX.shape[0]
    if c is None:
        # default to the GLOBAL-sort pipeline (c=16): measured 341.7 ms at
        # 2^20 GLV — within noise of the tiled c=13 path's 338 ms — while
        # its traced program lowers in ~1/4 the time (the tiled path's
        # cold trace+compile exceeded every driver budget on the 1-core
        # host, round-4 verdict; trace cost recurs EVERY fresh process,
        # warm compile caches notwithstanding)
        c = 16 if n >= (1 << 16) else (8 if n >= (1 << 7) else 4)
    if glv is None:
        glv = n >= (1 << 15)
    V = 1 << c
    fn = _msm_window_partials_glv if glv else _msm_window_partials
    parts, flags = fn(PX, PY, scalars, c)
    parts = np.asarray(parts)
    if np.asarray(flags).any():
        # an acc == q collision invalidated the doubling-free scan (duplicate
        # base points, or a genuine curve collision) — safe body re-run
        parts = np.asarray(fn(PX, PY, scalars, c, safe=True)[0])

    return _fold_partials(parts, c)


def _jac_ints(coords):
    """[48] mont limbs triple -> standard-form (x, y, z) ints."""
    return (
        mont_limbs_to_int(coords[0:16], FQ_MOD),
        mont_limbs_to_int(coords[16:32], FQ_MOD),
        mont_limbs_to_int(coords[32:48], FQ_MOD),
    )


def _fold_partials(parts, c: int):
    """Horner window fold of [n_windows, 2, 48] (T_max, sum_T) partials ->
    host affine point (or None).  Runs in the native C++ library when
    available (halo2_tpu/native), else over Python bigints."""
    from .. import native

    V = 1 << c
    n_windows = parts.shape[0]
    if native.lib() is not None:
        return native.msm_fold(
            [(_jac_ints(parts[w, 0, :]), _jac_ints(parts[w, 1, :]))
             for w in range(n_windows)],
            c,
        )

    def to_host(coords):
        return ec_host.g1_jacobian_to_affine(*_jac_ints(coords))

    acc = None
    for w in range(n_windows - 1, -1, -1):
        for _ in range(c):
            acc = ec_host.g1_double(acc)
        t_max = to_host(parts[w, 0, :])
        sum_t = to_host(parts[w, 1, :])
        wsum = ec_host.g1_add(
            ec_host.g1_mul(t_max, V - 1) if t_max is not None else None,
            ec_host.g1_neg(sum_t) if sum_t is not None else None,
        )
        acc = ec_host.g1_add(acc, wsum)
    return acc


def msm_vec_batch_async(PX, PY, raw_list, c: int | None = None,
                        glv: bool | None = None):
    """Dispatch m MSMs over the same points WITHOUT blocking; returns a
    zero-arg resolver producing the m host affine points.  Device work
    dispatched between the two calls (e.g. the prover's basis-conversion
    NTTs) executes while the window partials run and the host folds read
    back — the host-pipeline overlap of SURVEY.md §2.3."""
    _guard_ablation()
    n = PX.shape[0]
    if c is None:
        # default to the GLOBAL-sort pipeline (c=16): measured 341.7 ms at
        # 2^20 GLV — within noise of the tiled c=13 path's 338 ms — while
        # its traced program lowers in ~1/4 the time (the tiled path's
        # cold trace+compile exceeded every driver budget on the 1-core
        # host, round-4 verdict; trace cost recurs EVERY fresh process,
        # warm compile caches notwithstanding)
        c = 16 if n >= (1 << 16) else (8 if n >= (1 << 7) else 4)
    if glv is None:
        glv = n >= (1 << 15)
    fn = _msm_window_partials_glv if glv else _msm_window_partials
    cc = c
    outs = [fn(PX, PY, s, cc) for s in raw_list]  # async dispatch, no block

    def resolve() -> list:
        results = []
        for i, (parts, flags) in enumerate(outs):
            parts_np = np.asarray(parts)
            if np.asarray(flags).any():
                parts_np = np.asarray(fn(PX, PY, raw_list[i], cc,
                                         safe=True)[0])
            results.append(_fold_partials(parts_np, cc))
        return results

    return resolve


def msm_vec_batch(PX, PY, raw_list, c: int | None = None,
                  glv: bool | None = None) -> list:
    """m MSMs over the same points: ALL window-partials programs are
    dispatched before the first (tiny) readback, so the device pipelines
    the m kernels back-to-back — one relay round trip total instead of one
    per commitment (the prover's per-phase commitment batches)."""
    return msm_vec_batch_async(PX, PY, raw_list, c, glv)()


def msm_vec_host(points, scalars, c: int | None = None):
    """Host affine points + int scalars -> host affine point."""
    from ..field.bn254 import FR_MOD
    from . import jax_g1 as g1

    PX, PY, _ = g1.points_to_device(points)
    s = jnp.asarray(ints_to_limbs([x % FR_MOD for x in scalars]))
    return msm_vec(PX, PY, s, c)
