"""Per-stage profile of the PRODUCTION MSM pipeline (rows-scan path).

Times each piece of _msm_window_partials_glv at the bench operating point
(k=20 -> GLV stream n=2^21, c=16) in isolation, plus microbenchmarks of
candidate replacements (row-major embedding-style gathers).

Run:  python scripts/msm_profile2.py        (real chip; one window per rep)
Env:  PROF_K (default 20 -> n=2^21 stream), PROF_REPS (default 3)
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from halo2_tpu.utils import enable_compilation_cache


def log(m):
    print(m, file=sys.stderr, flush=True)


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1)][:1])


REPS = int(os.environ.get("PROF_REPS", "3"))


def timeit(name, fn, variants, reps=REPS):
    t0 = time.perf_counter()
    fence(fn(variants[0]))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for i in range(reps):
        out = fn(variants[(i + 1) % len(variants)])
    fence(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    log(f"{name:<38} {ms:9.2f} ms   (compile+first {tc:.1f}s)")
    return ms


def main():
    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")
    from halo2_tpu.ec import msm_vec as mv
    from halo2_tpu.ec import g1_vec as gv
    from halo2_tpu.ec import glv as glv_mod

    k = int(os.environ.get("PROF_K", "20"))
    n_in = 1 << k          # MSM size
    n = n_in * 2           # GLV stream size
    c = 16
    V = 1 << c
    CHUNK = gv.SCAN_CHUNK
    chains = n // CHUNK
    nblocks = chains // 1024

    from halo2_tpu.utils import device_put_chunked

    d = np.load(".bench_cache/msm_points_k16.npz")
    px, py = d["px"], d["py"]
    PX = device_put_chunked(px)
    PY = device_put_chunked(py)
    if n_in > px.shape[0]:
        reps_t = n_in // px.shape[0]
        tile = jax.jit(lambda a: jnp.tile(a, (reps_t, 1)))
        PX, PY = tile(PX), tile(PY)
    fence(PX)
    log(f"n_msm=2^{k}  stream n=2^{k+1}  chains={chains}  nblocks={nblocks}")

    # --- glv split (whole-MSM cost, not per window) -----------------------
    def rand_scalars(seed):
        @jax.jit
        def gen(key):
            bits = jax.random.bits(key, (n_in, 16), dtype=jnp.uint32) & 0xFFFF
            mask = jnp.full((16,), 0xFFFF, jnp.uint32).at[15].set(0x2FFF)
            return bits & mask[None, :]
        return gen(jax.random.PRNGKey(seed))

    scs = [rand_scalars(i) for i in range(3)]
    for s in scs:
        fence(s)

    split = jax.jit(glv_mod.glv_split_device)
    timeit("glv_split (per MSM)", lambda s: split(PX, PY, s), scs)
    PXa, PYa, S = split(PX, PY, scs[0])
    fence(PXa)

    # --- digits (all 8 windows, per MSM) ----------------------------------
    dig = jax.jit(lambda s: mv._digits(s, c, mv.GLV_BITS))
    timeit("digits 8 windows (per MSM)", lambda s: dig(s), [S])
    digits_all = dig(S)
    dcols = [digits_all[i] for i in range(3)]
    for v in dcols:
        fence(v)

    # --- packed payload sort (per window) ---------------------------------
    @jax.jit
    def f_pack(pxa, pya):
        return mv._pack_xy(pxa, pya)

    packed = f_pack(PXa, PYa)
    fence(packed)

    @jax.jit
    def f_sort(dv, pk):
        pcols = tuple(pk[:, i] for i in range(16))
        return jax.lax.sort(
            (dv.astype(jnp.uint16),) + pcols,
            num_keys=1, is_stable=False, dimension=0,
        )
    timeit("sort 17 packed ops (per win)", lambda dv: f_sort(dv, packed), dcols)

    @jax.jit
    def f_sort2(dv, pk):
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        return jax.lax.sort(
            (dv.astype(jnp.uint16), iota), num_keys=1, is_stable=False,
            dimension=0,
        )
    timeit("sort key+iota only (per win)", lambda dv: f_sort2(dv, packed), dcols)

    # --- tails histogram (per window) -------------------------------------
    f_tails = jax.jit(lambda dv: mv._digit_tails(dv, c, n))
    timeit("tails MXU histogram (per win)", f_tails, dcols)
    tails = f_tails(dcols[0])
    fence(tails)

    sorted_ops = f_sort(dcols[0], packed)
    fence(sorted_ops)
    sorts = [f_sort(v, packed) for v in dcols]
    for srt in sorts:
        fence(srt)

    # --- rows transpose (per window) --------------------------------------
    @jax.jit
    def f_prep(*ops):
        return [mv._rows_prep(p, nblocks, CHUNK) for p in ops[1:]]
    timeit("rows_prep transposes (per win)", lambda s: f_prep(*s), sorts)

    # --- rank scan rows kernel alone (per window) -------------------------
    @jax.jit
    def f_scan(*ops):
        ins = [mv._rows_prep(p, nblocks, CHUNK) for p in ops[1:]]
        outs = gv._rank_scan_rows_call(CHUNK, nblocks, nodbl=True)(*ins)
        return outs[0]
    timeit("prep+scan kernel (per win)", lambda s: f_scan(*s), sorts)

    # --- full _rank_prefix_at_rows (per window) ---------------------------
    safe_idx = jnp.clip(tails, 0, n - 1)

    @jax.jit
    def f_par(idx, *ops):
        return mv._rank_prefix_at_rows(ops[1:], n, idx, safe=False)[0]
    timeit("prefix_at_rows full (per win)", lambda s: f_par(safe_idx, *s), sorts)

    # --- bucket reduce (per window) ---------------------------------------
    T = f_par(safe_idx, *sorts[0])
    fence(T)
    Ts = [f_par(safe_idx, *srt) for srt in sorts]
    for t in Ts:
        fence(t)

    @jax.jit
    def f_red(a, b, z):
        Tpad = tuple(
            jnp.concatenate([x[:, : V - 1], jnp.zeros((16, 1), dtype=x.dtype)],
                            axis=1)
            for x in (a, b, z)
        )
        return mv._rank_reduce(Tpad, V)
    timeit("bucket reduce V=2^16 (per win)", lambda t: f_red(*t), Ts)

    # --- microbench: embedding-style row gathers --------------------------
    big = jnp.reshape(sorted_ops[1], (-1,))  # reuse device memory
    A24 = jnp.tile(packed[:, :12], (1, 2))   # [n_in, 24] u32
    fence(A24)
    idxs = [
        jnp.asarray(np.sort(np.random.default_rng(i).integers(
            0, n_in, V).astype(np.int32)))
        for i in range(3)
    ]
    for ix in idxs:
        fence(ix)

    g24 = jax.jit(lambda ix, a: jnp.take(a, ix, axis=0))
    timeit("row-take [V,24] from [2^20,24]", lambda ix: g24(ix, A24), idxs)

    A16 = packed  # [2^21, 16]
    bigidx = [
        jnp.asarray(np.random.default_rng(7 + i).permutation(
            n).astype(np.int32))
        for i in range(2)
    ]
    for ix in bigidx:
        fence(ix)
    g16 = jax.jit(lambda ix, a: jnp.take(a, ix, axis=0))
    timeit("row-take [2^21,16] permutation", lambda ix: g16(ix, A16), bigidx)

    # flat scalar gather for comparison (the current _unpack_gather shape)
    flat = jnp.reshape(A24, (-1,))
    fidx = [
        jnp.asarray(np.random.default_rng(11 + i).integers(
            0, n_in * 24, 24 * V).astype(np.int32))
        for i in range(2)
    ]
    for ix in fidx:
        fence(ix)
    gf = jax.jit(lambda ix, a: jnp.take(a, ix))
    timeit("flat-take 24*V scalars (current)", lambda ix: gf(ix, flat), fidx)


if __name__ == "__main__":
    main()
