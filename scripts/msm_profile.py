"""Per-stage MSM profile on the real chip (one window of the 2^20 MSM).

Times each pipeline piece in isolation (chained reps, readback-fenced):
sort, perm-compose, point gather, transpose->chained, local scan kernel,
offsets (totals scan), prefix_at tail, bucket butterfly-reduce, and the full
fused window for comparison.
"""

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
    # device-side slice FIRST, then a tiny readback (np.asarray of the full
    # array would download hundreds of MB through the relay)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1)][:1])


def timeit(name, fn, *args, reps=3):
    fn(*args)  # compile
    fence(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    fence(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    log(f"{name:<28} {ms:8.2f} ms")
    return ms


def main():
    enable_compilation_cache()
    from halo2_tpu.ec import msm_vec as mv
    from halo2_tpu.ec import g1_vec as gv
    from halo2_tpu.field import vec as fv

    k = 20
    n = 1 << k
    c = 16
    V = 1 << c
    CHUNK = gv.SCAN_CHUNK
    chains = n // CHUNK
    lanes = chains // 1024 * 128

    d = np.load(".bench_cache/msm_points_k20.npz")
    PX, PY = jnp.asarray(d["px"]), jnp.asarray(d["py"])
    PXY = jnp.concatenate([PX, PY], axis=1)
    PXY16 = jax.lax.bitcast_convert_type(PXY, jnp.uint16).reshape(n, 64)

    rng = np.random.default_rng(3)
    dcol = jnp.asarray(rng.integers(0, V, size=n, dtype=np.int32))

    # --- sort ---------------------------------------------------------------
    @jax.jit
    def f_sort(dv):
        return jax.lax.sort(
            (dv.astype(jnp.uint16), jax.lax.iota(jnp.int32, n)), num_keys=1
        )

    sd, order = f_sort(dcol)
    timeit("sort (u16 key)", f_sort, dcol)

    # --- perm compose + gather + transpose ----------------------------------
    nblocks = n // CHUNK // 1024

    @jax.jit
    def f_compose(o):
        return o.reshape(nblocks, 8, 128, CHUNK).transpose(3, 1, 0, 2).reshape(n)

    idx = f_compose(order)
    timeit("perm compose", f_compose, order)

    @jax.jit
    def f_gather(i):
        return jnp.take(PXY16, i, axis=0)

    G16 = f_gather(idx)
    timeit("point gather (u16 rows)", f_gather, idx)

    @jax.jit
    def f_transpose(g):
        G = jax.lax.bitcast_convert_type(g.reshape(n, 32, 2), jnp.uint32)
        return jnp.transpose(G, (1, 0)).reshape(32, CHUNK * 8, lanes)

    Tc = f_transpose(G16)
    timeit("bitcast+2D transpose", f_transpose, G16)

    Xc, Yc = Tc[:16], Tc[16:]

    # --- local scan kernel (mixed) + offsets --------------------------------
    scan_call = gv._local_scan_call(CHUNK, CHUNK * 8, lanes, mixed=True)

    @jax.jit
    def f_scan(x, y):
        return scan_call(x, y)

    pref = f_scan(Xc, Yc)
    timeit("local scan kernel (mixed)", f_scan, Xc, Yc)

    @jax.jit
    def f_localscan_offsets(x, y):
        return mv._local_scan((x, y), n, chained=True)

    timeit("local scan + offsets", f_localscan_offsets, Xc, Yc)

    # --- prefix_at (scan + gathers + one padd) ------------------------------
    tails = jnp.asarray(rng.integers(0, n, size=V, dtype=np.int32))

    @jax.jit
    def f_prefix_at(x, y, t):
        return mv._prefix_at((x, y), n, t, chained=True)

    T = f_prefix_at(Xc, Yc, tails)
    timeit("prefix_at (V gathers)", f_prefix_at, Xc, Yc, tails)

    # --- bucket reduce -------------------------------------------------------
    T3 = mv._with_ones_z(T, V)

    @jax.jit
    def f_reduce(a, b, z):
        return mv._chained_reduce((a, b, z), V)

    f_reduce(*T3)
    timeit("bucket reduce (64K)", f_reduce, *T3)

    # --- full window / full MSM ----------------------------------------------
    s_np = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    s_np[:, 15] &= 0x2FFF
    scalars = jnp.asarray(s_np)
    t0 = time.perf_counter()
    fence(mv._msm_window_partials(PX, PY, scalars, c))
    log(f"full msm compile+run: {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    fence(mv._msm_window_partials(PX, PY, scalars, c))
    full = (time.perf_counter() - t0) * 1e3
    log(f"{'full msm (16 windows)':<28} {full:8.2f} ms   ({full/16:.2f} ms/window)")


if __name__ == "__main__":
    main()
