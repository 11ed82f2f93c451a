"""Per-stage MSM profile on the real chip (one window of the 2^20 MSM).

Times each pipeline piece in isolation (chained reps, device-side-slice
readback fence): payload sort, rank-major scan kernel, offsets recursion,
prefix_at tail, bucket butterfly-reduce, and the full fused window set.
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


def timeit(name, fn, variants, reps=3):
    fence(fn(variants[0]))
    t0 = time.perf_counter()
    out = None
    for i in range(reps):
        out = fn(variants[i % len(variants)])
    fence(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    log(f"{name:<34} {ms:8.2f} ms")
    return ms


def main():
    enable_compilation_cache()
    from halo2_tpu.ec import msm_vec as mv
    from halo2_tpu.ec import g1_vec as gv

    import os
    k = int(os.environ.get("PROF_K", "20"))
    n = 1 << k
    c = 16
    V = 1 << c
    CHUNK = gv.SCAN_CHUNK

    from halo2_tpu.utils import device_put_chunked

    d = np.load(".bench_cache/msm_points_k16.npz")
    px, py = d["px"], d["py"]
    t0 = time.perf_counter()
    PX = device_put_chunked(px[: min(n, px.shape[0])])
    PY = device_put_chunked(py[: min(n, py.shape[0])])
    if n > px.shape[0]:
        # tile ON DEVICE: uploading 128 MB through the relay can take
        # tens of minutes on a session's first large transfer
        reps = n // px.shape[0]
        tile = jax.jit(lambda a: jnp.tile(a, (reps, 1)))
        PX, PY = tile(PX), tile(PY)
    PXY = jnp.concatenate([PX, PY], axis=1)
    fence(PXY)
    log(f"points ready {time.perf_counter()-t0:.1f}s")

    rng = np.random.default_rng(3)
    dcols = [
        jnp.asarray(np.random.default_rng(i).integers(0, V, n).astype(np.uint16))
        for i in range(3)
    ]
    for v in dcols:
        fence(v)

    # NOTE: the 128 MB point array must be a jit ARGUMENT — closed-over
    # device arrays embed as HLO constants and the remote compiler rejects
    # (or hangs on) >100 MB programs through the relay.
    @jax.jit
    def f_sort_arg(dv, pxy):
        pcols = tuple(pxy[:, i] for i in range(32))
        return jax.lax.sort(
            (dv,) + pcols, num_keys=1, is_stable=False, dimension=0
        )

    f_sort = lambda dv: f_sort_arg(dv, PXY)
    sorted_ops = f_sort(dcols[0])
    timeit("payload sort (33 ops)", f_sort, dcols)

    sorts = [f_sort(v) for v in dcols]
    for v in sorts:
        fence(v)

    @jax.jit
    def f_scan(*ops):
        pref, offs, _, _ = mv._rank_local_scan(ops[1:17], ops[17:33], n, nodbl=True)
        return pref

    timeit("rank scan + offsets", lambda s: f_scan(*s), sorts)

    tails = jnp.asarray(rng.integers(0, n, size=V, dtype=np.int32))

    @jax.jit
    def f_prefix_at(*ops):
        return mv._rank_prefix_at(ops[1:17], ops[17:33], n, tails, nodbl=True)[0]

    T3 = f_prefix_at(*sorted_ops)
    timeit("prefix_at (V gathers)", lambda s: f_prefix_at(*s), sorts)

    @jax.jit
    def f_reduce(a, b, z):
        return mv._rank_reduce((a, b, z), V)

    Ts = [f_prefix_at(*s) for s in sorts]
    for v in Ts:
        fence(v)
    timeit("bucket reduce (64K)", lambda t: f_reduce(*t), Ts)

    if os.environ.get("PROF_FULL"):
        s_np = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
        s_np[:, 15] &= 0x2FFF
        scalars = jnp.asarray(s_np)
        t0 = time.perf_counter()
        fence(mv._msm_window_partials(PX, PY, scalars, c))
        log(f"full msm compile+run: {time.perf_counter()-t0:.1f} s")


if __name__ == "__main__":
    main()
