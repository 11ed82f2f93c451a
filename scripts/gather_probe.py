"""Probe achievable row-gather throughput for the MSM point fetch.

Variants: u16 [n,64] rows (current), u32 [n,32], u8 [n,128], random vs
consecutive indices (isolates randomness cost from gather-op overhead),
and a lax.sort carrying the payload for comparison.
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
    log(f"{name:<38} {ms:8.2f} ms")
    return ms


def main():
    enable_compilation_cache()
    n = 1 << 20
    rng = np.random.default_rng(0)
    base = rng.integers(0, 2**16, size=(n, 64), dtype=np.uint16)
    P16 = jnp.asarray(base)
    P32 = jax.lax.bitcast_convert_type(P16.reshape(n, 32, 2), jnp.uint32)
    P8 = jax.lax.bitcast_convert_type(P16, jnp.uint8).reshape(n, 128)

    idx_rand = [
        jnp.asarray(np.random.default_rng(i).permutation(n).astype(np.int32))
        for i in range(3)
    ]
    idx_seq = [jnp.asarray((np.arange(n, dtype=np.int32) + i) % n) for i in range(3)]
    for v in idx_rand + idx_seq:
        fence(v)

    f16 = jax.jit(lambda i: jnp.take(P16, i, axis=0))
    f32 = jax.jit(lambda i: jnp.take(P32, i, axis=0))
    f8 = jax.jit(lambda i: jnp.take(P8, i, axis=0))

    timeit("take u16[n,64] random", f16, idx_rand)
    timeit("take u16[n,64] consecutive", f16, idx_seq)
    timeit("take u32[n,32] random", f32, idx_rand)
    timeit("take u8[n,128] random", f8, idx_rand)

    # sort carrying the payload (u16 key + 8 x u64-ish payload columns)
    keys = [
        jnp.asarray(np.random.default_rng(i).integers(0, 2**16, n, dtype=np.uint16).astype(np.uint16))
        for i in range(3)
    ]
    for v in keys:
        fence(v)
    P32cols = tuple(P32[:, i] for i in range(32))  # 32 u32 [n] operands

    f_sortpay = jax.jit(
        lambda kk: jax.lax.sort((kk,) + P32cols, num_keys=1, dimension=0)[1]
    )
    timeit("sort key + 128B payload", f_sortpay, keys)


if __name__ == "__main__":
    main()
