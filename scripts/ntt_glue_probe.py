"""Probe Mosaic lowerings needed to fuse the NTT inter-level glue into the
pass kernels:

  A. static bit-reverse row permutation inside a kernel
     (jnp.take with a constant index vector over the sublane axis)
  B. in-kernel [R, 128] -> [128, R] transpose written to a transposed
     output block (out_specs over the M2 axis)
  C. the two combined (permute rows, butterfly-free, transpose out)

Each is checked for correctness on tiny shapes, then timed at the k=22
level-1 geometry ([16, 256, 16384] u32, 268 MB) against the XLA take +
transpose it would replace.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from halo2_tpu.utils import enable_compilation_cache
from halo2_tpu.poly.ntt import _bitrev_perm

L = 16
R = 256
LANES = 128


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
    print(f"{name:<40} {ms:8.2f} ms", flush=True)
    return ms


def main():
    enable_compilation_cache()
    rev = np.asarray(_bitrev_perm(8), dtype=np.int32)  # 256-entry bitrev

    M2 = 16384
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**32, (L, R, M2), dtype=np.uint32))
    xs = [x + np.uint32(i) for i in range(3)]
    for v in xs:
        fence(v)

    # --- A: static row permutation in-kernel --------------------------------
    def k_perm(x_ref, o_ref):
        v = x_ref[...]
        o_ref[...] = jnp.take(v, jnp.asarray(rev), axis=1)

    f_perm = pl.pallas_call(
        k_perm,
        out_shape=jax.ShapeDtypeStruct((L, R, M2), jnp.uint32),
        grid=(M2 // LANES,),
        in_specs=[
            pl.BlockSpec((L, R, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (L, R, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
    )
    try:
        got = f_perm(xs[0])
        want = jnp.take(xs[0], jnp.asarray(rev), axis=1)
        ok = np.array_equal(np.asarray(got[:, :, :256]), np.asarray(want[:, :, :256]))
        print(f"A in-kernel static row take: {'OK' if ok else 'WRONG'}", flush=True)
        if ok:
            timeit("A kernel (perm only)", jax.jit(f_perm), xs)
    except Exception as e:
        print("A FAILED:", repr(e)[:400], flush=True)

    # --- B: in-kernel transpose to transposed out block ----------------------
    def k_tr(x_ref, o_ref):
        v = x_ref[...]  # [L, R, 128]
        o_ref[...] = jnp.transpose(v, (0, 2, 1))  # [L, 128, R]

    f_tr = pl.pallas_call(
        k_tr,
        out_shape=jax.ShapeDtypeStruct((L, M2, R), jnp.uint32),
        grid=(M2 // LANES,),
        in_specs=[
            pl.BlockSpec((L, R, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (L, LANES, R), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
    )
    try:
        got = f_tr(xs[0])
        want = jnp.transpose(xs[0], (0, 2, 1))
        ok = np.array_equal(np.asarray(got[:, :256]), np.asarray(want[:, :256]))
        print(f"B in-kernel transpose-out: {'OK' if ok else 'WRONG'}", flush=True)
        if ok:
            timeit("B kernel (transpose only)", jax.jit(f_tr), xs)
    except Exception as e:
        print("B FAILED:", repr(e)[:400], flush=True)

    # --- C: both (perm rows then transpose) ----------------------------------
    def k_both(x_ref, o_ref):
        v = x_ref[...]
        v = jnp.take(v, jnp.asarray(rev), axis=1)
        o_ref[...] = jnp.transpose(v, (0, 2, 1))

    f_both = pl.pallas_call(
        k_both,
        out_shape=jax.ShapeDtypeStruct((L, M2, R), jnp.uint32),
        grid=(M2 // LANES,),
        in_specs=[
            pl.BlockSpec((L, R, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (L, LANES, R), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
    )
    try:
        got = f_both(xs[0])
        want = jnp.transpose(
            jnp.take(xs[0], jnp.asarray(rev), axis=1), (0, 2, 1)
        )
        ok = np.array_equal(np.asarray(got[:, :256]), np.asarray(want[:, :256]))
        print(f"C in-kernel perm+transpose: {'OK' if ok else 'WRONG'}", flush=True)
        if ok:
            timeit("C kernel (perm+transpose)", jax.jit(f_both), xs)
    except Exception as e:
        print("C FAILED:", repr(e)[:400], flush=True)

    # --- XLA reference ops ----------------------------------------------------
    f_take = jax.jit(lambda a: jnp.take(a, jnp.asarray(rev), axis=1))
    timeit("XLA bit-reverse take", f_take, xs)
    f_xt = jax.jit(lambda a: jnp.transpose(a, (0, 2, 1)))
    timeit("XLA (R,M2) transpose", f_xt, xs)
    f_xboth = jax.jit(
        lambda a: jnp.transpose(jnp.take(a, jnp.asarray(rev), axis=1), (0, 2, 1))
    )
    timeit("XLA take+transpose fused", f_xboth, xs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
