"""Probe: Mosaic transpose kernel vs XLA transpose for [n,32]->[32,n] u32."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from halo2_tpu.utils import enable_compilation_cache
from halo2_tpu.field import vec as fv


def fence(x):
    np.asarray(x[(0,) * (x.ndim - 1)][:1])


def main():
    enable_compilation_cache()
    n = 1 << 20
    x = jnp.asarray(np.random.default_rng(0).integers(0, 2**32, (n, 32), dtype=np.uint32))

    f_xla = jax.jit(lambda a: jnp.transpose(a, (1, 0)))
    f_pal = jax.jit(fv.transpose_u32)

    # correctness
    want = np.asarray(f_xla(x))
    try:
        got = np.asarray(f_pal(x))
    except Exception as e:
        print("pallas transpose FAILED to compile/run:", repr(e)[:500])
        return 1
    print("correct:", np.array_equal(got, want), flush=True)

    # fresh inputs per rep (identical dispatches can short-circuit in the relay)
    variants = [x + np.uint32(i) for i in range(5)]
    for v in variants:
        fence(v)
    for name, f in (("xla", f_xla), ("pallas", f_pal)):
        fence(f(x))
        t0 = time.perf_counter()
        out = None
        for v in variants:
            out = f(v)
        fence(out)
        ms = (time.perf_counter() - t0) / 5 * 1e3
        print(f"{name}: {ms:.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
