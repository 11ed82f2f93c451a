"""On-chip validation of the row-major packed MSM pipeline (small shapes).

Checks msm_vec (packed sort payload + _rank_scan_rows_call) against the
closed form sum((i+1)*s_i) * G over the real [i+1]G point table, at the
smallest fast-path size (n = 2^15, nblocks = 1) and one multi-block size
(n = 2^16, GLV doubles both).  Compile cost is the small-shape one, not the
2^20 program.
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

import numpy as np


def log(m):
    print(m, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from halo2_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if jax.default_backend() != "tpu":
        log("SKIP: no TPU backend")
        return 0

    from halo2_tpu.ec import host as ec_host
    from halo2_tpu.ec.msm_vec import msm_vec
    from halo2_tpu.field.bn254 import FR_MOD
    from halo2_tpu.field.limbs import ints_to_limbs
    from halo2_tpu.utils import device_put_chunked

    d = np.load(
        os.path.join(
            os.path.dirname(__file__), "..", ".bench_cache", "msm_points_k16.npz"
        )
    )
    px, py = d["px"], d["py"]

    ok = True
    for k, glv in ((15, False), (15, True), (16, True)):
        n = 1 << k
        PX = device_put_chunked(px[:n])
        PY = device_put_chunked(py[:n])
        rng = np.random.default_rng(17 + k)
        scalars = [int(x) % FR_MOD for x in rng.integers(0, 1 << 63, size=n)]
        # full-width scalars stress every window
        scalars = [
            (s * 0x123456789ABCDEF1122334455667788 + i) % FR_MOD
            for i, s in enumerate(scalars)
        ]
        S = jnp.asarray(ints_to_limbs(scalars))
        t0 = time.time()
        got = msm_vec(PX, PY, S, c=16, glv=glv)
        want = ec_host.g1_mul(
            ec_host.G1, sum((i + 1) * s for i, s in enumerate(scalars)) % FR_MOD
        )
        good = got == want
        ok &= good
        log(
            f"msm rows 2^{k} glv={glv}: {'OK' if good else 'FAIL'} "
            f"({time.time()-t0:.0f}s)"
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
