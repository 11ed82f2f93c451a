"""On-chip validation of the TPU-only kernel paths.

The pytest suite runs on the 8-virtual-device CPU mesh (tests/conftest.py),
where the Pallas kernels dispatch to their portable jnp fallbacks; this
script exercises the REAL kernel lowerings on the TPU and checks them
against independent ground truth.  Run (takes ~10 min, mostly compiles):

    python scripts/tpu_checks.py
"""

import sys

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import time

import numpy as np


def log(msg):
    print(msg, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        log("SKIP: no TPU backend")
        return 0

    from halo2_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    ok = True

    # ---- vec field kernels vs python bigints --------------------------------
    from halo2_tpu.field import FR, vec
    from halo2_tpu.field.bn254 import FR_MOD, FR_ROOT_OF_UNITY, FR_S
    from halo2_tpu.field.limbs import ints_to_mont_limbs, mont_limbs_to_ints

    rng = np.random.default_rng(1)
    av = [int(x) for x in rng.integers(0, 2**63, size=2048)]
    bv = [int(x) for x in rng.integers(0, 2**63, size=2048)]
    A = vec.to_vec(jnp.asarray(ints_to_mont_limbs(av, FR_MOD)))
    B = vec.to_vec(jnp.asarray(ints_to_mont_limbs(bv, FR_MOD)))
    got = mont_limbs_to_ints(np.asarray(vec.from_vec(vec.vmul(FR, A, B), 2048)), FR_MOD)
    good = got == [(a * b) % FR_MOD for a, b in zip(av, bv)]
    log(f"vec.vmul kernel: {'OK' if good else 'FAIL'}")
    ok &= good

    # ---- fused NTT vs the portable oracle ------------------------------------
    from halo2_tpu.poly.ntt import ntt as ntt_ref
    from halo2_tpu.poly.ntt_pallas import _ntt_jit

    k = 16
    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_S - k), FR_MOD)
    a = jnp.asarray(
        ints_to_mont_limbs(
            [int(x) for x in rng.integers(0, 2**63, size=1 << k)], FR_MOD
        )
    )
    got = np.asarray(_ntt_jit(a, k, omega, False))
    want = np.asarray(ntt_ref(a, k, omega))
    good = np.array_equal(got, want)
    log(f"fused NTT 2^{k} bit-identical: {'OK' if good else 'FAIL'}")
    ok &= good
    back = np.asarray(_ntt_jit(jnp.asarray(got), k, omega, True))
    good = np.array_equal(back, np.asarray(a))
    log(f"fused iNTT roundtrip: {'OK' if good else 'FAIL'}")
    ok &= good

    # ---- production MSM vs the closed form on [i+1]G -------------------------
    from halo2_tpu.ec import host
    from halo2_tpu.ec.msm_vec import msm_vec
    from halo2_tpu.field.limbs import ints_to_limbs

    import os

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_cache", "msm_points_k20.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        n = 1 << 16
        PX, PY = jnp.asarray(d["px"][:n]), jnp.asarray(d["py"][:n])
        scalars = [int(x) for x in rng.integers(0, 2**63, size=n)]
        scalars[0] = 0
        scalars[1] = scalars[2]  # repeated points exercise the double branch
        S = jnp.asarray(ints_to_limbs(scalars))
        t0 = time.time()
        got_pt = msm_vec(PX, PY, S, c=16, glv=False)
        total = sum((i + 1) * s for i, s in enumerate(scalars)) % FR_MOD
        want_pt = host.g1_mul(host.G1, total)
        good = got_pt == want_pt
        log(f"msm_vec 2^16 vs closed form ({time.time()-t0:.0f}s): "
            f"{'OK' if good else 'FAIL'}")
        ok &= good

        # ---- GLV endomorphism path (halved window count) ---------------------
        t0 = time.time()
        got_pt = msm_vec(PX, PY, S, c=16, glv=True)
        good = got_pt == want_pt
        log(f"msm_vec 2^16 GLV vs closed form ({time.time()-t0:.0f}s): "
            f"{'OK' if good else 'FAIL'}")
        ok &= good

        # ---- sharded production MSM on a 1-device mesh ------------------------
        import jax as _jax
        from halo2_tpu.dist import make_mesh, msm_sharded_vec
        from halo2_tpu.dist.mesh import row_sharding

        mesh1 = make_mesh(1)
        sh = row_sharding(mesh1)
        t0 = time.time()
        got_pt = msm_sharded_vec(
            _jax.device_put(PX, sh), _jax.device_put(PY, sh),
            _jax.device_put(S, sh), mesh1, c=16,
        )
        good = got_pt == want_pt
        log(f"msm_sharded_vec 2^16 (1-chip mesh) ({time.time()-t0:.0f}s): "
            f"{'OK' if good else 'FAIL'}")
        ok &= good
    else:
        log("msm_vec check skipped (no .bench_cache points; run bench.py once)")

    log("ALL OK" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
