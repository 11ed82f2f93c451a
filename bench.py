"""Round benchmark: the two north-star kernels (BASELINE.md targets).

Times, on the default JAX backend (the real TPU chip under the driver):
  * NTT of a 2^22-coefficient BN254-Fr polynomial — fused Pallas path
    (poly/ntt_pallas.py), bit-identical to halo2's `best_fft` values
  * Pippenger MSM over 2^20 G1 points — vec-layout prefix-scan formulation
    with the GLV endomorphism split (ec/msm_vec.py)

Timing is chained / device-resident so per-dispatch relay overhead (~25 ms
through the axon tunnel) does not pollute the kernel time.

Robustness contract with the driver (a hard wall-clock timeout kills the
process): a FULL result JSON line is printed and flushed after EVERY
completed stage, so a timeout at any point still leaves the latest complete
line on stdout.  `BENCH_BUDGET_S` (default 1500 s) is a soft budget the
script respects by shrinking reps and skipping optional stages.

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
BASELINE_NTT_MS = 300.0  # documented assumption, see module docstring
BASELINE_MSM_MS = 400.0

K_NTT = int(os.environ.get("BENCH_K_NTT", "22"))
K_MSM = int(os.environ.get("BENCH_K_MSM", "20"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
_T_START = time.perf_counter()


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def remaining_s() -> float:
    return BUDGET_S - (time.perf_counter() - _T_START)


_detail = {
    "baseline_cpu_ms_assumed": {"ntt": BASELINE_NTT_MS, "msm": BASELINE_MSM_MS},
    # methodology (round-3 advisor ask): reps are dispatched back-to-back and
    # fenced once, so per-dispatch relay latency amortizes exactly as the
    # prover's batched commitment MSMs do; NOT comparable to r01/r02's
    # min-of-individually-fenced-reps numbers.
    "timing": "chained_avg",
}


def emit():
    """Print the full result JSON for everything measured so far (the last
    such line on stdout is the round's record; emitting after every stage
    makes a driver timeout lose at most the in-flight stage)."""
    ntt = _detail.get("ntt_ms")
    msm = _detail.get("msm_ms")
    if ntt is not None and msm is not None:
        metric, value = f"msm_2^{K_MSM}_plus_ntt_2^{K_NTT}", ntt + msm
        base = BASELINE_NTT_MS + BASELINE_MSM_MS
    elif ntt is not None:
        metric, value, base = f"ntt_2^{K_NTT}", ntt, BASELINE_NTT_MS
    elif msm is not None:
        metric, value, base = f"msm_2^{K_MSM}", msm, BASELINE_MSM_MS
    else:
        return
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 2),
                "unit": "ms",
                "vs_baseline": round(base / value, 3),
                "detail": _detail,
            }
        ),
        flush=True,
    )


def _rand_limbs_device(seed: int, n: int):
    """[n, 16] random 16-bit-limb field elements generated ON DEVICE (the
    round-2 bench lost 536 s uploading this array through the relay).  Top
    limb masked so the value is < p (both moduli have top limb >= 0x3064)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        bits = jax.random.bits(key, (n, 16), dtype=jnp.uint32) & 0xFFFF
        mask = jnp.full((16,), 0xFFFF, jnp.uint32).at[15].set(0x2FFF)
        return bits & mask[None, :]

    return gen(jax.random.PRNGKey(seed))


def bench_ntt(k: int) -> float:
    import jax
    import jax.numpy as jnp

    from halo2_tpu.field.bn254 import FR_MOD, FR_ROOT_OF_UNITY, FR_S
    from halo2_tpu.poly.ntt_pallas import _ntt_jit
    from halo2_tpu.utils.profiling import ntt_roofline

    n = 1 << k
    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_S - k), FR_MOD)
    t0 = time.perf_counter()
    a = _rand_limbs_device(1, n)
    np.asarray(a[:1])  # completion fence
    log(f"ntt 2^{k}: on-device input gen {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    np.asarray(_ntt_jit(a, k, omega, False)[:1])  # readback forces completion
    log(f"ntt 2^{k}: compile+first run {time.perf_counter()-t0:.2f}s")
    # NOTE: block_until_ready is unreliable through the axon relay (returns
    # early); a 1-row readback is the completion fence.  Chaining amortizes
    # the ~30 ms per-readback relay round trip.
    reps = REPS if remaining_s() > 120 else max(1, REPS // 2)
    t0 = time.perf_counter()
    r = a
    for _ in range(reps):
        r = _ntt_jit(r, k, omega, False)
    np.asarray(r[:1])
    ms = (time.perf_counter() - t0) / reps * 1e3
    log(f"ntt 2^{k}: {ms:.2f} ms (chained avg of {reps}, readback-fenced)")
    rl = ntt_roofline(k)
    _detail["ntt_roofline_pct"] = round(
        100.0 * max(rl["compute_floor_ms"], rl["hbm_floor_ms"]) / ms, 1
    )
    return ms


def _msm_points(k: int):
    """2^k G1 points, device-resident [n,16] Mont-Fq coords.

    Real points [i+1]G are generated once for k<=16 and cached to disk; for
    larger k the 2^16 table is TILED — the MSM kernel's work is independent
    of point values (fixed sort+scan volume), so tiling changes nothing
    about the timing while cutting point generation ~16x."""
    import jax.numpy as jnp

    from halo2_tpu.utils import device_put_chunked

    kb = min(k, 16)
    path = os.path.join(CACHE_DIR, f"msm_points_k{kb}.npz")
    if os.path.exists(path):
        d = np.load(path)
        px, py = d["px"], d["py"]
    else:
        import jax

        from halo2_tpu.commit import srs as srs_mod
        from halo2_tpu.ec import jax_g1 as g1
        from halo2_tpu.field.limbs import ints_to_limbs

        nb = 1 << kb
        tx, ty = srs_mod._gen_table_device()
        log(f"generating 2^{kb} G1 points on device (vec kernels) ...")
        chunks_x, chunks_y = [], []
        chunk = 1 << min(kb, 16)
        t0 = time.perf_counter()
        for lo in range(0, nb, chunk):
            scalars = ints_to_limbs(range(lo + 1, lo + chunk + 1))
            X, Y, Z = srs_mod._fixed_base_mul_batch_vec(tx, ty, jnp.asarray(scalars))
            m = chunk
            P = tuple(jnp.transpose(a.reshape(16, m), (1, 0)) for a in (X, Y, Z))
            ax, ay, _ = g1.to_affine_batch(P)
            chunks_x.append(np.asarray(ax))
            chunks_y.append(np.asarray(ay))
            log(f"  {lo + chunk}/{nb} ({time.perf_counter()-t0:.0f}s)")
        px = np.concatenate(chunks_x)
        py = np.concatenate(chunks_y)
        os.makedirs(CACHE_DIR, exist_ok=True)
        np.savez(path, px=px, py=py)
    import jax

    PX = device_put_chunked(px)
    PY = device_put_chunked(py)
    if k > kb:
        # tile ON DEVICE (uploading the tiled 2^k copies through the relay
        # wastes budget; the kernel's work is value-independent)
        reps = 1 << (k - kb)
        tile = jax.jit(lambda a: jnp.tile(a, (reps, 1)), static_argnums=())
        PX, PY = tile(PX), tile(PY)
    return PX, PY


def bench_msm(k: int) -> float:
    import jax
    import jax.numpy as jnp

    from halo2_tpu.ec.msm_vec import (
        _msm_window_partials,
        _msm_window_partials_glv,
    )
    from halo2_tpu.utils import device_put_chunked
    from halo2_tpu.utils.profiling import msm_roofline

    n = 1 << k
    t0 = time.perf_counter()
    PX, PY = _msm_points(k)
    log(f"msm 2^{k}: points ready {time.perf_counter()-t0:.2f}s")

    # c=16 = the global-sort pipeline, the production default since round 5:
    # within noise of the tiled c=13 path's speed, ~4x cheaper cold trace —
    # the tiled path never produced a driver-captured number (BENCH_r04
    # rc=124; its trace alone was ~15 min on this host)
    c = int(os.environ.get("BENCH_MSM_C", "0")) or (16 if n >= (1 << 16) else 8)
    glv = os.environ.get("BENCH_MSM_GLV", "1") != "0"
    partials = _msm_window_partials_glv if glv else _msm_window_partials
    scalars = _rand_limbs_device(2, n)
    np.asarray(scalars[:1])
    t0 = time.perf_counter()
    np.asarray(partials(PX, PY, scalars, c)[0])
    log(f"msm 2^{k} (glv={glv}): compile+first run {time.perf_counter()-t0:.2f}s")
    reps = REPS if remaining_s() > 60 * REPS else max(1, int(remaining_s() // 90))
    # fresh scalars per rep (the relay can short-circuit identical
    # dispatches), generated on device and FENCED before the timed region:
    # the prover's scalars are device-resident, so scalar generation is not
    # part of the MSM.  All reps are DISPATCHED asynchronously and fenced
    # once — the ~30-80 ms relay round trip amortizes over the batch the
    # same way the prover's back-to-back commitment MSMs do.
    scs = [_rand_limbs_device(100 + i, n) for i in range(reps)]
    for sc in scs:
        np.asarray(sc[:1])
    t0 = time.perf_counter()
    outs = [partials(PX, PY, sc, c)[0] for sc in scs]
    for o in outs:
        np.asarray(o)
    ms = (time.perf_counter() - t0) / reps * 1e3
    log(f"msm 2^{k}: {ms:.2f} ms (chained avg of {reps}, fresh device-resident scalars)")
    rl = msm_roofline(k, c)
    _detail["msm_roofline_pct"] = round(
        100.0 * max(rl["compute_floor_ms"], rl["sort_gather_floor_ms"]) / ms, 1
    )
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
    log(f"budget: {BUDGET_S:.0f}s")
    # MSM runs FIRST (round-4 verdict: three rounds of budget exhaustion in
    # a row left msm_ms uncaptured; NTT's kernels compile in ~90 s warm or
    # cold, MSM's are the expensive ones — give them the fresh budget)
    ops = os.environ.get("BENCH_OPS", "msm,ntt").split(",")
    for op in ops:
        if op == "msm":
            if remaining_s() > 60:
                try:
                    _detail["msm_ms"] = round(bench_msm(K_MSM), 2)
                except Exception as e:  # a failed stage must not lose others
                    log(f"msm stage failed: {e!r}")
                emit()
            else:
                log("budget exhausted before msm stage")
        elif op == "ntt":
            if remaining_s() > 60:
                try:
                    _detail["ntt_ms"] = round(bench_ntt(K_NTT), 2)
                except Exception as e:
                    log(f"ntt stage failed: {e!r}")
                emit()
            else:
                log("budget exhausted before ntt stage")
    if os.environ.get("BENCH_PROVE") and remaining_s() > 120:
        _detail["prove"] = bench_prove()
        emit()


if __name__ == "__main__":
    main()
