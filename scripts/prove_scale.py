"""k=20-class single-chip proof with per-phase timings (SURVEY.md §7.3 #6).

Proves a 2^(k-1)-entry range-check (lookup) circuit over a 2^k-row domain —
the "long context" analog of the framework (SURVEY.md §5): every polynomial
phase (NTTs at 2^k, quotient over the 2^(k+2) extended coset, 2^k-point
commitment MSMs) runs at the north-star scale on one chip.

Usage:  PROVE_K=20 python scripts/prove_scale.py
Emits one JSON line {"k":..., "phases": {...}, "prove_s":..., "ok": true}
on stdout; per-phase report on stderr.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from halo2_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from halo2_tpu.circuits import rangecheck
from halo2_tpu.commit import ParamsKZG
from halo2_tpu.plonk import create_proof, keygen, verify_proof
from halo2_tpu.utils.profiling import format_phase_report, phase_report


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    k = int(os.environ.get("PROVE_K", "20"))
    bits = k - 1
    # the simple floor planner stacks regions: 2^bits table rows + count
    # value rows must fit under usable_row (n - blinding - 1)
    count = max(1, (1 << k) - (1 << bits) - 16)
    rng = np.random.default_rng(0x5CA1E)
    values = rng.integers(0, 1 << bits, size=count).tolist()

    import jax

    log(f"backend: {jax.default_backend()}, k={k}, bits={bits}, count={count}")

    t0 = time.perf_counter()
    params = ParamsKZG.setup(k, seed=b"prove-scale")
    setup_s = time.perf_counter() - t0
    log(f"setup(k={k}): {setup_s:.1f}s")

    t0 = time.perf_counter()
    pk = keygen(params, rangecheck.empty_circuit(bits=bits, count=count))
    keygen_s = time.perf_counter() - t0
    log(f"keygen: {keygen_s:.1f}s")
    log(format_phase_report())  # keygen-internal breakdown (round-4 ask)

    phase_report(clear=True)  # reset so the prove report is prove-only
    circuit = rangecheck.create_circuit(values, bits=bits)
    t0 = time.perf_counter()
    proof = create_proof(params, pk, circuit, [], scheme="shplonk",
                         rng_seed=b"prove-scale")
    prove_s = time.perf_counter() - t0
    rep = phase_report(clear=True)
    log(format_phase_report(rep))
    log(f"prove: {prove_s:.1f}s, proof {len(proof)} bytes")

    t0 = time.perf_counter()
    ok = verify_proof(params, pk.vk, proof, [], scheme="shplonk")
    verify_s = time.perf_counter() - t0
    log(f"verify: {verify_s:.1f}s -> {ok}")

    print(
        json.dumps(
            {
                "k": k,
                "setup_s": round(setup_s, 2),
                "keygen_s": round(keygen_s, 2),
                "prove_s": round(prove_s, 2),
                "verify_s": round(verify_s, 2),
                "proof_bytes": len(proof),
                "phases": {n: round(s, 3) for n, s in rep},
                "ok": bool(ok),
            }
        ),
        flush=True,
    )
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
