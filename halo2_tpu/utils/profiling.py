"""Tracing / profiling subsystem (SURVEY.md §5 — the reference has none).

Three pieces:
  * `phase(name)` — context manager recording wall-clock per prover phase
    into a thread-local log; `phase_report()` returns/clears it.  The prover
    wraps its transcript phases with these so a prove call can be broken
    down without external tooling.
  * `trace(path)` — wraps `jax.profiler.trace` for on-device kernel traces
    (viewable in TensorBoard / Perfetto).
  * roofline helpers — analytic op/byte counts for the two headline kernels
    so measured ms can be compared against hardware limits (BASELINE.md
    "report ms/op + roofline").
"""

from __future__ import annotations

import contextlib
import threading
import time

_tls = threading.local()


def _log():
    if not hasattr(_tls, "phases"):
        _tls.phases = []
    return _tls.phases


@contextlib.contextmanager
def phase(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _log().append((name, time.perf_counter() - t0))


def phase_report(clear: bool = True) -> list[tuple[str, float]]:
    out = list(_log())
    if clear:
        _tls.phases = []
    return out


def format_phase_report(rep=None) -> str:
    rep = phase_report(clear=False) if rep is None else rep
    total = sum(t for _, t in rep) or 1e-9
    lines = [f"{'phase':<28} {'seconds':>9}  share"]
    for name, t in rep:
        lines.append(f"{name:<28} {t:9.3f}  {100*t/total:4.1f}%")
    lines.append(f"{'TOTAL':<28} {total:9.3f}")
    return "\n".join(lines)


class PhaseTimer:
    """Mark-based phase timing: timer.mark('advice') records the time since
    the previous mark under that name (into the shared phase log)."""

    def __init__(self):
        self._t = time.perf_counter()

    def mark(self, name: str) -> None:
        now = time.perf_counter()
        _log().append((name, now - self._t))
        self._t = now


@contextlib.contextmanager
def trace(path: str = "/tmp/halo2_tpu_trace"):
    """On-device profiler trace (jax.profiler); view with TensorBoard."""
    import jax

    with jax.profiler.trace(path):
        yield


# ---------------------------------------------------------------------------
# rooflines (analytic)
# ---------------------------------------------------------------------------

# measured VPU uint32 multiply throughput on TPU v5e (see field/vec.py bench
# notes): ~2.2e12 mul/s with ~5 auxiliary lane-ops per multiply
V5E_U32_MUL_PER_S = 2.2e12
V5E_HBM_BYTES_PER_S = 8.1e11


def ntt_roofline(k: int) -> dict:
    """Analytic cost of a 2^k NTT in the 16x16-bit-limb formulation."""
    n = 1 << k
    field_muls = (n // 2) * k  # butterflies
    u32_muls = field_muls * 256  # comba 16x16 + redc 16x16
    bytes_moved = 4 * n * 64  # ~2 read+write passes of [n,16] u32
    return {
        "field_muls": field_muls,
        "u32_muls": u32_muls,
        "compute_floor_ms": u32_muls / V5E_U32_MUL_PER_S * 1e3 * 5,
        "hbm_floor_ms": bytes_moved / V5E_HBM_BYTES_PER_S * 1e3,
    }


def msm_roofline(k: int, c: int = 13, glv: bool = True) -> dict:
    """Analytic cost of a 2^k-point MSM (ec/msm_vec.py).

    c <= 13 models the TILED grouping pipeline (per-tile in-VMEM bitonic
    sort + per-tile bucket tails): grouping moves the 17 u32 planes through
    HBM ONCE (in + out) instead of the global XLA sort's ~log2(n) network
    round trips, at the cost of ntiles*2^c tail extractions per window.
    c > 13 models the legacy global-sort path."""
    n = 1 << k
    npts = 2 * n if glv else n  # GLV doubles the stream, halves windows
    windows = ((128 if glv else 256) + c - 1) // c
    V = 1 << c
    if c <= 13:
        tile = min(1 << 18, npts)
        ntiles = npts // tile
        K = ntiles * V
        # per window: npts doubling-free mixed adds (11 mul/sqr) in the
        # rank scan + ~3*K full adds (16 mul/sqr) for the tail gather padd,
        # cross-tile/bucket reduction and t_max fold
        field_muls = windows * (npts * 11 + 3 * K * 16)
        # tile sort: one read of key+payload, one write of payload
        sort_bytes = windows * npts * (17 + 16) * 4
    else:
        field_muls = windows * (npts * 11 + 2 * V * 16)
        # global sort: 17 packed u32 operands, ~log2(npts) data passes
        sort_bytes = windows * npts * 17 * 4 * (k + 1)
    u32_muls = field_muls * 512  # comba 16x16 + redc 16x16 MACs
    # scan: one read of the packed planes + one write of 24 prefix planes
    scan_bytes = windows * npts * (16 + 24) * 4 * 2
    return {
        "field_muls": field_muls,
        "compute_floor_ms": u32_muls / V5E_U32_MUL_PER_S * 1e3,
        "sort_gather_floor_ms": (sort_bytes + scan_bytes)
        / V5E_HBM_BYTES_PER_S
        * 1e3,
    }
