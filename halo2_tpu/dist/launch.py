"""Multi-host launch (SURVEY.md §2.3 'Device mesh & launcher').

One controller process per host over DCN; chips within a slice communicate
over ICI.  `init_multihost` wraps `jax.distributed.initialize` with the
framework's defaults, and `global_mesh` builds the 1-D data mesh over every
chip in the job (dist/mesh.py's single `shard` axis — the domain/point axis
of the proving workload).

Typical launch (per host):

    HALO2_TPU_COORD=host0:8476 HALO2_TPU_NPROC=4 HALO2_TPU_PROC_ID=$i \\
        python your_prover_job.py

    from halo2_tpu.dist.launch import init_multihost, global_mesh
    init_multihost()
    mesh = global_mesh()
"""

from __future__ import annotations

import os

import jax

from .mesh import make_mesh


def init_multihost(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the distributed runtime from args or HALO2_TPU_* env vars.

    No-op when running single-process (num_processes in {None, 1} and no
    coordinator configured)."""
    coordinator = coordinator or os.environ.get("HALO2_TPU_COORD")
    if num_processes is None:
        num_processes = int(os.environ.get("HALO2_TPU_NPROC", "1"))
    if process_id is None:
        process_id = int(os.environ.get("HALO2_TPU_PROC_ID", "0"))
    if coordinator is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh():
    """1-D mesh over every device in the (possibly multi-host) job."""
    return make_mesh(devices=jax.devices())
