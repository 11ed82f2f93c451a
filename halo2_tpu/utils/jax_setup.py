"""JAX runtime configuration helpers.

The limb-arithmetic kernels produce large HLO programs; a persistent
compilation cache makes repeat runs (tests, CLI invocations) skip XLA
compilation entirely.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache — TPU backends only.

    On the CPU backend in this container the cache is actively harmful: the
    serialized AOT executables embed host CPU features that mismatch at load
    (SIGILL risk) and concurrent cache writes have segfaulted inside
    jax' put_executable_and_time.  TPU executables round-trip fine."""
    import jax

    if jax.default_backend() != "tpu":
        return
    cache_dir = cache_dir or os.environ.get("HALO2_TPU_JAX_CACHE", _DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def device_put_chunked(arr, chunk_bytes: int = 16 << 20):
    """Host array -> device in fenced row chunks.

    The axon relay degrades badly on monolithic bulk transfers (a single
    64 MB put can take >70 s while 8 MB chunks stream at full rate); this
    splits axis 0 into ~chunk_bytes pieces, fences each, and concatenates
    on device.  On a direct-attached backend it is one jnp.asarray."""
    import jax.numpy as jnp
    import numpy as np

    def fence(d):
        np.asarray(d[(0,) * (d.ndim - 1)][:1])

    if arr.nbytes <= chunk_bytes:
        d = jnp.asarray(arr)
        fence(d)
        return d
    row_bytes = max(1, arr.nbytes // arr.shape[0])
    rows_per = max(1, chunk_bytes // row_bytes)
    parts = []
    for lo in range(0, arr.shape[0], rows_per):
        d = jnp.asarray(arr[lo : lo + rows_per])
        fence(d)
        parts.append(d)
    out = jnp.concatenate(parts, axis=0)
    fence(out)
    return out
