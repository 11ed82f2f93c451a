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
