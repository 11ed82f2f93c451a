"""Test config: force an 8-virtual-device CPU mesh so sharded code paths are
exercised without TPU hardware (SURVEY.md section 4, multi-chip testing)."""

import os
import sys

# Force CPU with 8 virtual devices (the ambient environment may export
# JAX_PLATFORMS=axon/tpu, and a sitecustomize may have already imported jax —
# but the backend only initializes on first use, so env set here still wins).
# The suite needs a multi-device mesh to exercise sharded code paths, which
# only the host platform provides without a pod.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from halo2_tpu.utils import enable_compilation_cache

enable_compilation_cache()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xBA5EBA11)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The XLA:CPU compiler segfaults partway through the suite after many
    accumulated compilations (crash inside backend_compile_and_load; the same
    test passes in isolation).  Dropping compiled programs between modules
    works around it."""
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
