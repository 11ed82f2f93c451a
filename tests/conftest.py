"""Test config: force an 8-virtual-device CPU mesh so sharded code paths are
exercised without TPU hardware (SURVEY.md section 4, multi-chip testing)."""

import os
import sys

# Must run before jax is imported anywhere.
if "jax" not in sys.modules:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np
import pytest

from halo2_tpu.utils import enable_compilation_cache

enable_compilation_cache()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xBA5EBA11)
