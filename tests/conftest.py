"""Test harness: force CPU with 8 virtual devices BEFORE jax initializes.

SURVEY.md §4 'hardware strategy': all correctness tests run on CPU; the
8-device virtual mesh validates the sharded paths without TPU hardware.
TPU-only perf assertions live behind the 'tpu' marker.
"""

import os

# MULTIH_TPU_TESTS=1 keeps the native (TPU) platform so the tpu-marked
# on-device parity suite (tests/test_tpu_parity.py) can run; everything
# else skips itself there. Default: force CPU + virtual mesh.
_TPU_MODE = os.environ.get("MULTIH_TPU_TESTS") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_MODE and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: this image pre-sets JAX_PLATFORMS=axon and the env var is NOT
# honored when overwritten from inside the process — only the config API
# reliably forces CPU here.
if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: full-pipeline jits are expensive on CPU;
# cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/multih_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
