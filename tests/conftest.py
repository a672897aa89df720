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
# cache them across test runs. Host-keyed — a stale cross-machine CPU
# cache SIGSEGVs on load (multih_tpu/utils/cache.py).
from multih_tpu.utils.cache import compile_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  compile_cache_dir("/tmp/multih_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# smoke / full split (VERDICT r3 task 8). The full suite is ~30 min on CPU;
# the smoke subset (`pytest -m "not full"`) must stay under ~3 min so it can
# run before EVERY commit. Policy: docs/ARCHITECTURE.md "Test policy".
#
# Everything matching a prefix below is auto-marked `full`: heavyweight
# end-to-end fits, parity sweeps over all golden scenes, and the virtual
# 8-device mesh tests. Each module keeps its fast unit tests in smoke, so
# smoke still touches every subsystem. Maintained here, in one place, so the
# split is visible and greppable rather than scattered across 12 files.
# ---------------------------------------------------------------------------
_FULL_PREFIXES = (
    # whole modules that are end-to-end / mesh-bound by nature
    "tests/test_sharding.py",
    "tests/test_golden_parity.py",
    "tests/test_streaming_features.py",
    "tests/test_aot.py",
    "tests/test_tpu_parity.py",
    # heavyweight classes inside otherwise-fast modules
    "tests/test_mixed.py::TestMixedScene",
    "tests/test_mixed.py::TestMixedAdaptiveTau",
    "tests/test_pipeline.py::TestFitTau",
    "tests/test_pipeline.py::TestAdaptiveTau",
    "tests/test_pipeline.py::TestAffinePath",
    "tests/test_pipeline.py::TestInvariances",
    "tests/test_pipeline.py::TestExactRecovery",
    "tests/test_fmodel_pipeline.py::TestMotionSegmentation",
    "tests/test_geometry.py::TestMomentRefit",
    "tests/test_sampling.py::TestWindowedQuadruples",
    "tests/test_labeling.py::TestBandedAdjacency",
    "tests/test_labeling.py::TestMeanFieldICM::test_reaches_exact_minimum",
    "tests/test_cli_config.py::TestCLI",
    "tests/test_mrf_kernel.py::TestWindowedKnn::test_edges_always_in_band",
    "tests/test_mrf_kernel.py::TestWindowedKnn::test_high_overlap_with_exact",
    "tests/test_mrf_kernel.py::TestWindowedKnn::test_banded_agree_matches_gather_reference",
    "tests/test_pallas_kernels.py::TestInlierCountKernel::test_eig_kernel",
    "tests/test_epipolar.py::TestFundamental::test_ransac_with_outliers",
    "tests/test_fmodel.py::TestNptSolver::test_noisy_12pt_beats_minimal_8pt",
    "tests/test_fmodel.py::TestMinimalSolver::test_batch_matches_single",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid.lstrip("/")
        if any(nodeid.startswith(p) for p in _FULL_PREFIXES):
            item.add_marker(pytest.mark.full)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
