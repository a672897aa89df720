"""Numerical hygiene (SURVEY.md §5 'race detection / sanitizers' analog):
the pipeline must be NaN-free under jax_debug_nans even on adversarial
inputs (degenerate geometry, duplicated points, zero-area quads)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import multih_tpu
from multih_tpu.utils import data


@pytest.fixture
def nan_debug():
    jax.config.update("jax_debug_nans", True)
    yield
    jax.config.update("jax_debug_nans", False)


class TestNaNFree:
    def test_degenerate_inputs(self, nan_debug):
        """All points identical / collinear — worst case for every solver
        in the pipeline; must produce finite outputs, not NaNs."""
        cfg = multih_tpu.MultiHConfig(
            max_points=64, n_hypotheses=128, n_candidates=32, max_labels=4,
            knn_k=3,
        )
        n = 40
        # collinear points + exact duplicates
        t = np.linspace(0, 100, n).astype(np.float32)
        x1 = np.stack([t, 2 * t], 1)
        x1[10:20] = x1[0]  # duplicates
        x2 = x1 * 1.1
        cs = data.CorrespondenceSet(x1, x2, np.zeros(n, np.int32), "degen")
        p1, p2, valid = multih_tpu.pad_points(cs.x1, cs.x2, None, 64)
        f = multih_tpu.make_fit(cfg)
        res = f(p1, p2, valid, jax.random.key(0))
        assert np.all(np.isfinite(np.asarray(res.homographies)))
        assert np.all(np.isfinite(np.asarray(res.energy_trace)))

    def test_normal_scene_nan_free(self, nan_debug):
        cfg = multih_tpu.MultiHConfig(
            max_points=128, n_hypotheses=256, n_candidates=64, max_labels=8,
        )
        cs, _ = data.synthetic_scene(100, 2, 0.2, 0.5, seed=5)
        p1, p2, valid = multih_tpu.pad_points(cs.x1, cs.x2, None, 128)
        f = multih_tpu.make_fit(cfg)
        res = f(p1, p2, valid, jax.random.key(0))
        assert np.all(np.isfinite(np.asarray(res.homographies)))
