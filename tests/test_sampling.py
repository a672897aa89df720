"""Threefry minimal-sampling statistics (SURVEY.md §4: sampling stats)."""

import numpy as np
import jax
import jax.numpy as jnp

from multih_tpu.models import labeling
from multih_tpu.ops import sampling


class TestSampleIndices:
    def test_distinct_and_valid(self):
        n, s = 64, 2000
        valid = np.ones(n, bool)
        valid[50:] = False  # 14 padded points
        idx = np.asarray(
            jax.jit(sampling.sample_indices, static_argnums=1)(
                jax.random.key(0), s, jnp.asarray(valid)
            )
        )
        assert idx.shape == (s, 4)
        # all indices point at valid entries
        assert idx.max() < 50 and idx.min() >= 0
        # all quadruples distinct within themselves
        for row in idx:
            assert len(set(row.tolist())) == 4

    def test_approximately_uniform(self):
        n, s = 32, 8000
        valid = np.ones(n, bool)
        idx = np.asarray(
            jax.jit(sampling.sample_indices, static_argnums=1)(
                jax.random.key(1), s, jnp.asarray(valid)
            )
        )
        counts = np.bincount(idx.reshape(-1), minlength=n)
        expected = 4 * s / n
        # chi-square-ish sanity: every index within 20% of expectation
        assert np.all(np.abs(counts - expected) < 0.2 * expected), counts

    def test_deterministic_in_key(self):
        valid = jnp.ones(16, bool)
        f = jax.jit(sampling.sample_indices, static_argnums=1)
        a = np.asarray(f(jax.random.key(7), 100, valid))
        b = np.asarray(f(jax.random.key(7), 100, valid))
        c = np.asarray(f(jax.random.key(8), 100, valid))
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)


class TestLocalizedSampling:
    def test_samples_are_local_and_distinct(self, rng):
        n = 100
        pts = rng.uniform(0, 640, (n, 2)).astype(np.float32)
        valid = jnp.ones(n)
        nbr_idx, _ = labeling.knn_graph(jnp.asarray(pts), valid, 8)
        idx = np.asarray(
            jax.jit(sampling.localized_sample_indices, static_argnums=1)(
                jax.random.key(0), 500, valid > 0, nbr_idx
            )
        )
        assert idx.shape == (500, 4)
        for row in idx:
            assert len(set(row.tolist())) == 4
        # samples span a small spatial extent vs random quadruples
        extents = [
            np.linalg.norm(pts[row] - pts[row].mean(0), axis=1).max()
            for row in idx
        ]
        assert np.median(extents) < 200.0
