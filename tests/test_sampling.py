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


class TestWindowGather:
    """ops/kernels/gather_kernel.py: Pallas kernel (interpret mode on CPU)
    vs the jnp reference, both selection modes."""

    def _source(self, rng, nb=3, block=64, c=8):
        rows = 3 * block
        win = rng.standard_normal((nb, rows, c)).astype(np.float32)
        avail = (rng.uniform(size=(nb, rows)) < 0.6).astype(np.float32)
        avail[0, :block] = 0.0   # wrap thirds are never available
        avail[-1, 2 * block:] = 0.0
        win[:, :, 4] = avail
        win[:, :, 5] = np.cumsum(avail, axis=1)
        return jnp.asarray(win)

    def test_index_mode_parity(self, rng):
        from multih_tpu.ops.kernels import gather_kernel

        win = self._source(rng)
        nb, rows, _ = win.shape
        sel = rng.integers(-2, rows + 2, size=(nb, 512)).astype(np.int32)
        ref = gather_kernel.window_gather_reference(win, jnp.asarray(sel))
        out = gather_kernel.window_gather(
            win, jnp.asarray(sel), "index", interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=0)

    def test_rank_mode_parity(self, rng):
        from multih_tpu.ops.kernels import gather_kernel

        win = self._source(rng)
        nb, rows, _ = win.shape
        # ranks straddling the per-window avail count, incl. out-of-range
        sel = rng.integers(-1, rows, size=(nb, 512)).astype(np.int32)
        ref = gather_kernel.window_gather_reference(
            win, jnp.asarray(sel), "rank"
        )
        out = gather_kernel.window_gather(
            win, jnp.asarray(sel), "rank", interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=0)

    def test_rank_mode_selects_the_rth_available(self, rng):
        from multih_tpu.ops.kernels import gather_kernel

        win = self._source(rng, nb=2, block=64)
        avail = np.asarray(win[:, :, 4])
        sel = np.stack([np.arange(512), np.arange(512)]).astype(np.int32)
        out = np.asarray(gather_kernel.window_gather_reference(
            win, jnp.asarray(sel), "rank"
        ))
        for v in range(2):
            apos = np.nonzero(avail[v])[0]
            for r in range(512):
                col = out[v, :, r]
                if r < len(apos):
                    np.testing.assert_allclose(
                        col, np.asarray(win[v, apos[r]]), atol=0
                    )
                else:  # exhausted -> all-zero column, never a wrong row
                    np.testing.assert_allclose(col, 0.0, atol=0)


class TestWindowedQuadruples:
    def _scene(self, rng, n=512, block=128):
        pts = rng.uniform(0, 640, (n, 2)).astype(np.float32)
        # Morton-ish: sort by x so windows are spatially coherent
        pts = pts[np.argsort(pts[:, 0])]
        x1 = jnp.asarray(pts)
        x2 = x1 + 1.0
        avail = np.ones(n, np.float32)
        avail[rng.uniform(size=n) < 0.3] = 0.0  # claimed points
        nbr_idx, _ = labeling.knn_graph_windowed(
            x1, jnp.asarray(avail > -1.0).astype(jnp.float32), 8, block
        )
        return x1, x2, jnp.asarray(avail), nbr_idx

    def test_gt_rows_and_avail_contract(self, rng):
        n, block, s = 512, 128, 64
        x1, x2, avail, nbr_idx = self._scene(rng, n, block)
        gt = np.asarray(sampling.windowed_quadruples(
            jax.random.key(0), x1, x2, avail, nbr_idx, s, block
        ))
        assert gt.shape == (32, s)
        x1n = np.asarray(x1)
        av = np.asarray(avail)
        pt_lookup = {tuple(np.round(p, 4)): i for i, p in enumerate(x1n)}
        n_live = 0
        for col in range(s):
            q = gt[:, col].reshape(4, 8)
            if np.all(q[:, 4] == 1.0):  # live quadruple
                n_live += 1
                ids = []
                for p in range(4):
                    i = pt_lookup[tuple(np.round(q[p, :2], 4))]
                    assert av[i] == 1.0  # never a claimed/padded point
                    # x2 and the channel layout ride along coherently
                    np.testing.assert_allclose(
                        q[p, 2:4], x1n[i] + 1.0, atol=1e-5
                    )
                    ids.append(i)
                assert len(set(ids)) == 4  # distinct points
        assert n_live > s // 2  # most quadruples survive

    def test_kernel_path_matches_reference(self, rng):
        n, block, s = 512, 128, 64
        x1, x2, avail, nbr_idx = self._scene(rng, n, block)
        args = (jax.random.key(1), x1, x2, avail, nbr_idx, s, block)
        ref = sampling.windowed_quadruples(*args, use_kernel=False)
        out = sampling.windowed_quadruples(
            *args, use_kernel=True, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-6)

    def test_fit_recovers_planes_with_window_sampling(self):
        import multih_tpu
        from multih_tpu.utils import data, evaluation

        cfg = multih_tpu.MultiHConfig(
            max_points=512, n_hypotheses=1024, window_sampling=True
        )
        cs, _ = data.synthetic_scene(400, 2, 0.1, 0.5, seed=3)
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg.max_points
        )
        res = multih_tpu.make_fit(cfg)(x1, x2, valid, jax.random.key(0))
        err = evaluation.misclassification_error(
            np.asarray(res.labels), gt, cfg.max_labels
        )
        assert int(np.sum(np.asarray(res.active))) == 2
        assert err < 2.0
