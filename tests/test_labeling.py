"""Labeling vs oracles: k-NN graph vs scipy cKDTree; mean-field/ICM on tiny
MRFs vs brute-force exact minimum (SURVEY.md §4 'unit (optimizer)')."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial import cKDTree

from multih_tpu.models import labeling


class TestKnnGraph:
    def test_matches_ckdtree(self, rng):
        n, k = 120, 5
        pts = rng.uniform(0, 640, (n, 2)).astype(np.float32)
        valid = jnp.ones(n)
        nbr_idx, nbr_w = jax.jit(labeling.knn_graph, static_argnums=2)(
            jnp.asarray(pts), valid, k
        )
        nbr_idx, nbr_w = np.asarray(nbr_idx), np.asarray(nbr_w)
        tree = cKDTree(pts)
        _, ref = tree.query(pts, k + 1)  # includes self
        for i in range(n):
            assert set(nbr_idx[i]) == set(ref[i][1:]), i
        assert np.all(nbr_w == 1.0)

    def test_blocked_matches_dense_4d(self, rng):
        """Blocked build on 4-d (motion-augmented) features is exact vs
        dense — the sampling graph path."""
        n, k = 520, 5
        pts = rng.uniform(-50, 640, (n, 4)).astype(np.float32)
        valid = jnp.ones(n)
        p = jnp.asarray(pts)
        di, dw = labeling.knn_graph(p, valid, k, row_block=n)
        bi, bw = labeling.knn_graph(p, valid, k, row_block=128)
        np.testing.assert_array_equal(np.asarray(di), np.asarray(bi))

    def test_blocked_matches_dense(self, rng):
        """Row-blocked build (memory O(N*block)) is exact vs the dense path,
        including non-divisible N and padding."""
        n, k = 700, 6
        pts = rng.uniform(0, 640, (n, 2)).astype(np.float32)
        valid = jnp.asarray((np.arange(n) < 650).astype(np.float32))
        p = jnp.asarray(pts)
        di, dw = labeling.knn_graph(p, valid, k, row_block=n)
        bi, bw = labeling.knn_graph(p, valid, k, row_block=256)
        np.testing.assert_array_equal(np.asarray(di), np.asarray(bi))
        np.testing.assert_array_equal(np.asarray(dw), np.asarray(bw))

    def test_blocked_matches_ckdtree(self, rng):
        n, k = 2048, 5
        pts = rng.uniform(0, 640, (n, 2)).astype(np.float32)
        nbr_idx, _ = jax.jit(
            labeling.knn_graph, static_argnums=(2, 3)
        )(jnp.asarray(pts), jnp.ones(n), k, 512)
        nbr_idx = np.asarray(nbr_idx)
        tree = cKDTree(pts)
        _, ref = tree.query(pts, k + 1)
        mismatch = sum(
            set(nbr_idx[i]) != set(ref[i][1:]) for i in range(n)
        )
        # fp32 matmul-identity distances may flip exact-tie neighbors on a
        # handful of points; the graph is statistically identical
        assert mismatch <= n // 200, mismatch

    def test_padding_excluded(self, rng):
        n, k = 40, 4
        pts = rng.uniform(0, 100, (n, 2)).astype(np.float32)
        pts[30:] = 0.0
        valid = jnp.asarray((np.arange(n) < 30).astype(np.float32))
        nbr_idx, nbr_w = labeling.knn_graph(jnp.asarray(pts), valid, k)
        nbr_idx, nbr_w = np.asarray(nbr_idx), np.asarray(nbr_w)
        # no valid point has a padded neighbor (with nonzero weight)
        assert nbr_idx[:30].max() < 30
        # padded points contribute no edges
        assert np.all(nbr_w[30:] == 0.0)


def brute_force_min(dcost, nbr_idx, nbr_w, lam):
    """Exact minimum of data + lambda*Potts over all labelings (tiny N)."""
    n, l = dcost.shape
    best, best_e = None, np.inf
    for lab in itertools.product(range(l), repeat=n):
        lab = np.array(lab)
        e = dcost[np.arange(n), lab].sum()
        e += lam * 0.5 * sum(
            nbr_w[i, j] * (lab[i] != lab[nbr_idx[i, j]])
            for i in range(n)
            for j in range(nbr_idx.shape[1])
        )
        if e < best_e:
            best_e, best = e, lab
    return best, best_e


class TestMeanFieldICM:
    def _tiny_problem(self, rng, n=8, l=3, k=2):
        pts = rng.uniform(0, 10, (n, 2)).astype(np.float32)
        nbr_idx, nbr_w = labeling.knn_graph(
            jnp.asarray(pts), jnp.ones(n), k
        )
        dcost = rng.uniform(0, 1, (n, l)).astype(np.float32)
        return dcost, np.asarray(nbr_idx), np.asarray(nbr_w)

    def test_reaches_exact_minimum_on_tiny_mrfs(self, rng):
        """Annealed mean-field + ICM should find the global optimum on small
        random problems in most cases, and never produce a labeling worse
        than a few percent above it."""
        lam = 0.4
        hits, total = 0, 10
        for _ in range(total):
            dcost, nbr_idx, nbr_w = self._tiny_problem(rng)
            q = labeling.mean_field(
                jnp.asarray(dcost), jnp.asarray(nbr_idx), jnp.asarray(nbr_w),
                lam, 30, 2.0, 0.05,
            )
            lab = np.asarray(jnp.argmax(q, axis=1))
            lab = np.asarray(labeling.icm(
                jnp.asarray(lab), jnp.asarray(dcost), jnp.asarray(nbr_idx),
                jnp.asarray(nbr_w), lam, 6,
            ))
            _, e_opt = brute_force_min(dcost, nbr_idx, nbr_w, lam)
            e_got = (
                dcost[np.arange(8), lab].sum()
                + lam * 0.5 * sum(
                    nbr_w[i, j] * (lab[i] != lab[nbr_idx[i, j]])
                    for i in range(8) for j in range(nbr_idx.shape[1])
                )
            )
            assert e_got <= e_opt * 1.10 + 1e-4
            hits += int(e_got <= e_opt + 1e-5)
        assert hits >= 7, f"only {hits}/{total} exact"

    def test_zero_smoothness_is_pointwise_argmin(self, rng):
        dcost, nbr_idx, nbr_w = self._tiny_problem(rng)
        q = labeling.mean_field(
            jnp.asarray(dcost), jnp.asarray(nbr_idx), jnp.asarray(nbr_w),
            0.0, 20, 2.0, 0.05,
        )
        lab = np.asarray(jnp.argmax(q, axis=1))
        np.testing.assert_array_equal(lab, dcost.argmin(1))

    def test_strong_smoothness_yields_constant_labeling(self, rng):
        dcost, nbr_idx, nbr_w = self._tiny_problem(rng)
        q = labeling.mean_field(
            jnp.asarray(dcost), jnp.asarray(nbr_idx), jnp.asarray(nbr_w),
            50.0, 40, 2.0, 0.05,
        )
        lab = np.asarray(jnp.argmax(q, axis=1))
        lab = np.asarray(labeling.icm(
            jnp.asarray(lab), jnp.asarray(dcost), jnp.asarray(nbr_idx),
            jnp.asarray(nbr_w), 50.0, 8,
        ))
        assert len(np.unique(lab)) == 1

    def test_icm_never_increases_energy(self, rng):
        lam = 0.7
        dcost, nbr_idx, nbr_w = self._tiny_problem(rng, n=10, l=4, k=3)

        def energy(lab):
            return (
                dcost[np.arange(10), lab].sum()
                + lam * 0.5 * sum(
                    nbr_w[i, j] * (lab[i] != lab[nbr_idx[i, j]])
                    for i in range(10) for j in range(nbr_idx.shape[1])
                )
            )

        lab0 = np.asarray(dcost.argmin(1))
        lab1 = np.asarray(labeling.icm(
            jnp.asarray(lab0), jnp.asarray(dcost), jnp.asarray(nbr_idx),
            jnp.asarray(nbr_w), lam, 8,
        ))
        assert energy(lab1) <= energy(lab0) + 1e-5


class TestBandedAdjacency:
    """The banded MXU agreement operator must reproduce the gather/scatter
    reference exactly (same graph, same symmetrization) — it is a layout
    change, not an approximation."""

    def _graph(self, rng, n, k=6, morton=True):
        import jax.numpy as jnp
        from multih_tpu.models import pipeline

        pts = rng.uniform(0, 640, (n, 2)).astype(np.float32)
        valid = jnp.asarray((np.arange(n) < n - 7).astype(np.float32))
        p = jnp.asarray(pts)
        if morton:
            perm = pipeline.morton_order(p, valid)
            p, valid = p[perm], valid[perm]
        return labeling.knn_graph(p, valid, k), valid

    def test_agree_matches_gather(self, rng):
        import jax.numpy as jnp

        n, l = 1024, 9
        (nbr_idx, nbr_w), valid = self._graph(rng, n)
        adj = labeling.build_banded_adjacency(nbr_idx, nbr_w, block=128)
        assert int(adj.n_dropped) == 0
        p = jnp.asarray(rng.uniform(0, 1, (n, l)).astype(np.float32))
        ref = labeling._neighbor_agreement(p, nbr_idx, nbr_w)
        got = adj.agree(p)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
        deg_ref = labeling._degree(nbr_idx, nbr_w, p.dtype)
        np.testing.assert_allclose(
            np.asarray(adj.deg), np.asarray(deg_ref), rtol=1e-5, atol=1e-5
        )

    def test_far_edges_exact_without_morton(self, rng):
        """Random (non-Morton) order: most edges are 'far' — the sparse
        fixup must still reproduce the reference when capacity suffices."""
        import jax.numpy as jnp

        n, l = 512, 5
        (nbr_idx, nbr_w), valid = self._graph(rng, n, morton=False)
        adj = labeling.build_banded_adjacency(
            nbr_idx, nbr_w, block=64, far_capacity=2 * n * 6
        )
        assert int(adj.n_dropped) == 0
        p = jnp.asarray(rng.uniform(0, 1, (n, l)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(adj.agree(p)),
            np.asarray(labeling._neighbor_agreement(p, nbr_idx, nbr_w)),
            rtol=1e-5, atol=1e-5,
        )

    def test_no_dropped_edges_at_stress_scale(self):
        """Default far capacity must hold the stress config's Morton-ordered
        graph with margin (a dropped edge silently weakens the energy)."""
        import jax.numpy as jnp
        from multih_tpu.models import pipeline
        from multih_tpu.utils import data

        cs, _ = data.synthetic_scene(10240, 8, 0.7, 0.5, seed=42)
        import multih_tpu

        x1, x2, valid = map(
            jnp.asarray, multih_tpu.pad_points(cs.x1, cs.x2, None, 10240)
        )
        import multih_tpu as mh

        perm = pipeline.morton_order(x1, valid)
        nbr_idx, nbr_w = labeling.knn_graph(x1[perm], valid[perm], 6)
        adj = labeling.build_banded_adjacency(
            nbr_idx, nbr_w, block=mh.MultiHConfig().agree_block
        )
        n_far = int(jnp.sum(adj.far_w > 0))
        assert int(adj.n_dropped) == 0, int(adj.n_dropped)
        # capacity is sized for ~1.7x the measured worst case (the fixup
        # cost is proportional to capacity — see build_banded_adjacency)
        assert n_far <= int(0.6 * adj.far_out.shape[0]), (
            "far capacity margin below 1.7x", n_far, adj.far_out.shape[0]
        )

    def test_batched_restarts_match_sequential(self, rng):
        """best_labeling's banded path batches all restarts through shared
        band reads — per-start results must equal the sequential icm path
        exactly (same math, rows independent)."""
        import jax.numpy as jnp

        n, l = 512, 6
        (nbr_idx, nbr_w), valid = self._graph(rng, n)
        adj = labeling.build_banded_adjacency(nbr_idx, nbr_w, block=128)
        dcost = jnp.asarray(rng.uniform(0, 1, (n, l)).astype(np.float32))
        s0 = jnp.argmin(dcost, axis=1)
        s1 = jnp.asarray(rng.integers(0, l, n).astype(np.int32))
        batched = labeling._icm_batch(  # private API: label-major costs
            jnp.stack([s0, s1]), dcost.T, 0.3, 4, adj
        )
        for i, s in enumerate([s0, s1]):
            seq = labeling.icm(s, dcost, nbr_idx, nbr_w, 0.3, 4, adj=adj)
            np.testing.assert_array_equal(
                np.asarray(batched[i]), np.asarray(seq), err_msg=str(i)
            )
        # the full selector picks the same winner either way
        win = labeling.best_labeling(
            [s0, s1], dcost, nbr_idx, nbr_w, 0.3, 4, adj=adj
        )
        e = [float(labeling.mrf_energy(
            labeling.icm(s, dcost, nbr_idx, nbr_w, 0.3, 4, adj=adj),
            dcost, nbr_idx, nbr_w, 0.3, adj=adj)) for s in [s0, s1]]
        seq_win = labeling.icm(
            [s0, s1][int(np.argmin(e))], dcost, nbr_idx, nbr_w, 0.3, 4,
            adj=adj,
        )
        np.testing.assert_array_equal(np.asarray(win), np.asarray(seq_win))

    def test_mean_field_icm_energy_parity(self, rng):
        """Full sweeps through the banded operator agree with the gather
        path (same labels, same energies)."""
        import jax.numpy as jnp

        n, l = 512, 6
        (nbr_idx, nbr_w), valid = self._graph(rng, n)
        adj = labeling.build_banded_adjacency(nbr_idx, nbr_w, block=128)
        dcost = jnp.asarray(rng.uniform(0, 1, (n, l)).astype(np.float32))
        q_ref = labeling.mean_field(dcost, nbr_idx, nbr_w, 0.3, 8, 2.0, 0.1)
        q_band = labeling.mean_field(
            dcost, nbr_idx, nbr_w, 0.3, 8, 2.0, 0.1, adj=adj
        )
        np.testing.assert_allclose(
            np.asarray(q_band), np.asarray(q_ref), rtol=2e-4, atol=2e-5
        )
        lab0 = jnp.argmin(dcost, axis=1)
        i_ref = labeling.icm(lab0, dcost, nbr_idx, nbr_w, 0.3, 4)
        i_band = labeling.icm(lab0, dcost, nbr_idx, nbr_w, 0.3, 4, adj=adj)
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_band))
        e_ref = labeling.mrf_energy(i_ref, dcost, nbr_idx, nbr_w, 0.3)
        e_band = labeling.mrf_energy(
            i_ref, dcost, nbr_idx, nbr_w, 0.3, adj=adj
        )
        np.testing.assert_allclose(
            float(e_band), float(e_ref), rtol=1e-5
        )


class TestDataCosts:
    def test_truncation_and_outlier(self, rng):
        k, n = 3, 6
        r = rng.uniform(0, 100, (k, n)).astype(np.float32)
        valid = jnp.ones(n)
        active = jnp.ones(k)
        d = np.asarray(labeling.data_costs(
            jnp.asarray(r), valid, jnp.asarray(9.0), 0.8, active
        ))
        assert d.shape == (n, k + 1)
        # truncated at 8x, scaled so cost == outlier_cost exactly at r = tau
        np.testing.assert_allclose(
            d[:, :k], np.minimum(r.T / 9.0, 8.0) * 0.8, rtol=1e-6
        )
        np.testing.assert_allclose(d[:, k], 0.8)
        # crossing property: residual at threshold costs exactly outlier_cost
        d_at = np.asarray(labeling.data_costs(
            jnp.full((1, 1), 9.0, np.float32), jnp.ones(1),
            jnp.asarray(9.0), 0.8, jnp.ones(1)
        ))
        assert abs(d_at[0, 0] - 0.8) < 1e-6

    def test_inactive_label_is_prohibitive(self, rng):
        k, n = 3, 5
        r = np.zeros((k, n), np.float32)  # all perfect fits
        active = jnp.asarray([1.0, 0.0, 1.0])
        d = np.asarray(labeling.data_costs(
            jnp.asarray(r), jnp.ones(n), jnp.asarray(9.0), 0.8, active
        ))
        assert np.all(d[:, 1] > 100.0)
