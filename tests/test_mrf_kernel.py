"""Windowed k-NN graph + fused Pallas MRF kernels vs the jnp reference
paths (SURVEY.md §7 stage 7; docs/PERF.md 'Remaining headroom' — the
round-3 fused-PEARL work). Kernels run in interpreter mode on CPU; the
same kernels compile for TPU (tpu-marked on-device parity in
test_tpu_parity.py / docs/TPU_PARITY.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multih_tpu.models import labeling, pipeline


def _morton_scene(rng, n, invalid=0):
    pts = jnp.asarray(rng.uniform(0, 100, (n, 2)).astype(np.float32))
    valid = jnp.ones((n,), jnp.float32)
    if invalid:
        valid = valid.at[-invalid:].set(0.0)
    perm = pipeline.morton_order(pts, valid)
    return pts[perm], valid[perm]


class TestWindowedKnn:
    def test_two_blocks_equals_exact(self, rng):
        """At nb=2 the window covers the whole array — windowed k-NN must
        equal the exact full-range build, edge for edge."""
        n, k, b = 512, 6, 256
        pts, valid = _morton_scene(rng, n, invalid=30)
        i1, w1 = labeling.knn_graph(pts, valid, k)
        i2, w2 = labeling.knn_graph_windowed(pts, valid, k, b)
        i1, w1, i2, w2 = map(np.asarray, (i1, w1, i2, w2))
        for r in range(n):
            assert set(i1[r][w1[r] > 0]) == set(i2[r][w2[r] > 0]), r

    def test_edges_always_in_band_no_far(self, rng):
        n, k, b = 2048, 6, 256
        pts, valid = _morton_scene(rng, n, invalid=100)
        idx, w = labeling.knn_graph_windowed(pts, valid, k, b)
        blk = np.arange(n) // b
        nbr_blk = blk[np.asarray(idx)]
        inband = np.abs(blk[:, None] - nbr_blk) <= 1
        assert ((np.asarray(w) == 0) | inband).all()
        adj = labeling.build_banded_adjacency(idx, w, b, far_capacity=0)
        assert int(adj.n_dropped) == 0
        assert adj.far_w.shape == (0,)

    def test_high_overlap_with_exact(self, rng):
        """The window keeps the overwhelming majority of exact k-NN edges
        (measured ~98% at uniform density); the remainder are replaced by
        the next-nearest in-window points."""
        n, k, b = 2048, 6, 256
        pts, valid = _morton_scene(rng, n)
        i1, w1 = labeling.knn_graph(pts, valid, k)
        i2, w2 = labeling.knn_graph_windowed(pts, valid, k, b)
        i1, w1, i2, w2 = map(np.asarray, (i1, w1, i2, w2))
        inter = tot = 0
        for r in range(n):
            a, c = set(i1[r][w1[r] > 0]), set(i2[r][w2[r] > 0])
            inter += len(a & c)
            tot += len(a)
        assert inter / tot > 0.95, inter / tot

    def test_banded_agree_matches_gather_reference(self, rng):
        n, k, b = 1024, 6, 128
        pts, valid = _morton_scene(rng, n, invalid=50)
        idx, w = labeling.knn_graph_windowed(pts, valid, k, b)
        adj = labeling.build_banded_adjacency(idx, w, b, far_capacity=0)
        p = jnp.asarray(rng.uniform(size=(n, 7)).astype(np.float32))
        ref = labeling._neighbor_agreement(p, idx, w)
        np.testing.assert_allclose(
            np.asarray(adj.agree(p)), np.asarray(ref), atol=5e-6
        )


def _mrf_problem(rng, n=512, b=128, k=6, l=6):
    pts, valid = _morton_scene(rng, n, invalid=30)
    nbr_idx, nbr_w = labeling.knn_graph_windowed(pts, valid, k, b)
    adj = labeling.build_banded_adjacency(nbr_idx, nbr_w, b,
                                          far_capacity=0)
    dcost = jnp.asarray(rng.uniform(0.0, 2.0, (n, l)).astype(np.float32))
    return nbr_idx, nbr_w, adj, dcost


class TestFusedMeanField:
    def test_matches_jnp_scan(self, rng):
        nbr_idx, nbr_w, adj, dcost = _mrf_problem(rng)
        kw = dict(spatial_weight=0.1, iterations=4, temp_start=2.0,
                  temp_end=0.25, adj=adj)
        q_ref = labeling.mean_field(dcost, nbr_idx, nbr_w, **kw)
        q_ker = labeling.mean_field(dcost, nbr_idx, nbr_w, **kw,
                                    use_kernel=True, interpret=True)
        np.testing.assert_allclose(
            np.asarray(q_ker), np.asarray(q_ref), atol=1e-5
        )
        assert (jnp.argmax(q_ker, 1) == jnp.argmax(q_ref, 1)).all()

    def test_q_init_and_single_iteration(self, rng):
        nbr_idx, nbr_w, adj, dcost = _mrf_problem(rng)
        q0 = jax.nn.softmax(
            -dcost * jnp.asarray(rng.uniform(size=(1,)), jnp.float32),
            axis=1,
        )
        kw = dict(spatial_weight=0.2, iterations=1, temp_start=1.0,
                  temp_end=0.5, q_init=q0, adj=adj)
        q_ref = labeling.mean_field(dcost, nbr_idx, nbr_w, **kw)
        q_ker = labeling.mean_field(dcost, nbr_idx, nbr_w, **kw,
                                    use_kernel=True, interpret=True)
        np.testing.assert_allclose(
            np.asarray(q_ker), np.asarray(q_ref), atol=1e-5
        )


def _front_problem(rng, n=512, b=128, k_lbl=6):
    """Morton scene + hypotheses + banded adjacency for the fused
    residual+data-cost front (VERDICT r3 task 5)."""
    x1, valid = _morton_scene(rng, n, invalid=30)
    x2 = x1 + jnp.asarray(rng.normal(0, 2.0, (n, 2)).astype(np.float32))
    nbr_idx, nbr_w = labeling.knn_graph_windowed(x1, valid, 6, b)
    adj = labeling.build_banded_adjacency(nbr_idx, nbr_w, b,
                                          far_capacity=0)
    # hypotheses: near-identity warps (small residuals for some points)
    # plus wild ones (huge residuals -> truncation branch), one inactive
    Hs = jnp.asarray(
        np.eye(3)[None] + rng.normal(0, 0.02, (k_lbl, 3, 3)),
        jnp.float32,
    )
    Hs = Hs.at[-1].set(
        jnp.asarray(rng.normal(0, 1.0, (3, 3)), jnp.float32)
    )
    active = jnp.ones((k_lbl,), jnp.float32).at[1].set(0.0)
    return x1, x2, valid, Hs, active, nbr_idx, nbr_w, adj


class TestFusedFront:
    KW = dict(outlier_cost=1.0, spatial_weight=0.1, iterations=4,
              temp_start=2.0, temp_end=0.25)

    @pytest.mark.parametrize("kind", ["symmetric", "transfer"])
    def test_r_and_dct_match_reference(self, rng, kind):
        from multih_tpu.ops import geometry

        x1, x2, valid, Hs, active, nbr_idx, nbr_w, adj = \
            _front_problem(rng)
        l = Hs.shape[0] + 1
        thr = jnp.asarray(9.0, jnp.float32)
        q0 = jnp.full((l, x1.shape[0]), 1.0 / l, jnp.float32)
        q, dct, r = labeling.pearl_relax_fused(
            x1, x2, valid, Hs, active, thr, q_init=q0, adj=adj,
            kind=kind, interpret=True, **self.KW,
        )
        r_ref = geometry.residual_matrix(Hs, x1, x2, kind)
        # rtol 1e-3: the VPU multiply-add front vs the MXU HIGHEST einsum
        # differ by ~1e-4 relative on near-singular-denominator residuals
        # (1e9+ px^2, all truncated to the 8x cost ceiling); the COST
        # agreement below is the contract that matters
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(r_ref), rtol=1e-3, atol=1e-4
        )
        thr_f = float(thr)
        np.testing.assert_allclose(
            np.minimum(np.asarray(r) / thr_f, 8.0),
            np.minimum(np.asarray(r_ref) / thr_f, 8.0),
            atol=1e-4,
        )
        # given the kernel's own r, the cost shaping must match
        # data_costs_t to float32 rounding (same ops; fusion/FMA choices
        # differ across the two compilations by ~1 ulp)
        dct_ref = labeling.data_costs_t(r, valid, thr, 1.0, active)
        np.testing.assert_allclose(
            np.asarray(dct), np.asarray(dct_ref), rtol=2e-6, atol=1e-6
        )

    def test_q_matches_unfused_sweeps(self, rng):
        """Fed its own dct, the front's sweeps are the same math as
        mean_field_t — bit-identical marginals."""
        x1, x2, valid, Hs, active, nbr_idx, nbr_w, adj = \
            _front_problem(rng)
        l = Hs.shape[0] + 1
        thr = jnp.asarray(9.0, jnp.float32)
        q0 = jnp.full((l, x1.shape[0]), 1.0 / l, jnp.float32)
        q, dct, r = labeling.pearl_relax_fused(
            x1, x2, valid, Hs, active, thr, q_init=q0, adj=adj,
            kind="symmetric", interpret=True, **self.KW,
        )
        q_ref = labeling.mean_field_t(
            dct, nbr_idx, nbr_w, 0.1, 4, 2.0, 0.25, q_init=q0, adj=adj,
            use_kernel=True, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
        # and within tolerance of the pure-jnp reference scan
        q_jnp = labeling.mean_field_t(
            dct, nbr_idx, nbr_w, 0.1, 4, 2.0, 0.25, q_init=q0, adj=adj,
        )
        np.testing.assert_allclose(
            np.asarray(q), np.asarray(q_jnp), atol=1e-5
        )


class TestFusedIcm:
    def test_matches_jnp_batch_exactly(self, rng):
        """Label updates are discrete — the fused kernel must agree with
        labeling._icm_batch bit for bit (same first-minimum tie rules,
        same red-black schedule, same escape)."""
        nbr_idx, nbr_w, adj, dcost = _mrf_problem(rng)
        starts = jnp.stack([
            jnp.argmin(dcost, axis=1).astype(jnp.int32),
            jnp.asarray(
                rng.integers(0, dcost.shape[1], dcost.shape[0]),
                jnp.int32,
            ),
        ])
        ref = labeling._icm_batch(starts, dcost.T, 0.1, 2, adj)
        got = labeling._icm_batch(starts, dcost.T, 0.1, 2, adj,
                                  use_kernel=True, interpret=True)
        assert (np.asarray(ref) == np.asarray(got)).all()

    def test_best_labeling_kernel_path(self, rng):
        nbr_idx, nbr_w, adj, dcost = _mrf_problem(rng)
        starts = [jnp.argmin(dcost, axis=1).astype(jnp.int32),
                  jnp.zeros((dcost.shape[0],), jnp.int32)]
        ref = labeling.best_labeling(
            starts, dcost, nbr_idx, nbr_w, 0.1, 2, adj=adj
        )
        # interpret flag is not threaded through best_labeling (the TPU
        # path compiles the kernel); emulate by calling _icm_batch the
        # same way best_labeling does
        polished = labeling._icm_batch(  # private API: label-major costs
            jnp.stack(starts), dcost.T, 0.1, 2, adj, use_kernel=True,
            interpret=True,
        )
        energies = labeling._energies_batch(polished, dcost.T, adj, 0.1)
        got = polished[jnp.argmin(energies)]
        assert (np.asarray(ref) == np.asarray(got)).all()


class TestWindowedPipelineEndToEnd:
    def test_windowed_fit_recovers_planes(self, rng):
        """Full fit at a 3+-block padded size with the windowed graph: the
        synthetic 2-plane scene must still be recovered near-exactly
        (knn_window=True is the default; this exercises it at nb>2 where
        the window is a real restriction)."""
        import multih_tpu
        from multih_tpu.utils import data, evaluation

        cfg = multih_tpu.MultiHConfig(
            max_points=768, n_hypotheses=768, agree_block=256,
        )
        cs, _ = data.synthetic_scene(
            n_points=700, n_planes=3, outlier_rate=0.15, noise_px=0.5,
            seed=3,
        )
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg.max_points
        )
        res = jax.jit(
            lambda a, b, v, k: pipeline.fit(a, b, v, k, cfg)
        )(x1, x2, valid, jax.random.key(0))
        err = evaluation.misclassification_error(
            np.asarray(res.labels)[: cs.n_points], cs.gt_labels,
            cfg.max_labels,
        )
        assert err < 3.0, err
        assert int(res.n_far_dropped) == 0
