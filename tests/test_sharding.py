"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4
'hardware strategy', §5 'distributed communication backend'): the sharded
batched fit must compile, execute, and agree with the unsharded path."""

import numpy as np
import jax
import pytest

import multih_tpu
from multih_tpu.parallel import sharding
from multih_tpu.utils import data, evaluation


@pytest.fixture(scope="module")
def tiny_cfg():
    return multih_tpu.MultiHConfig(
        max_points=128, n_hypotheses=512, n_candidates=64, max_labels=8
    )


@pytest.fixture(scope="module")
def pairs():
    return [
        data.synthetic_scene(96, 2, 0.1, 0.5, seed=s)[0] for s in range(8)
    ]


class TestShardedFit:
    def test_eight_device_mesh(self, tiny_cfg, pairs):
        assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
        mesh = sharding.make_mesh(jax.devices()[:8])
        res = sharding.run_benchmark_batch(pairs, tiny_cfg, mesh=mesh)
        assert res.labels.shape == (8, tiny_cfg.max_points)
        # every pair solved
        for i, cs in enumerate(pairs):
            err = evaluation.misclassification_error(
                res.labels[i][: cs.n_points], cs.gt_labels,
                tiny_cfg.max_labels,
            )
            assert err < 5.0, (i, err)

    def test_shard_parity_with_single_device(self, tiny_cfg, pairs):
        """P3 shard-parity: same results with and without sharding.

        Labels must match exactly. Homographies are compared functionally
        (transfer residuals on the pair's own points) rather than
        entry-wise: the moment-refit matmul's fp32 reduction order is
        mesh-dependent, and for near-degenerate tiny scenes that rotates
        H within its accuracy floor without moving any residual."""
        mesh8 = sharding.make_mesh(jax.devices()[:8])
        mesh1 = sharding.make_mesh(jax.devices()[:1])
        r8 = sharding.run_benchmark_batch(pairs, tiny_cfg, mesh=mesh8)
        r1 = sharding.run_benchmark_batch(pairs, tiny_cfg, mesh=mesh1)
        np.testing.assert_array_equal(r8.labels, r1.labels)
        np.testing.assert_array_equal(r8.active, r1.active)
        from multih_tpu.ops import geometry
        import jax.numpy as jnp

        for i, cs in enumerate(pairs):
            x1 = jnp.asarray(cs.x1)
            x2 = jnp.asarray(cs.x2)
            res8 = np.asarray(geometry.residual_matrix(
                jnp.asarray(r8.homographies[i]), x1, x2, "symmetric"))
            res1 = np.asarray(geometry.residual_matrix(
                jnp.asarray(r1.homographies[i]), x1, x2, "symmetric"))
            # ACTIVE planes only: inactive slots hold whatever dead
            # candidate last occupied them — often near-degenerate, where
            # the mesh-dependent fp32 reduction order of the moment refit
            # amplifies into arbitrary residuals. They carry no result
            # state (labels/active asserted exact above).
            act = np.asarray(r8.active[i]) > 0
            # residuals in px^2; the decision zone (up to ~3x the squared
            # inlier threshold tau^2 ~ 6 px^2) must agree to a hundredth
            # of a pixel — far-outlier magnitudes are H-noise-amplified
            # and classification-irrelevant
            np.testing.assert_allclose(
                np.minimum(res8[act], 20.0), np.minimum(res1[act], 20.0),
                atol=0.05, err_msg=str(i),
            )

    def test_non_multiple_batch_padding(self, tiny_cfg, pairs):
        """Batch of 5 on an 8-way mesh: padded internally, results intact."""
        mesh = sharding.make_mesh(jax.devices()[:8])
        res = sharding.run_benchmark_batch(pairs[:5], tiny_cfg, mesh=mesh)
        assert res.labels.shape[0] == 5


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.labels.shape == (256,)

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestHypothesisSharding:
    def test_sharded_verification_matches_unsharded(self, tiny_cfg, pairs):
        """P3 hypothesis-axis shard_map: global top-M from sharded counts
        equals the single-device result."""
        import jax.numpy as jnp
        import functools
        from multih_tpu.models import pipeline
        from multih_tpu.models import labeling
        from multih_tpu.ops import geometry

        mesh = sharding.make_mesh(jax.devices()[:8], pair_axis=1)  # 8-way hyp
        assert mesh.shape["hyp"] == 8
        cs = pairs[0]
        x1, x2, valid = multih_tpu.pad_points(
            cs.x1, cs.x2, None, tiny_cfg.max_points
        )
        x1, x2, valid = map(jnp.asarray, (x1, x2, valid))
        nbr_idx, _ = labeling.knn_graph(x1, valid, tiny_cfg.knn_k)
        key = jax.random.key(3)
        Hs, ok = jax.jit(functools.partial(
            pipeline.generate_hypotheses, cfg=tiny_cfg
        ))(key, x1, x2, valid, nbr_idx)
        # pad pool to a multiple of 8
        s = Hs.shape[0]
        pad = (-s) % 8
        if pad:
            Hs = jnp.concatenate(
                [Hs, jnp.broadcast_to(jnp.eye(3), (pad, 3, 3))]
            )

        f = sharding.sharded_verification(tiny_cfg, mesh)
        with mesh:
            c_top, i_top = f(Hs, x1, x2, valid)

        ref_counts = pipeline.count_inliers(Hs, x1, x2, valid, tiny_cfg)
        ref_c, ref_i = jax.lax.top_k(ref_counts, tiny_cfg.n_candidates)
        np.testing.assert_array_equal(np.asarray(c_top), np.asarray(ref_c))
        # indices may tie-break differently; counts at those indices match
        np.testing.assert_array_equal(
            np.asarray(ref_counts)[np.asarray(i_top)], np.asarray(ref_c)
        )

        # runtime replication guard (VERDICT r3 task 7): the region is
        # compiled with check_vma=False, so assert at RUNTIME that every
        # shard computed the identical outputs (all_gather + exact
        # equality inside the region itself)
        fg = sharding.sharded_verification(
            tiny_cfg, mesh, replication_check=True
        )
        with mesh:
            c2, i2, repl_ok = fg(Hs, x1, x2, valid)
        assert float(repl_ok) == 1.0
        np.testing.assert_array_equal(np.asarray(c2), np.asarray(c_top))


class TestHypShardedFullFit:
    @pytest.mark.parametrize("verify_subsample", [1, 4])
    def test_full_fit_hyp_sharded_parity(self, tiny_cfg, pairs,
                                         verify_subsample):
        """P3 integrated: the FULL fit with its verification + top-M sharded
        over the hypothesis axis matches the single-device fit exactly
        (same key -> same pool -> same candidates -> same PEARL run) —
        including the two-stage subsampled-ranking + full-res-rescore
        verification (verify_subsample=4), whose gathered pre-selection
        reproduces the unsharded superset and whose rescore+top_k is the
        identical replicated computation."""
        import dataclasses

        import jax.numpy as jnp

        tiny_cfg = dataclasses.replace(
            tiny_cfg, verify_subsample=verify_subsample
        )
        mesh = sharding.make_mesh(jax.devices()[:8], pair_axis=1)
        assert mesh.shape["hyp"] == 8
        cs = pairs[2]
        x1, x2, valid = multih_tpu.pad_points(
            cs.x1, cs.x2, None, tiny_cfg.max_points
        )
        x1, x2, valid = map(jnp.asarray, (x1, x2, valid))
        key = jax.random.key(11)

        f_sh = sharding.hyp_sharded_fit(tiny_cfg, mesh)
        res_sh = f_sh(x1, x2, valid, key)
        res_1 = multih_tpu.make_fit(tiny_cfg)(x1, x2, valid, key)

        np.testing.assert_array_equal(
            np.asarray(res_sh.labels), np.asarray(res_1.labels)
        )
        np.testing.assert_allclose(
            np.asarray(res_sh.homographies),
            np.asarray(res_1.homographies), rtol=2e-4, atol=2e-5,
        )
        # and it actually solves the scene
        err = evaluation.misclassification_error(
            np.asarray(res_sh.labels)[: cs.n_points], cs.gt_labels,
            tiny_cfg.max_labels,
        )
        assert err < 5.0, err

    def test_hypothesize_verify_replication_guard(self, tiny_cfg, pairs):
        """Runtime replication guard for the check_vma=False shard_map
        region inside the fit (pipeline._hypothesize_verify_sharded): the
        region itself all_gathers its outputs and asserts exact equality
        across shards (VERDICT r3 task 7)."""
        import jax.numpy as jnp
        from multih_tpu.models import labeling, pipeline

        mesh = sharding.make_mesh(jax.devices()[:8], pair_axis=1)
        cs = pairs[1]
        x1, x2, valid = multih_tpu.pad_points(
            cs.x1, cs.x2, None, tiny_cfg.max_points
        )
        x1, x2, valid = map(jnp.asarray, (x1, x2, valid))
        nbr_idx, _ = labeling.knn_graph(x1, valid, tiny_cfg.knn_k)
        c, h, n_ok, repl_ok = jax.jit(
            lambda key, x1, x2, valid, nbr:
            pipeline._hypothesize_verify_sharded(
                key, x1, x2, valid, nbr, tiny_cfg, None, mesh,
                replication_check=True,
            )
        )(jax.random.key(7), x1, x2, valid, nbr_idx)
        assert float(repl_ok) == 1.0
        assert c.shape == (tiny_cfg.n_candidates,)

    def test_full_fit_hyp_sharded_parity_fundamental(self):
        """The multi-model extension under the hyp mesh: the fundamental-
        matrix (motion segmentation) fit sharded over the hypothesis axis
        must match the single-device fit exactly — the shard-local
        8-point sampling/solves and the f_* verification kinds reproduce
        the unsharded pool bit-for-bit (same contract as the homography
        path above)."""
        import jax.numpy as jnp

        cfg = multih_tpu.MultiHConfig(
            max_points=128, n_hypotheses=512, n_candidates=64,
            max_labels=8, model="fundamental", residual="sampson",
            inlier_threshold=3.0,
        )
        mesh = sharding.make_mesh(jax.devices()[:8], pair_axis=1)
        cs, _ = data.synthetic_motion_scene(100, 2, 0.1, 0.0, seed=3)
        x1, x2, valid = multih_tpu.pad_points(
            cs.x1, cs.x2, None, cfg.max_points
        )
        x1, x2, valid = map(jnp.asarray, (x1, x2, valid))
        key = jax.random.key(11)

        res_sh = sharding.hyp_sharded_fit(cfg, mesh)(x1, x2, valid, key)
        res_1 = multih_tpu.make_fit(cfg)(x1, x2, valid, key)

        np.testing.assert_array_equal(
            np.asarray(res_sh.labels), np.asarray(res_1.labels)
        )
        np.testing.assert_array_equal(
            np.asarray(res_sh.active), np.asarray(res_1.active)
        )
        gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg.max_points
        )[3]
        err = evaluation.misclassification_error(
            np.asarray(res_sh.labels), gt, cfg.max_labels
        )
        assert int(np.asarray(res_sh.active).sum()) == 2
        assert err < 5.0, err


class TestPerPairTau:
    def test_taus_vector_matches_per_pair_threshold(self, tiny_cfg, pairs):
        """The traced per-pair tau vector must reproduce what separate
        fixed-threshold fits would do: pair i fit at tau_i."""
        mesh = sharding.make_mesh(jax.devices()[:8])
        taus = [3.0, 4.5, 3.0, 6.0, 3.0, 4.5, 3.0, 6.0]
        res = sharding.run_benchmark_batch(
            pairs, tiny_cfg, mesh=mesh, taus=taus
        )
        # reference: unbatched traced-tau fit per pair, same keys
        f = multih_tpu.make_fit_tau(tiny_cfg)
        for i in (1, 3):
            x1, x2, valid = multih_tpu.pad_points(
                pairs[i].x1, pairs[i].x2, None, tiny_cfg.max_points
            )
            ri = f(x1, x2, valid, jax.random.key(i), taus[i])
            np.testing.assert_array_equal(
                res.labels[i], np.asarray(ri.labels)
            )

    def test_adaptive_batch_runs(self, tiny_cfg, pairs):
        """Per-pair self-calibrated thresholds inside the batched program
        (one compile for the whole suite with --adaptive)."""
        mesh = sharding.make_mesh(jax.devices()[:8])
        res = sharding.run_benchmark_batch(
            pairs[:8], tiny_cfg, mesh=mesh, adaptive=True
        )
        assert res.labels.shape == (8, tiny_cfg.max_points)
        # every pair has 2 planes at 10% outliers — self-calibration must
        # find them
        assert (res.active.sum(axis=1) >= 1).all()


class TestWindowSampledSharding:
    def test_full_fit_window_sampling_hyp_sharded_parity(self):
        """cfg.window_sampling under the hyp mesh: each shard computes
        only its contiguous window subset of every round's pool
        (replicated draws, local gathers+solves) and the sharded fit
        stays bit-compatible with the single-device fit."""
        import jax.numpy as jnp

        cfg = multih_tpu.MultiHConfig(
            max_points=512, n_hypotheses=512, n_candidates=64,
            max_labels=8, agree_block=64, window_sampling=True,
        )
        cs = data.synthetic_scene(480, 2, 0.1, 0.5, seed=5)[0]
        x1, x2, valid = multih_tpu.pad_points(
            cs.x1, cs.x2, None, cfg.max_points
        )
        x1, x2, valid = map(jnp.asarray, (x1, x2, valid))
        key = jax.random.key(21)

        mesh = sharding.make_mesh(jax.devices()[:8], pair_axis=1)
        res_sh = sharding.hyp_sharded_fit(cfg, mesh)(x1, x2, valid, key)
        res_1 = multih_tpu.make_fit(cfg)(x1, x2, valid, key)

        np.testing.assert_array_equal(
            np.asarray(res_sh.labels), np.asarray(res_1.labels)
        )
        np.testing.assert_allclose(
            np.asarray(res_sh.homographies),
            np.asarray(res_1.homographies), rtol=2e-4, atol=2e-5,
        )
        err = evaluation.misclassification_error(
            np.asarray(res_sh.labels)[: cs.n_points], cs.gt_labels,
            cfg.max_labels,
        )
        assert err < 5.0, err


class TestPointSharding:
    @pytest.mark.slow
    def test_pt_sharded_fit_parity(self):
        """The point (N) axis sharded over an 8-device 'pt' mesh
        (VERDICT r3 task 3; SURVEY.md §5 long-context second axis): the
        GSPMD-partitioned fit — band blocks per device, one-block halo
        exchange per sweep, all-reduced moment refits — must reproduce
        the single-device segmentation. Labels are asserted EXACTLY;
        energies only to float tolerance (reductions over N reassociate
        across shards — see sharding.pt_sharded_fit's docstring)."""
        import jax.numpy as jnp

        cfg = multih_tpu.MultiHConfig(
            max_points=2048, n_hypotheses=1024, n_candidates=64,
            max_labels=8,
        )
        cs, _ = data.synthetic_scene(1900, 3, 0.1, 0.5, seed=5)
        x1, x2, valid, _gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg.max_points
        )
        mesh = sharding.make_pt_mesh(jax.devices()[:8])
        key = jax.random.key(0)
        res_pt = sharding.pt_sharded_fit(cfg, mesh)(x1, x2, valid, key)
        res_1 = multih_tpu.make_fit(cfg)(
            jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(valid), key
        )
        np.testing.assert_array_equal(
            np.asarray(res_pt.labels), np.asarray(res_1.labels)
        )
        np.testing.assert_array_equal(
            np.asarray(res_pt.active), np.asarray(res_1.active)
        )
        np.testing.assert_allclose(
            float(res_pt.energy), float(res_1.energy), rtol=1e-3
        )
        err = evaluation.misclassification_error(
            np.asarray(res_pt.labels)[: cs.n_points], cs.gt_labels,
            cfg.max_labels,
        )
        assert err < 2.0, err

    def test_pt_mesh_gate_asserted(self):
        """pt_sharded_fit refuses configs that break the banded/windowed
        block decomposition (N not a multiple of agree_block * n_dev)."""
        cfg = multih_tpu.MultiHConfig(max_points=512, n_hypotheses=256)
        mesh = sharding.make_pt_mesh(jax.devices()[:8])
        with pytest.raises(AssertionError):
            sharding.pt_sharded_fit(cfg, mesh)  # 512 < 256*8


class TestMixedSharding:
    """The pair-sharded MIXED path (sharding.sharded_fit_mixed): P4
    batching + P3 pair sharding for the union label space, previously
    exercised only by the driver dryrun (__graft_entry__)."""

    @pytest.fixture(scope="class")
    def mx_cfgs(self):
        cfg_h = multih_tpu.MultiHConfig(
            max_points=256, n_hypotheses=512, n_candidates=64,
            max_labels=4,
        )
        cfg_f = multih_tpu.MultiHConfig(
            max_points=256, n_hypotheses=512, n_candidates=64,
            max_labels=4, model="fundamental", residual="sampson",
            inlier_threshold=3.0,
        )
        return cfg_h, cfg_f

    def _batch(self, cfg_h, noises):
        import jax.numpy as jnp

        xs, gts = [], []
        for b, nz in enumerate(noises):
            cs, _, _ = data.synthetic_mixed_scene(
                220, 1, 1, 0.1, nz, seed=40 + b
            )
            x1, x2, v, g = multih_tpu.pad_points(
                cs.x1, cs.x2, cs.gt_labels, cfg_h.max_points
            )
            xs.append((jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(v)))
            gts.append((g, cs.n_points))
        bx1 = jnp.stack([a for a, _, _ in xs])
        bx2 = jnp.stack([b_ for _, b_, _ in xs])
        bv = jnp.stack([c for _, _, c in xs])
        bk = jax.random.split(jax.random.key(7), len(noises))
        return bx1, bx2, bv, bk, gts

    def test_sharded_mixed_parity_with_single_device(self, mx_cfgs):
        """Same batched mixed program on the 8-device vs the 1-device
        pair mesh: labels and model-activity must match exactly (the
        pair axis is embarrassingly parallel — sharding it must not
        change any pair's numerics)."""
        cfg_h, cfg_f = mx_cfgs
        bx1, bx2, bv, bk, gts = self._batch(cfg_h, [0.5] * 8)
        mesh8 = sharding.make_mesh(jax.devices()[:8])
        mesh1 = sharding.make_mesh(jax.devices()[:1])
        r8 = sharding.sharded_fit_mixed(cfg_h, cfg_f, mesh8)(
            bx1, bx2, bv, bk
        )
        r1 = sharding.sharded_fit_mixed(cfg_h, cfg_f, mesh1)(
            bx1, bx2, bv, bk
        )
        np.testing.assert_array_equal(
            np.asarray(r8.labels), np.asarray(r1.labels)
        )
        np.testing.assert_array_equal(
            np.asarray(r8.active), np.asarray(r1.active)
        )
        k_union = cfg_h.max_labels + cfg_f.max_labels
        for b, (g, n_b) in enumerate(gts):
            err = evaluation.misclassification_error(
                np.asarray(r8.labels[b]), g, k_union
            )
            assert err < 10.0, (b, err)

    def test_adaptive_mixed_batch_runs(self, mx_cfgs):
        """Per-pair per-class threshold self-calibration inside the
        sharded program: one compile serves a batch whose pairs carry
        DIFFERENT noise levels — exactly the situation per-pair taus
        exist for."""
        cfg_h, cfg_f = mx_cfgs
        noises = [0.3, 0.5, 0.8, 1.0, 0.3, 0.5, 0.8, 1.0]
        bx1, bx2, bv, bk, gts = self._batch(cfg_h, noises)
        mesh = sharding.make_mesh(jax.devices()[:8])
        res = sharding.sharded_fit_mixed(
            cfg_h, cfg_f, mesh, adaptive=True
        )(bx1, bx2, bv, bk)
        k_union = cfg_h.max_labels + cfg_f.max_labels
        act = np.asarray(res.active)
        isf = np.asarray(res.is_f)
        for b, (g, n_b) in enumerate(gts):
            err = evaluation.misclassification_error(
                np.asarray(res.labels[b]), g, k_union
            )
            n_h = int(act[b][isf[b] == 0].sum())
            n_f = int(act[b][isf[b] == 1].sum())
            assert (n_h, n_f) == (1, 1), (b, noises[b], n_h, n_f)
            assert err < 12.0, (b, noises[b], err)
