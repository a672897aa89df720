"""End-to-end pipeline tests (SURVEY.md §4 'integration'):
- synthetic noise-free 2-plane scene -> exact recovery (BASELINE.json:8)
- robustness to outliers / plane counts
- padding invariance, determinism
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import multih_tpu
from multih_tpu.utils import data, evaluation


def fit_scene(cs, cfg, seed=0):
    x1, x2, valid, gt = multih_tpu.pad_points(
        cs.x1, cs.x2, cs.gt_labels, cfg.max_points
    )
    f = multih_tpu.make_fit(cfg)
    res = f(x1, x2, valid, jax.random.key(seed))
    err = evaluation.misclassification_error(
        np.asarray(res.labels), gt, cfg.max_labels
    )
    return res, err


@pytest.fixture(scope="module")
def small_cfg():
    return multih_tpu.MultiHConfig(max_points=512, n_hypotheses=1024)


class TestExactRecovery:
    def test_noise_free_two_planes(self, small_cfg):
        """BASELINE.json:8: exact label and H recovery on a clean scene."""
        cs, H_true = data.synthetic_scene(
            n_points=400, n_planes=2, outlier_rate=0.0, noise_px=0.0, seed=1
        )
        res, err = fit_scene(cs, small_cfg)
        assert err == 0.0
        active = np.asarray(res.active)
        assert int(active.sum()) == 2
        # recovered homographies match truth to fp32 accuracy
        Hf = np.asarray(res.homographies)[active > 0]
        for p in range(2):
            Ht = H_true[p] / np.linalg.norm(H_true[p])
            d = min(
                np.abs(h / np.linalg.norm(h) - Ht).max() for h in Hf
            )
            assert d < 1e-4, (p, d)

    def test_noisy_with_outliers(self, small_cfg):
        cs, _ = data.synthetic_scene(
            n_points=400, n_planes=2, outlier_rate=0.1, noise_px=0.5, seed=3
        )
        res, err = fit_scene(cs, small_cfg)
        assert int(np.asarray(res.active).sum()) == 2
        assert err < 3.0, err

    def test_single_plane(self, small_cfg):
        cs, _ = data.synthetic_scene(
            n_points=300, n_planes=1, outlier_rate=0.2, noise_px=0.5, seed=11
        )
        res, err = fit_scene(cs, small_cfg)
        assert int(np.asarray(res.active).sum()) == 1
        assert err < 3.0, err

    def test_verify_subsample_two_stage(self, small_cfg):
        """cfg.verify_subsample > 1: pool ranking on a Morton-strided
        subsample with full-res rescoring of the top superset must
        recover the same scene structure as exact ranking (the selected
        candidates always carry exact counts by construction)."""
        import dataclasses

        cs, _ = data.synthetic_scene(
            n_points=400, n_planes=3, outlier_rate=0.2, noise_px=0.5,
            seed=7,
        )
        res_ref, err_ref = fit_scene(cs, small_cfg)
        cfg_ss = dataclasses.replace(
            small_cfg, verify_subsample=4, verify_rescore=4
        )
        res_ss, err_ss = fit_scene(cs, cfg_ss)
        assert int(np.asarray(res_ss.active).sum()) == int(
            np.asarray(res_ref.active).sum()
        )
        assert err_ss < err_ref + 1.0, (err_ss, err_ref)

    def test_rank_residual_transfer(self, small_cfg):
        """cfg.rank_residual='transfer': forward-only ranking sweeps (the
        claim pick and the verify pre-pass) with full-`residual` rescore
        must recover the same structure — the rank kind only chooses
        supersets that are re-scored/re-grown at full fidelity."""
        import dataclasses

        cs, _ = data.synthetic_scene(
            n_points=400, n_planes=3, outlier_rate=0.2, noise_px=0.5,
            seed=7,
        )
        res_ref, err_ref = fit_scene(cs, small_cfg)
        cfg_rr = dataclasses.replace(
            small_cfg, verify_subsample=4, verify_rescore=4,
            claim_subsample=2, rank_residual="transfer",
        )
        res_rr, err_rr = fit_scene(cs, cfg_rr)
        assert int(np.asarray(res_rr.active).sum()) == int(
            np.asarray(res_ref.active).sum()
        )
        assert err_rr < err_ref + 1.0, (err_rr, err_ref)

    def test_all_outliers_finds_nothing(self, small_cfg):
        rng = np.random.default_rng(5)
        cs = data.CorrespondenceSet(
            rng.uniform(0, 640, (300, 2)).astype(np.float32),
            rng.uniform(0, 640, (300, 2)).astype(np.float32),
            np.zeros(300, np.int32),
            "allout",
        )
        res, err = fit_scene(cs, small_cfg)
        assert int(np.asarray(res.active).sum()) == 0
        assert err == 0.0


class TestInvariances:
    def test_deterministic(self, small_cfg):
        cs, _ = data.synthetic_scene(300, 2, 0.1, 0.5, seed=7)
        res1, _ = fit_scene(cs, small_cfg, seed=0)
        res2, _ = fit_scene(cs, small_cfg, seed=0)
        np.testing.assert_array_equal(
            np.asarray(res1.labels), np.asarray(res2.labels)
        )

    def test_padding_invariance(self):
        """Same scene fit at two padded sizes gives the same labeling."""
        cs, _ = data.synthetic_scene(200, 2, 0.05, 0.3, seed=13)
        cfg_a = multih_tpu.MultiHConfig(max_points=256, n_hypotheses=1024)
        cfg_b = multih_tpu.MultiHConfig(max_points=512, n_hypotheses=1024)
        _, err_a = fit_scene(cs, cfg_a)
        _, err_b = fit_scene(cs, cfg_b)
        # identical labels are not guaranteed (sampling differs with the
        # padded shape) but both must solve the scene
        assert err_a < 3.0 and err_b < 3.0

    def test_energy_nonincreasing_tail(self, small_cfg):
        """PEARL energy trace should settle (no oscillation at the end)."""
        cs, _ = data.synthetic_scene(400, 3, 0.1, 0.5, seed=17)
        res, _ = fit_scene(cs, small_cfg)
        tr = np.asarray(res.energy_trace)
        assert tr[-1] <= tr[0] + 1e-3
        assert abs(tr[-1] - tr[-2]) < max(0.05 * abs(tr[-1]), 5.0)


class TestResultContract:
    def test_shapes_and_types(self, small_cfg):
        cs, _ = data.synthetic_scene(100, 2, 0.0, 0.0, seed=2)
        res, _ = fit_scene(cs, small_cfg)
        k, n = small_cfg.max_labels, small_cfg.max_points
        assert res.labels.shape == (n,)
        assert res.labels.dtype == jnp.int32
        assert res.homographies.shape == (k, 3, 3)
        assert res.active.shape == (k,)
        assert res.support.shape == (k,)
        assert res.energy_trace.shape == (small_cfg.pearl_iterations,)
        # padded points carry the outlier label
        assert np.all(np.asarray(res.labels)[100:] == k)
        # labels on inactive planes never appear
        lab = np.asarray(res.labels)
        act = np.asarray(res.active)
        for l in set(lab.tolist()):
            if l < k:
                assert act[l] > 0


class TestAffinePath:
    def test_fit_with_affine_hypotheses(self, small_cfg):
        """The paper's C4+C5 path: F + per-point affine frames feed
        one-point hypotheses into the pool (Multi-H paper §3.1)."""
        import jax
        from multih_tpu.utils import features

        cs, H_true = data.synthetic_scene(
            n_points=300, n_planes=2, outlier_rate=0.1, noise_px=0.3,
            seed=21,
        )
        affines = features.affines_from_homographies(
            H_true, cs.gt_labels - 1, cs.x1, outlier_label=-1
        )
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, small_cfg.max_points
        )
        aff = np.zeros((small_cfg.max_points, 2, 2), np.float32)
        aff[: cs.n_points] = affines
        aff[cs.n_points:] = np.eye(2)

        import functools
        from multih_tpu.models import pipeline

        f = jax.jit(functools.partial(pipeline.fit, cfg=small_cfg))
        res = f(x1, x2, valid, jax.random.key(0), affines=jnp.asarray(aff))
        err = evaluation.misclassification_error(
            np.asarray(res.labels), gt, small_cfg.max_labels
        )
        assert int(np.asarray(res.active).sum()) == 2
        assert err < 3.0, err


class TestAdaptiveTau:
    def test_recovers_from_wrong_static_tau(self):
        """Auto-tau (fit_adaptive): a probe pass estimates the noise from
        plane-member residuals; the noise-1px scene is unsolvable at the
        default tau=3 but solves at the estimated tau~6."""
        cfg = multih_tpu.MultiHConfig(max_points=512, n_hypotheses=2048)
        cs, _ = data.synthetic_scene(400, 3, 0.15, 1.0, seed=117)
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, 512
        )
        f = multih_tpu.make_fit_adaptive(cfg)
        res, tau = f(x1, x2, valid, jax.random.key(0))
        assert 4.5 < float(tau) < 7.5, float(tau)
        err = evaluation.misclassification_error(
            np.asarray(res.labels), gt, cfg.max_labels
        )
        assert err < 3.0, err
        assert int(np.asarray(res.active).sum()) == 3

    def test_estimate_matches_noise_floor(self):
        """Low-noise scenes hit the 3 px floor."""
        cfg = multih_tpu.MultiHConfig(max_points=256, n_hypotheses=1024)
        cs, _ = data.synthetic_scene(200, 2, 0.05, 0.2, seed=9)
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, 256
        )
        f = multih_tpu.make_fit_adaptive(cfg)
        res, tau = f(x1, x2, valid, jax.random.key(0))
        assert abs(float(tau) - 3.0) < 0.5, float(tau)


class TestFitTau:
    def test_traced_tau_matches_static_threshold(self, small_cfg):
        """make_fit_tau with tau == cfg.inlier_threshold reproduces the
        static-threshold fit exactly — one executable serves any tau
        (restarts under a frozen auto-calibrated tau, threshold sweeps)."""
        cs, _ = data.synthetic_scene(400, 2, 0.1, 0.5, seed=11)
        x1, x2, valid, _ = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, small_cfg.max_points
        )
        key = jax.random.key(5)
        res_static = multih_tpu.make_fit(small_cfg)(x1, x2, valid, key)
        res_traced = multih_tpu.make_fit_tau(small_cfg)(
            x1, x2, valid, key, jnp.asarray(small_cfg.inlier_threshold)
        )
        np.testing.assert_array_equal(
            np.asarray(res_static.labels), np.asarray(res_traced.labels)
        )
