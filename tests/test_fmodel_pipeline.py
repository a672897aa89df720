"""End-to-end multi-motion fitting (model='fundamental'): the multi-model
extension run through the SAME pipeline.fit as the homography problem —
only the minimal solver, residuals, and refit are swapped (ops/fmodel.py).

Thresholds carry measured margins (see git history): the calibration runs
found {M=2 clean: 1.25%, M=3 noisy: 2.25%, M=4: 3.25%, M=5: 5.25%}
misclassification with every motion count exact. Epipolar constraints are
1-D, so a few points near a wrong motion's epipolar line misclassify even
at zero noise — exact-0% is not the right contract for this model class.
"""

import numpy as np
import pytest

import jax

import multih_tpu
from multih_tpu.utils import data, evaluation


def fit_motion_scene(cs, cfg, seed=0):
    x1, x2, valid, gt = multih_tpu.pad_points(
        cs.x1, cs.x2, cs.gt_labels, cfg.max_points
    )
    res = multih_tpu.make_fit(cfg)(x1, x2, valid, jax.random.key(seed))
    err = evaluation.misclassification_error(
        np.asarray(res.labels), gt, cfg.max_labels
    )
    return res, err


@pytest.fixture(scope="module")
def f_cfg():
    return multih_tpu.MultiHConfig(
        max_points=512, n_hypotheses=2048, model="fundamental",
        residual="sampson", inlier_threshold=3.0,
    )


class TestMotionSegmentation:
    def test_two_motions_clean(self, f_cfg):
        cs, _ = data.synthetic_motion_scene(400, 2, 0.1, 0.0, seed=3)
        res, err = fit_motion_scene(cs, f_cfg)
        assert int(np.asarray(res.active).sum()) == 2
        assert err < 3.0, err

    def test_three_motions_noisy_outliers(self, f_cfg):
        cs, _ = data.synthetic_motion_scene(400, 3, 0.2, 0.5, seed=1)
        res, err = fit_motion_scene(cs, f_cfg)
        assert int(np.asarray(res.active).sum()) == 3
        assert err < 5.0, err

    def test_four_motions_no_bridge_collapse(self, f_cfg):
        """The anti-bridging regression test: count-ranked selection
        filled the whole roster with two-motion 'bridge' models and lost
        a motion entirely (24% miscls); marginal-coverage selection +
        Jaccard merge must recover all four motions."""
        cs, _ = data.synthetic_motion_scene(400, 4, 0.1, 0.5, seed=7)
        res, err = fit_motion_scene(cs, f_cfg)
        assert int(np.asarray(res.active).sum()) == 4
        assert err < 6.0, err

    def test_adaptive_tau_noisy(self, f_cfg):
        """Auto-tau for the fundamental model: the probe's member
        residuals are scaled by the F-specific median factor (0.466
        sigma^2 for 1-D Sampson vs 5.85 for the 2-D transfer residual —
        pipeline._noise_median_factor), so a 1 px scene calibrates to
        tau ~ 6 sigma instead of the H-factor's 3.6x underestimate
        (measured here: tau 5.92, err 2.25%)."""
        cs, _ = data.synthetic_motion_scene(400, 3, 0.2, 1.0, seed=1)
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, f_cfg.max_points
        )
        res, tau = multih_tpu.make_fit_adaptive(f_cfg)(
            x1, x2, valid, jax.random.key(0)
        )
        assert 4.5 < float(tau) < 7.5, float(tau)
        assert int(np.asarray(res.active).sum()) == 3
        err = evaluation.misclassification_error(
            np.asarray(res.labels), gt, f_cfg.max_labels
        )
        assert err < 5.0, err

    def test_all_outliers_finds_nothing(self, f_cfg):
        rng = np.random.default_rng(5)
        cs = data.CorrespondenceSet(
            rng.uniform(0, 640, (300, 2)).astype(np.float32),
            rng.uniform(0, 640, (300, 2)).astype(np.float32),
            np.zeros(300, np.int32), "outliers",
        )
        res, _ = fit_motion_scene(cs, f_cfg)
        assert int(np.asarray(res.active).sum()) == 0

    def test_rank_residual_transfer(self, f_cfg):
        """Forward-only (one-sided epipolar) ranking sweeps with full
        Sampson rescore: same structure recovered (the rank kind only
        picks supersets that are re-scored at full fidelity)."""
        import dataclasses

        cs, _ = data.synthetic_motion_scene(400, 2, 0.1, 0.0, seed=3)
        cfg_rr = dataclasses.replace(
            f_cfg, verify_subsample=4, verify_rescore=4,
            claim_subsample=2, rank_residual="transfer",
        )
        res, err = fit_motion_scene(cs, cfg_rr)
        assert int(np.asarray(res.active).sum()) == 2
        assert err < 4.0, err


class TestConfigGuards:
    def test_window_sampling_rejected(self):
        with pytest.raises(ValueError, match="window_sampling"):
            multih_tpu.MultiHConfig(model="fundamental",
                                    window_sampling=True)

    def test_affines_rejected(self, f_cfg):
        cs, _ = data.synthetic_motion_scene(400, 2, 0.1, 0.0, seed=3)
        x1, x2, valid, _ = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, f_cfg.max_points
        )
        aff = np.broadcast_to(np.eye(2, dtype=np.float32),
                              (f_cfg.max_points, 2, 2))
        from multih_tpu.models import pipeline

        with pytest.raises(ValueError, match="affine"):
            pipeline.fit(x1, x2, valid, jax.random.key(0), f_cfg,
                         affines=aff)
