"""Mixed multi-class fitting (models/mixed.py): homographies AND
fundamental matrices in one label space — the multi-model extension's
capstone (above SURVEY.md §2 parity; see the module docstring for the
containment-asymmetry design rationale).

Accuracy contracts follow the fundamental-model suite's calibration
style (tests/test_fmodel_pipeline.py): epipolar constraints are 1-D, so
exact-0% is not the right bar for the motion half of a mixed scene."""

import numpy as np
import pytest

import jax

import multih_tpu
from multih_tpu.models import mixed
from multih_tpu.utils import data, evaluation


@pytest.fixture(scope="module")
def cfgs():
    cfg_h = multih_tpu.MultiHConfig(
        max_points=640, n_hypotheses=2048, max_labels=8,
    )
    cfg_f = multih_tpu.MultiHConfig(
        max_points=640, n_hypotheses=2048, max_labels=8,
        model="fundamental", residual="sampson", inlier_threshold=3.0,
    )
    return cfg_h, cfg_f


def run_mixed(cs, cfg_h, cfg_f, seed=0, **kw):
    x1, x2, valid, gt = multih_tpu.pad_points(
        cs.x1, cs.x2, cs.gt_labels, cfg_h.max_points
    )
    f = mixed.make_fit_mixed(cfg_h, cfg_f, **kw)
    res = f(x1, x2, valid, jax.random.key(seed))
    k_union = cfg_h.max_labels + cfg_f.max_labels
    err = evaluation.misclassification_error(
        np.asarray(res.labels), gt, k_union
    )
    return res, err, gt


def class_counts(res, cfg_h):
    act = np.asarray(res.active)
    is_f = np.asarray(res.is_f)
    return int(act[is_f == 0].sum()), int(act[is_f == 1].sum())


class TestMixedScene:
    def test_planes_plus_motion(self, cfgs):
        """2 planes + 1 non-planar rigid motion + 10% outliers: both
        classes recovered, each GT structure matched by a model of the
        RIGHT class, misclassification within the motion-suite bar."""
        cfg_h, cfg_f = cfgs
        cs, _, _ = data.synthetic_mixed_scene(
            600, 2, 1, 0.1, 0.5, seed=4
        )
        res, err, gt = run_mixed(cs, cfg_h, cfg_f, seed=0)
        n_h, n_f = class_counts(res, cfg_h)
        assert n_h == 2, (n_h, n_f)
        assert n_f == 1, (n_h, n_f)
        assert err < 6.0, err
        # class consistency of the optimal label matching: every matched
        # (pred, gt) pair must pair a plane label with a GT plane and a
        # motion label with a GT motion (Hungarian is class-blind, so
        # this is a real check, not a tautology)
        k_union = cfg_h.max_labels + cfg_f.max_labels
        mapping = evaluation.match_labels(
            np.asarray(res.labels), gt, k_union
        )
        for p, g in mapping.items():
            if p == k_union or g == 0:
                continue
            pred_is_f = p >= cfg_h.max_labels
            gt_is_f = g > 2  # GT: 1..2 planes, 3 motion
            assert pred_is_f == gt_is_f, (mapping, p, g)

    def test_two_motions_two_planes(self, cfgs):
        cfg_h, cfg_f = cfgs
        cs, _, _ = data.synthetic_mixed_scene(
            600, 2, 2, 0.1, 0.5, seed=11
        )
        res, err, _ = run_mixed(cs, cfg_h, cfg_f, seed=1)
        n_h, n_f = class_counts(res, cfg_h)
        assert n_h == 2, (n_h, n_f)
        assert n_f == 2, (n_h, n_f)
        assert err < 8.0, err

    def test_pure_plane_scene_spawns_no_motions(self, cfgs):
        """Containment asymmetry guard: on an all-planar scene the motion
        stage sees only leftovers/outliers and must surface NOTHING —
        an F 'bridging' the planes' points would be the classic mixed-
        fitting failure (module docstring)."""
        cfg_h, cfg_f = cfgs
        cs, _ = data.synthetic_scene(500, 3, 0.1, 0.5, seed=2)
        res, err, _ = run_mixed(cs, cfg_h, cfg_f, seed=0)
        n_h, n_f = class_counts(res, cfg_h)
        assert n_h == 3, (n_h, n_f)
        assert n_f == 0, (n_h, n_f)
        assert err < 3.0, err

    def test_pure_motion_scene(self, cfgs):
        """All-motion scene: planes may legitimately claim near-planar
        slices of a 3D blob, but the dominant structure must land in the
        motion class and overall accuracy must hold."""
        cfg_h, cfg_f = cfgs
        cs, _, _ = data.synthetic_mixed_scene(
            500, 0, 2, 0.1, 0.5, seed=6
        )
        res, err, _ = run_mixed(cs, cfg_h, cfg_f, seed=0)
        _, n_f = class_counts(res, cfg_h)
        assert n_f == 2, np.asarray(res.active)
        assert err < 8.0, err

    def test_polish_zero_equals_sequential(self, cfgs):
        """polish=0 degenerates to the pure sequential composition: the
        H-stage labels survive verbatim where planes claimed points."""
        cfg_h, cfg_f = cfgs
        cs, _, _ = data.synthetic_mixed_scene(400, 1, 1, 0.1, 0.0, seed=9)
        x1, x2, valid, _ = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg_h.max_points
        )
        res = mixed.make_fit_mixed(
            cfg_h, cfg_f, polish_meanfield=0, polish_icm=0
        )(x1, x2, valid, jax.random.key(0))
        lab_h = np.asarray(res.result_h.labels)
        lab = np.asarray(res.labels)
        on_plane = lab_h < cfg_h.max_labels
        # active-plane members keep their stage-1 label exactly
        act = np.asarray(res.active)
        kept = on_plane & (act[np.clip(lab_h, 0, act.size - 1)] > 0)
        np.testing.assert_array_equal(lab[kept], lab_h[kept])

    def test_traced_tau_matches_static(self, cfgs):
        """make_fit_mixed_tau at the configs' static thresholds
        reproduces make_fit_mixed exactly — one executable serves any
        (tau_h, tau_f) pair (the CLI's restarts under frozen
        auto-calibrated taus ride this)."""
        import jax.numpy as jnp

        cfg_h, cfg_f = cfgs
        cs, _, _ = data.synthetic_mixed_scene(400, 1, 1, 0.1, 0.5, seed=3)
        x1, x2, valid, _ = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg_h.max_points
        )
        key = jax.random.key(2)
        res_s = mixed.make_fit_mixed(cfg_h, cfg_f)(x1, x2, valid, key)
        res_t = mixed.make_fit_mixed_tau(cfg_h, cfg_f)(
            x1, x2, valid, key,
            jnp.asarray(cfg_h.inlier_threshold, jnp.float32),
            jnp.asarray(cfg_f.inlier_threshold, jnp.float32),
        )
        np.testing.assert_array_equal(
            np.asarray(res_s.labels), np.asarray(res_t.labels)
        )

    def test_support_and_labels_consistent(self, cfgs):
        cfg_h, cfg_f = cfgs
        cs, _, _ = data.synthetic_mixed_scene(400, 1, 1, 0.1, 0.5, seed=3)
        res, _, _ = run_mixed(cs, cfg_h, cfg_f, seed=2)
        lab = np.asarray(res.labels)
        sup = np.asarray(res.support)
        act = np.asarray(res.active)
        k_union = cfg_h.max_labels + cfg_f.max_labels
        for l in range(k_union):
            n_l = int(np.sum(lab == l))
            if act[l] > 0:
                assert n_l == int(sup[l]), (l, n_l, sup[l])
                assert n_l >= min(cfg_h.min_inliers, cfg_f.min_inliers)
            else:
                assert n_l == 0, (l, n_l)


class TestMixedAdaptiveTau:
    """Per-class self-calibrated thresholds (mixed.fit_mixed_adaptive):
    two single-class probes -> shared-noise sigma from the per-model
    residual-median minimum -> tau_c = 6 sigma (see
    estimate_tau_mixed's docstring for why the probe must NOT be a
    mixed fit). Bounds carry measured margins: the calibration runs
    found {sigma=1.0 seed 11: taus 5.63/5.63, err 0.67; sigma=0.2
    seed 3: floors 3.0/1.5, err 0.33; sigma=1.0 seed 4: taus 5.0/5.0,
    err 0.67 where fixed tau=3 scores 12.67}."""

    def test_noisy_scene_beats_static_tau(self, cfgs):
        """sigma=1 px: the default tau=3 loses both planes to the motion
        class (measured 5.67%); the calibrated ~6 sigma taus recover the
        full 2-plane + 1-motion structure."""
        cfg_h, cfg_f = cfgs
        cs, _, _ = data.synthetic_mixed_scene(600, 2, 1, 0.1, 1.0, seed=11)
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg_h.max_points
        )
        res, tau_h, tau_f = mixed.make_fit_mixed_adaptive(cfg_h, cfg_f)(
            x1, x2, valid, jax.random.key(0)
        )
        assert 4.5 < float(tau_h) < 7.5, float(tau_h)
        assert 4.0 < float(tau_f) < 7.5, float(tau_f)
        n_h, n_f = class_counts(res, cfg_h)
        assert (n_h, n_f) == (2, 1), (n_h, n_f)
        err = evaluation.misclassification_error(
            np.asarray(res.labels), gt,
            cfg_h.max_labels + cfg_f.max_labels,
        )
        assert err < 3.0, err

    def test_low_noise_hits_per_class_floors(self, cfgs):
        """sigma=0.2 px: both taus clip to their per-class floors (3 px
        for the 2-D transfer threshold, 1.5 for the 1-D epipolar one)
        and accuracy matches the static fit."""
        cfg_h, cfg_f = cfgs
        cs, _, _ = data.synthetic_mixed_scene(600, 2, 1, 0.1, 0.2, seed=3)
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg_h.max_points
        )
        res, tau_h, tau_f = mixed.make_fit_mixed_adaptive(cfg_h, cfg_f)(
            x1, x2, valid, jax.random.key(0)
        )
        assert abs(float(tau_h) - 3.0) < 1e-5, float(tau_h)
        assert float(tau_f) <= 2.0, float(tau_f)
        n_h, n_f = class_counts(res, cfg_h)
        assert (n_h, n_f) == (2, 1), (n_h, n_f)
        err = evaluation.misclassification_error(
            np.asarray(res.labels), gt,
            cfg_h.max_labels + cfg_f.max_labels,
        )
        assert err < 3.0, err

    def test_pure_plane_scene_still_spawns_no_motions(self, cfgs):
        """The containment guard must survive calibration: an adaptive
        fit on an all-planar scene spawns no fundamental matrices."""
        cfg_h, cfg_f = cfgs
        cs, _ = data.synthetic_scene(500, 3, 0.1, 0.5, seed=2)
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg_h.max_points
        )
        res, tau_h, tau_f = mixed.make_fit_mixed_adaptive(cfg_h, cfg_f)(
            x1, x2, valid, jax.random.key(0)
        )
        n_h, n_f = class_counts(res, cfg_h)
        assert (n_h, n_f) == (3, 0), (n_h, n_f)
        err = evaluation.misclassification_error(
            np.asarray(res.labels), gt,
            cfg_h.max_labels + cfg_f.max_labels,
        )
        assert err < 3.0, err


class TestSigmaEstimator:
    """Fast unit tier for the shared-noise machinery (the full-tier
    class above certifies it end-to-end)."""

    def test_per_model_sigma_reads_each_models_own_members(self):
        """Hand-built residuals/labels: each model's sigma comes from
        the median of ITS members only, under-membered models are
        disqualified, and padded points are excluded."""
        import jax.numpy as jnp

        k, n = 3, 40
        labels = np.full(n, k, np.int32)
        labels[:20] = 0          # model 0: 20 members
        labels[20:25] = 1        # model 1: 5 members (< min_inliers)
        r = np.zeros((k, n), np.float32)
        r[0, :20] = 4.0          # median r^2 = 4 -> sigma = 2/sqrt(f)
        r[1, 20:25] = 100.0
        valid = np.ones(n, np.float32)
        valid[-8:] = 0.0         # padded points carry label k anyway
        from multih_tpu.models.mixed import _per_model_sigma

        sigma, ok = _per_model_sigma(
            jnp.asarray(r), jnp.asarray(labels), jnp.asarray(valid),
            k, factor=1.0, min_inliers=10,
        )
        assert np.asarray(ok).tolist() == [True, False, False]
        assert abs(float(sigma[0]) - 2.0) < 1e-5, np.asarray(sigma)

    def test_shared_minimum_and_fallback(self):
        """estimate_tau_mixed takes the min over BOTH classes' qualified
        models (contaminated models only over-estimate) and falls back
        to the static thresholds when nothing qualifies."""
        import jax.numpy as jnp

        from multih_tpu.models import mixed, pipeline
        from multih_tpu.models.pipeline import FitResult

        cfg_h = multih_tpu.MultiHConfig(max_points=64, max_labels=2,
                                        min_inliers=10)
        cfg_f = multih_tpu.MultiHConfig(
            max_points=64, max_labels=2, min_inliers=10,
            model="fundamental", residual="sampson",
            inlier_threshold=3.0,
        )
        n = 64
        rng = np.random.default_rng(0)
        x1 = jnp.asarray(rng.uniform(0, 100, (n, 2)).astype(np.float32))
        valid = jnp.ones((n,), jnp.float32)

        def mk(labels):
            z = jnp.zeros
            return FitResult(
                labels=jnp.asarray(labels, jnp.int32),
                homographies=jnp.eye(3, dtype=jnp.float32)[None].repeat(
                    2, 0
                ),
                active=jnp.ones((2,), jnp.float32),
                support=z((2,)), energy=z(()), energy_trace=z((1,)),
                n_hypotheses_ok=jnp.zeros((), jnp.int32),
                n_far_dropped=jnp.zeros((), jnp.int32),
            )

        # identity H on x1==x2 -> zero residuals -> sigma ~ 0 -> floors
        res_h = mk(np.r_[np.zeros(32), np.full(32, 2)])
        res_f = mk(np.full(n, 2))  # no F members: H side must carry it
        tau_h, tau_f = mixed.estimate_tau_mixed(
            res_h, res_f, x1, x1, valid, cfg_h, cfg_f
        )
        assert abs(float(tau_h) - 3.0) < 1e-5, float(tau_h)
        assert abs(float(tau_f) - 1.5) < 1e-5, float(tau_f)

        # nothing qualifies anywhere -> both static thresholds
        res_none = mk(np.full(n, 2))
        tau_h, tau_f = mixed.estimate_tau_mixed(
            res_none, res_none, x1, x1, valid, cfg_h, cfg_f
        )
        assert abs(float(tau_h) - cfg_h.inlier_threshold) < 1e-5
        assert abs(float(tau_f) - cfg_f.inlier_threshold) < 1e-5

    def test_factor_table_per_model_class(self):
        """The measured median factors behind every adaptive path."""
        cfg_h = multih_tpu.MultiHConfig()
        cfg_fs = multih_tpu.MultiHConfig(model="fundamental",
                                         residual="sampson")
        cfg_fy = multih_tpu.MultiHConfig(model="fundamental",
                                         residual="symmetric")
        from multih_tpu.models.pipeline import _noise_median_factor

        assert _noise_median_factor(cfg_h) == 5.85
        assert _noise_median_factor(cfg_fs) == 0.466
        assert _noise_median_factor(cfg_fy) == 1.874
