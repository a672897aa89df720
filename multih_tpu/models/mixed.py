"""Mixed multi-class model fitting: homographies AND fundamental matrices
in one label space (above-parity extension; SURVEY.md §2 lists the
reference's scope as homographies only — this module is the natural
capstone of the multi-model extension, in the spirit of the reference
author's own follow-up work on multi-class model fitting).

The problem: a dynamic two-view scene contains planar structures (each
explained by a homography, a codimension-2 constraint on the 4D
correspondence space) and independently moving non-planar rigid bodies
(each explained by a fundamental matrix, codimension-1). A single-class
fit mislabels the other class's points as outliers — or worse, a
fundamental matrix "bridges" a plane plus clutter, because **every
H-consistent point is also consistent with some F** (F = [e']x H for any
epipole e'). That containment asymmetry is the crux of mixed fitting and
drives both design choices below:

1. **Specific model first; both stages see every point.** Planes are
   fit first on all points; fundamental matrices are then fit on all
   points too (`f_scope="all"`, the measured default) — the containment
   asymmetry is resolved in the ASSIGNMENT (the polish's `f_bias` makes
   an equally-fitting H strictly cheaper than an F, so plane-covering
   Fs starve and die to the label-cost prune), not by masking the F
   stage to the plane remainder. The `f_scope="remainder"` variant
   (fit motions only on points the planes left) looks safer but
   measured WORSE on the mixed suite (mean 7.0% vs 4.2%): planes
   legitimately claim near-planar slices of motion blobs, and the
   depleted remainder fragments the motions — the F stage then misses
   or bridges them, and no later stage can resurrect a motion whose F
   was never fit. On pure-plane scenes the "all" F stage surfaces
   nothing anyway (its own label-cost prune clears plane-bridging Fs).
2. **Joint PEARL polish with a GRIC-style class penalty.** After both
   fits, one mean-field + ICM labeling pass runs over the UNION label
   space (labeling is model-agnostic given residuals — the same
   machinery as the single-class PEARL loop, models.labeling). Residuals
   enter in per-class threshold units, and fundamental labels carry a
   constant per-point penalty `f_bias` (Torr's GRIC penalizes model
   dimension exactly so the more specific model wins ties; an H that
   fits is always preferred to an F that fits equally well). The polish
   is what makes the result *joint*: boundary points get reassigned
   across classes under the shared spatial smoothness prior instead of
   being frozen by the sequential order.

Both stages trace into ONE XLA program (`make_fit_mixed`): two `fit()`
calls plus the polish — no host round-trips (SURVEY.md §3.1 'one XLA
program' contract carries over).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from multih_tpu.config import MultiHConfig
from multih_tpu.models import labeling, pipeline
from multih_tpu.ops import fmodel, geometry


class MixedFitResult(NamedTuple):
    """Union-label-space analog of FitResult.

    Label convention: 0..Kh-1 = planes (homographies), Kh..Kh+Kf-1 =
    motions (fundamental matrices), Kh+Kf = outlier, where
    Kh = cfg_h.max_labels and Kf = cfg_f.max_labels.
    """

    labels: jax.Array     # (N,) int32 in [0, Kh+Kf]
    models: jax.Array     # (Kh+Kf, 3, 3) — H's then F's, ||.||_F = 1
    is_f: jax.Array       # (Kh+Kf,) float {0,1}: 1 = fundamental matrix
    active: jax.Array     # (Kh+Kf,) float {0,1}
    support: jax.Array    # (Kh+Kf,) float — member count per model
    energy: jax.Array     # scalar — joint MRF energy of the final labels
    result_h: pipeline.FitResult   # the plane stage, full diagnostics
    result_f: pipeline.FitResult   # the motion stage, full diagnostics


def _joint_residual_units(res_h, res_f, x1, x2, cfg_h: MultiHConfig,
                          cfg_f: MultiHConfig, tau_h=None, tau_f=None):
    """(Kh+Kf, N) squared residuals in per-class THRESHOLD UNITS (r/tau)^2
    — the only scale on which a 2-D transfer distance and a 1-D epipolar
    distance are comparable as data costs."""
    thr_h = pipeline._thr(cfg_h, tau_h, x1.dtype)
    thr_f = pipeline._thr(cfg_f, tau_f, x1.dtype)
    r_h = geometry.residual_matrix(
        res_h.homographies, x1, x2, cfg_h.residual
    ) / thr_h
    r_f = fmodel.residual_matrix_f(
        res_f.homographies, x1, x2, cfg_f.residual
    ) / thr_f
    return jnp.concatenate([r_h, r_f], axis=0)


def fit_mixed(x1, x2, valid, key, cfg_h: MultiHConfig,
              cfg_f: MultiHConfig, f_bias: float = 0.5,
              polish_meanfield: int = 4, polish_icm: int = 2,
              tau_h=None, tau_f=None,
              f_scope: str = "all",
              polish_refits: int = 2) -> MixedFitResult:
    """Mixed plane + motion segmentation of one correspondence set.

    Args:
      x1, x2, valid, key: as `pipeline.fit` (static max_points shapes).
      cfg_h: homography-stage config (`model="homography"`).
      cfg_f: fundamental-stage config (`model="fundamental"`). Label
        capacities may differ; the union space is Kh + Kf (+ outlier).
      f_bias: GRIC-style class penalty, in units of cfg_h.outlier_cost,
        added to every fundamental label's data cost during the joint
        polish. 0 disables class preference (epipolar labels then win
        any tie, and since H-inliers are F-consistent, planes bleed into
        motions). Default 0.5, from a {0.35, 0.5, 0.65, 0.8} sweep on
        the mixed suite (oracle, 6 scenes): it must EXCEED the typical
        inlier residual in threshold units (~0.16 at 0.5 px noise /
        tau 3 — below that, a plane's members switch to an overfitting
        per-plane F almost for free and the label-cost prune kills the
        H instead of the F: 0.35 loses a whole plane on the pure-plane
        scene) while staying well below the outlier cost (above ~0.65
        true motions start losing boundary members to the outlier label
        and whole motions die: 0.65 drops a motion on two scenes). The
        usable window is wide against noise (0.16) but the cliff above
        is real — re-run the sweep if outlier_cost or the residual
        normalization changes.
      polish_meanfield / polish_icm: joint-polish sweep counts. The
        polish starts from the sequential labeling, so a few sweeps
        suffice; 0 mean-field + 0 ICM degenerates to the pure
        sequential composition.
      tau_h / tau_f: optional traced per-class thresholds (px),
        overriding the configs without recompilation.
      f_scope: "all" (default) fits the motion stage on every point;
        "remainder" masks it to the points the plane stage left
        unexplained (the measured A/B is in the module docstring).
      polish_refits: refit-alternation rounds on the motion half after
        the label-cost prune (Tukey moment refit + ICM reassignment) —
        re-grows Fs the stages fit on truncated member sets (see the
        inline rationale).

    Returns MixedFitResult (see label convention on the class).
    """
    if cfg_h.model != "homography":
        raise ValueError("cfg_h must have model='homography'")
    if cfg_f.model != "fundamental":
        raise ValueError("cfg_f must have model='fundamental'")
    kh, kf = cfg_h.max_labels, cfg_f.max_labels
    k_union = kh + kf
    k1, k2 = jax.random.split(key)

    # stage 1: planes on everything (the stricter, codim-2 model first)
    with jax.named_scope("mixed_fit_h"):
        res_h = pipeline.fit(x1, x2, valid, k1, cfg_h, tau=tau_h)
    explained_h = (res_h.labels < kh).astype(x1.dtype)

    # stage 2: motions. f_scope="remainder" fits them only on the points
    # the planes left unexplained (never compete with planes for points a
    # homography already explains); f_scope="all" fits them on everything
    # and leaves the containment asymmetry to the polish's f_bias — the
    # A/B between the two is measured on the mx suite (docs/PERF.md).
    with jax.named_scope("mixed_fit_f"):
        valid_f = valid if f_scope == "all" else (
            valid * (1.0 - explained_h)
        )
        res_f = pipeline.fit(x1, x2, valid_f, k2, cfg_f, tau=tau_f)

    models = jnp.concatenate(
        [res_h.homographies, res_f.homographies], axis=0
    )
    is_f = jnp.concatenate(
        [jnp.zeros((kh,), x1.dtype), jnp.ones((kf,), x1.dtype)]
    )
    active = jnp.concatenate([res_h.active, res_f.active], axis=0)

    # sequential composition of the two label fields (polish start)
    lab_seq = jnp.where(
        res_h.labels < kh,
        res_h.labels,
        jnp.where(res_f.labels < kf, kh + res_f.labels, k_union),
    ).astype(jnp.int32)

    # joint polish over the union label space: same spatial Potts prior,
    # residuals in threshold units, class penalty on the codim-1 labels
    with jax.named_scope("mixed_polish"):
        r = _joint_residual_units(
            res_h, res_f, x1, x2, cfg_h, cfg_f, tau_h, tau_f
        )
        one = jnp.asarray(1.0, x1.dtype)
        bias = f_bias * cfg_h.outlier_cost
        bias_row = jnp.concatenate(
            [is_f * bias, jnp.zeros((1,), x1.dtype)]
        )[:, None] * valid[None, :]
        dct = labeling.data_costs_t(
            r, valid, one, cfg_h.outlier_cost, active
        ) + bias_row  # (K_union+1, N)
        nbr_idx, nbr_w = labeling.knn_graph(
            x1, valid, cfg_h.knn_k, cfg_h.knn_row_block
        )
        if polish_meanfield > 0 or polish_icm > 0:
            q0 = jax.nn.one_hot(lab_seq, k_union + 1, axis=0,
                                dtype=x1.dtype)
            q = labeling.mean_field_t(
                dct, nbr_idx, nbr_w, cfg_h.spatial_weight,
                polish_meanfield, cfg_h.temperature, cfg_h.temperature,
                q_init=q0,
            ) if polish_meanfield > 0 else q0
            labels = labeling.best_labeling_t(
                [lab_seq, jnp.argmax(q, axis=0)],
                dct, nbr_idx, nbr_w, cfg_h.spatial_weight, polish_icm,
            )
            # joint label-cost prune (PEARL's beta term over the UNION
            # space — the step that makes mixed model selection work):
            # a near-planar slice of a motion blob survives its own
            # stage as a legitimate small plane, but dies here because
            # its members switch to the blob's F almost for free
            # (runner-up cost ~ f_bias each) while beta is saved whole.
            # A true plane's members have no cheap alternative (their
            # F/other-H residuals are huge), so its switch cost dwarfs
            # beta. Greedy one-removal rounds, ICM reassignment between
            # rounds — same schedule as _pearl_iteration's prune_body.
            for _ in range(4):
                oh = (
                    labels[None, :] == jnp.arange(k_union + 1)[:, None]
                ).astype(x1.dtype)
                member = oh[:k_union] * valid[None, :] * active[:, None]
                own = jnp.sum(oh * dct, axis=0)
                runner = jnp.min(
                    jnp.where(oh > 0, jnp.inf, dct), axis=0
                )
                switch = jnp.sum((runner - own)[None, :] * member, axis=1)
                gain = cfg_h.label_cost - switch
                worst = jnp.argmax(jnp.where(active > 0, gain, -jnp.inf))
                active = active.at[worst].set(
                    jnp.where(gain[worst] > 0, 0.0, active[worst])
                )
                dct = labeling.data_costs_t(
                    r, valid, one, cfg_h.outlier_cost, active
                ) + bias_row
                labels = labeling.best_labeling_t(
                    [labels], dct, nbr_idx, nbr_w,
                    cfg_h.spatial_weight, 1,
                )
            # Refit alternation on the motion half (the step that makes
            # the polish a true PEARL over the union space, not just a
            # relabeling): the stage-F models are frozen up to here, so
            # an F fitted on a TRUNCATED member set (its stage saw the
            # motion through the plane stage's leftovers or a partial
            # nucleation) claims only those members and the rest of the
            # motion lands in OUTLIER — measured on mx22_b: two clean
            # motions of ~122 points each held 64/113 members and ~56
            # motion points were outliers (11.4%); one refit round
            # re-grows them. Tukey-weighted moment refit on the current
            # members, accepted per-model only if the member-restricted
            # inlier count does not shrink (the F-model acceptance rule
            # of _pearl_iteration), then one ICM reassignment. H models
            # stay frozen: planes are codim-2 and their stage fits on
            # full data — no truncation mode exists for them.
            thr_f_px = pipeline._thr(cfg_f, tau_f, x1.dtype)
            basis_f = fmodel.prepare_refit_f(x1, x2)
            for _ in range(polish_refits):
                oh = (
                    labels[None, :] == jnp.arange(k_union + 1)[:, None]
                ).astype(x1.dtype)
                member_f = (
                    oh[kh:k_union] * valid[None, :]
                    * active[kh:, None]
                )  # (Kf, N)
                rf = r[kh:]  # threshold units (squared)
                tk = jnp.maximum(0.0, 1.0 - rf) ** 2 * (rf < 1.0)
                w_f = member_f * tk
                Fs_new = fmodel.fundamental_refit_batch(
                    w_f, basis_f, cfg_f.eig_method, cfg_f.eig_iterations,
                    eig_pallas=pipeline._pallas_enabled(cfg_f),
                )
                enough = (
                    jnp.sum((w_f > 0).astype(x1.dtype), axis=1)
                    >= float(cfg_f.minimal_points)
                ) & jnp.all(jnp.isfinite(Fs_new.reshape(kf, -1)), axis=1)
                rf_new = fmodel.residual_matrix_f(
                    Fs_new, x1, x2, cfg_f.residual
                ) / thr_f_px
                in_old = jnp.sum((rf < 1.0) * member_f, axis=1)
                in_new = jnp.sum((rf_new < 1.0) * member_f, axis=1)
                take = (enough & (in_new >= in_old))[:, None]
                models = jnp.concatenate(
                    [
                        models[:kh],
                        jnp.where(take[..., None], Fs_new, models[kh:]),
                    ],
                    axis=0,
                )
                r = jnp.concatenate(
                    [r[:kh], jnp.where(take, rf_new, rf)], axis=0
                )
                dct = labeling.data_costs_t(
                    r, valid, one, cfg_h.outlier_cost, active
                ) + bias_row
                labels = labeling.best_labeling_t(
                    [labels], dct, nbr_idx, nbr_w,
                    cfg_h.spatial_weight, 1,
                )
        else:
            labels = lab_seq

    # final bookkeeping on the polished labels: per-model support,
    # min-support prune (per-class minima), outlier fold-in
    member = (
        labels[None, :] == jnp.arange(k_union)[:, None]
    ).astype(x1.dtype) * valid[None, :]
    support = jnp.sum(member, axis=1)
    min_sup = jnp.where(
        is_f > 0, float(cfg_f.min_inliers), float(cfg_h.min_inliers)
    )
    active = active * (support >= min_sup).astype(x1.dtype)
    labels = jnp.where(active[jnp.clip(labels, 0, k_union - 1)] > 0,
                       labels, k_union).astype(jnp.int32)
    support = support * active
    # full PEARL objective (data + Potts + beta label cost) so restart
    # selection over mixed fits weighs the per-model penalty the same way
    # the single-class FitResult.energy does (ADVICE r3, low)
    energy = labeling.total_energy_t(
        labels, dct, nbr_idx, nbr_w, cfg_h.spatial_weight,
        cfg_h.label_cost, active,
    )
    return MixedFitResult(
        labels=labels, models=models, is_f=is_f, active=active,
        support=support, energy=energy, result_h=res_h, result_f=res_f,
    )


def _per_model_sigma(r, labels, valid, k, factor, min_inliers):
    """Per-model noise estimates from one probe fit: for each of the k
    models, the median squared own-member residual scaled by the
    measured median factor (`pipeline._noise_median_factor`). Returns
    (sigma (k,), qualified (k,) bool) — a model qualifies if it holds at
    least min_inliers members."""
    mem = (labels[None, :] == jnp.arange(k)[:, None]) & (valid[None, :] > 0)
    cnt = jnp.sum(mem.astype(jnp.int32), axis=1)
    vals = jnp.sort(jnp.where(mem, r, jnp.inf), axis=1)
    med = jnp.take_along_axis(
        vals, jnp.maximum(cnt // 2, 0)[:, None], axis=1
    )[:, 0]
    sigma = jnp.sqrt(jnp.maximum(med, 1e-12) / factor)
    return sigma, cnt >= min_inliers


def estimate_tau_mixed(res_h, res_f, x1, x2, valid, cfg_h: MultiHConfig,
                       cfg_f: MultiHConfig):
    """Per-class noise-adaptive thresholds (tau_h, tau_f) from two
    SINGLE-CLASS probe fits (one per class, each on all points).

    Why not probe the mixed fit itself (the obvious two-pass analog of
    `pipeline.fit_adaptive`): at a generous probe tau_f the F stage
    legitimately claims plane points (every H-inlier is F-consistent —
    the containment asymmetry in the module docstring), the polish then
    collapses the starved planes, and the calibration inherits a
    destroyed segmentation it cannot see past (measured: a merged-plane
    probe reports sigma ~= 1.0 px regardless of the true 0.2-1.0).

    The estimator instead exploits that the correspondence noise sigma
    is SHARED between the classes — the same pixel jitter generates
    both residual populations, only the scale factor differs (5.85
    sigma^2 for the 2-D transfer median vs 0.466 for 1-D Sampson). Each
    probe model with >= min_inliers members yields one sigma estimate;
    merged planes and bridging Fs OVER-estimate (their members include
    another structure's points), clean models estimate correctly — so
    the minimum over all models of BOTH classes is robust as long as
    either probe recovers one clean structure (measured on the mixed
    suite: the min lands within 20% of the true sigma on every scene,
    where the pooled-median mixed-probe estimate was off by up to 5x).
    tau_c = 6 sigma with per-class floor/caps; with no qualifying model
    anywhere (e.g. an all-outlier scene) both configs' static
    thresholds are returned."""
    r_h = geometry.residual_matrix(
        res_h.homographies, x1, x2, cfg_h.residual
    )
    s_h, ok_h = _per_model_sigma(
        r_h, res_h.labels, valid, cfg_h.max_labels,
        pipeline._noise_median_factor(cfg_h), cfg_h.min_inliers,
    )
    r_f = fmodel.residual_matrix_f(
        res_f.homographies, x1, x2, cfg_f.residual
    )
    s_f, ok_f = _per_model_sigma(
        r_f, res_f.labels, valid, cfg_f.max_labels,
        pipeline._noise_median_factor(cfg_f), cfg_f.min_inliers,
    )
    s = jnp.concatenate([s_h, s_f])
    ok = jnp.concatenate([ok_h, ok_f])
    sigma = jnp.min(jnp.where(ok, s, jnp.inf))
    any_ok = jnp.any(ok)
    tau_h = jnp.where(
        any_ok, jnp.clip(6.0 * sigma, 3.0, 12.0),
        jnp.asarray(cfg_h.inlier_threshold, x1.dtype),
    )
    tau_f = jnp.where(
        any_ok, jnp.clip(6.0 * sigma, 1.5, 9.0),
        jnp.asarray(cfg_f.inlier_threshold, x1.dtype),
    )
    return tau_h.astype(x1.dtype), tau_f.astype(x1.dtype)


def fit_mixed_adaptive(x1, x2, valid, key, cfg_h: MultiHConfig,
                       cfg_f: MultiHConfig, probe_tau_h: float = 8.0,
                       probe_tau_f: float = 6.0, **mixed_kwargs):
    """Two-pass mixed fit with self-calibrated PER-CLASS thresholds: one
    single-class probe per class at a generous tau, a shared-noise
    estimate from the per-model residual medians of both probes
    (`estimate_tau_mixed` — see there for why the probe must be
    single-class), then the real mixed fit at tau_c = 6 sigma. Probes,
    calibration, and fit trace into ONE XLA program (taus are traced —
    no recompile). Returns (MixedFitResult, tau_h, tau_f)."""
    k_h, k_f, k_fit = jax.random.split(key, 3)
    with jax.named_scope("mixed_probe_h"):
        res_h0 = pipeline.fit(x1, x2, valid, k_h, cfg_h,
                              tau=jnp.asarray(probe_tau_h, x1.dtype))
    with jax.named_scope("mixed_probe_f"):
        res_f0 = pipeline.fit(x1, x2, valid, k_f, cfg_f,
                              tau=jnp.asarray(probe_tau_f, x1.dtype))
    tau_h, tau_f = estimate_tau_mixed(
        res_h0, res_f0, x1, x2, valid, cfg_h, cfg_f
    )
    res = fit_mixed(x1, x2, valid, k_fit, cfg_h, cfg_f,
                    tau_h=tau_h, tau_f=tau_f, **mixed_kwargs)
    return res, tau_h, tau_f


_MIXED_CACHE: dict = {}


def make_fit_mixed(cfg_h: MultiHConfig, cfg_f: MultiHConfig,
                   f_bias: float = 0.5, polish_meanfield: int = 4,
                   polish_icm: int = 2, f_scope: str = "all",
                   polish_refits: int = 2):
    """Jitted mixed fit: (x1, x2, valid, key) -> MixedFitResult — both
    stages + the joint polish in one XLA program. Cached per config."""
    key_t = (cfg_h, cfg_f, f_bias, polish_meanfield, polish_icm,
             f_scope, polish_refits)
    if key_t not in _MIXED_CACHE:
        _MIXED_CACHE[key_t] = jax.jit(
            lambda x1, x2, valid, key: fit_mixed(
                x1, x2, valid, key, cfg_h, cfg_f, f_bias,
                polish_meanfield, polish_icm, f_scope=f_scope,
                polish_refits=polish_refits,
            )
        )
    return _MIXED_CACHE[key_t]


def make_fit_mixed_tau(cfg_h: MultiHConfig, cfg_f: MultiHConfig,
                       f_bias: float = 0.5, polish_meanfield: int = 4,
                       polish_icm: int = 2, f_scope: str = "all",
                       polish_refits: int = 2):
    """Jitted mixed fit taking (tau_h, tau_f) as *traced* px thresholds —
    one executable serves any threshold pair (restarts under frozen
    auto-calibrated taus, per-class sweeps). Cached per config."""
    key_t = ("tau", cfg_h, cfg_f, f_bias, polish_meanfield, polish_icm,
             f_scope, polish_refits)
    if key_t not in _MIXED_CACHE:
        _MIXED_CACHE[key_t] = jax.jit(
            lambda x1, x2, valid, key, tau_h, tau_f: fit_mixed(
                x1, x2, valid, key, cfg_h, cfg_f, f_bias,
                polish_meanfield, polish_icm, tau_h=tau_h, tau_f=tau_f,
                f_scope=f_scope, polish_refits=polish_refits,
            )
        )
    return _MIXED_CACHE[key_t]


def make_fit_mixed_adaptive(cfg_h: MultiHConfig, cfg_f: MultiHConfig,
                            f_bias: float = 0.5,
                            polish_meanfield: int = 4,
                            polish_icm: int = 2, f_scope: str = "all",
                            polish_refits: int = 2,
                            probe_tau_h: float = 8.0,
                            probe_tau_f: float = 6.0):
    """Jitted two-pass per-class adaptive-threshold mixed fit:
    (x1, x2, valid, key) -> (MixedFitResult, tau_h, tau_f)."""
    key_t = ("adaptive", cfg_h, cfg_f, f_bias, polish_meanfield,
             polish_icm, f_scope, polish_refits, probe_tau_h,
             probe_tau_f)
    if key_t not in _MIXED_CACHE:
        _MIXED_CACHE[key_t] = jax.jit(
            lambda x1, x2, valid, key: fit_mixed_adaptive(
                x1, x2, valid, key, cfg_h, cfg_f,
                probe_tau_h=probe_tau_h, probe_tau_f=probe_tau_f,
                f_bias=f_bias, polish_meanfield=polish_meanfield,
                polish_icm=polish_icm, f_scope=f_scope,
                polish_refits=polish_refits,
            )
        )
    return _MIXED_CACHE[key_t]
