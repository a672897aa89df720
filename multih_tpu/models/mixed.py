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

1. **Sequential decomposition, specific model first.** Planes are fit
   first on all points; fundamental matrices are fit only on the points
   the planes left unexplained. Running F first (or jointly from scratch)
   lets codim-1 models swallow planes whole — measured on the synthetic
   mixed scenes: an F fitted through a plane's points has near-zero
   Sampson residual on all of them.
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
              cfg_f: MultiHConfig, f_bias: float = 0.35,
              polish_meanfield: int = 4, polish_icm: int = 2,
              tau_h=None, tau_f=None) -> MixedFitResult:
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
        motions). Default 0.35 measured on the synthetic mixed suite:
        large enough to hold plane boundaries, small enough that a true
        motion's members (transfer residual >> tau under any H) are
        unaffected.
      polish_meanfield / polish_icm: joint-polish sweep counts. The
        polish starts from the sequential labeling, so a few sweeps
        suffice; 0 mean-field + 0 ICM degenerates to the pure
        sequential composition.
      tau_h / tau_f: optional traced per-class thresholds (px),
        overriding the configs without recompilation.

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

    # stage 2: motions on the remainder only — never compete with planes
    # for points a homography already explains (containment asymmetry)
    with jax.named_scope("mixed_fit_f"):
        res_f = pipeline.fit(
            x1, x2, valid * (1.0 - explained_h), k2, cfg_f, tau=tau_f
        )

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


_MIXED_CACHE: dict = {}


def make_fit_mixed(cfg_h: MultiHConfig, cfg_f: MultiHConfig,
                   f_bias: float = 0.35, polish_meanfield: int = 4,
                   polish_icm: int = 2):
    """Jitted mixed fit: (x1, x2, valid, key) -> MixedFitResult — both
    stages + the joint polish in one XLA program. Cached per config."""
    key_t = (cfg_h, cfg_f, f_bias, polish_meanfield, polish_icm)
    if key_t not in _MIXED_CACHE:
        _MIXED_CACHE[key_t] = jax.jit(
            lambda x1, x2, valid, key: fit_mixed(
                x1, x2, valid, key, cfg_h, cfg_f, f_bias,
                polish_meanfield, polish_icm,
            )
        )
    return _MIXED_CACHE[key_t]
