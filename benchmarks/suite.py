"""The fixed benchmark suite.

The real AdelaideRMF .mat files are not present in this offline image, so
the 19-pair benchmark (BASELINE.json:9) is realized as a fixed, seeded
family of synthetic stereo scenes spanning the difficulty range of the
Adelaide homography set (2-7 planes, 60-700 correspondences, up to 50%
outliers, 0-1px noise) — 19 region-clustered scenes mirroring the original
benchmark size, plus interleaved/overlapping-plane scenes matching the
spatial geometry of the real pairs (plane regions sharing area; spatial
neighborhoods that are label mixtures). Scene parameters are frozen here so
golden numbers and regression comparisons are stable across rounds. When
the actual dataset becomes available, `multih bench-adelaide <dir>` runs
the same report on it directly.
"""

from __future__ import annotations

from multih_tpu.utils import data

# name, n_points, n_planes, outlier_rate, noise_px, seed, extra-kwargs
# (extra kwargs go to data.synthetic_scene: overlap / clustered — the
# interleaved-plane scenes modeling real AdelaideRMF geometry, where plane
# regions share area and spatial neighborhoods are label mixtures)
SUITE = [
    ("easy2_a", 300, 2, 0.05, 0.3, 101, {}),
    ("easy2_b", 450, 2, 0.10, 0.5, 102, {}),
    ("easy2_c", 240, 2, 0.00, 0.0, 103, {}),
    ("med3_a", 400, 3, 0.15, 0.5, 104, {}),
    ("med3_b", 500, 3, 0.20, 0.5, 105, {}),
    ("med3_c", 350, 3, 0.10, 0.7, 106, {}),
    ("med4_a", 480, 4, 0.15, 0.5, 107, {}),
    ("med4_b", 600, 4, 0.25, 0.5, 108, {}),
    ("hard5_a", 600, 5, 0.30, 0.5, 109, {}),
    ("hard5_b", 700, 5, 0.25, 0.7, 110, {}),
    ("hard6_a", 660, 6, 0.30, 0.5, 111, {}),
    ("hard7_a", 700, 7, 0.25, 0.5, 112, {}),
    ("outlier50_a", 500, 3, 0.50, 0.5, 113, {}),
    ("outlier50_b", 600, 4, 0.50, 0.5, 114, {}),
    ("small_a", 120, 2, 0.10, 0.3, 115, {}),
    ("small_b", 60, 1, 0.15, 0.3, 116, {}),
    ("noisy_a", 400, 3, 0.15, 1.0, 117, {}),
    ("noisy_b", 500, 4, 0.20, 1.0, 118, {}),
    ("single_a", 350, 1, 0.30, 0.5, 119, {}),
    # interleaved / overlapping plane regions (VERDICT r1 #2): partial
    # overlap first, then the no-locality extreme (uniform plane points)
    ("overlap3_a", 450, 3, 0.15, 0.5, 122, {"overlap": 0.5}),
    ("overlap4_a", 520, 4, 0.20, 0.5, 123, {"overlap": 0.5}),
    ("overlap5_a", 600, 5, 0.25, 0.5, 124, {"overlap": 0.35}),
    ("inter3_a", 450, 3, 0.10, 0.5, 120, {"clustered": False}),
    ("inter4_a", 520, 4, 0.15, 0.5, 121, {"clustered": False}),
]


def scenes():
    """Materialize the suite: list of (CorrespondenceSet, true_H)."""
    out = []
    for name, n, planes, outl, noise, seed, kw in SUITE:
        cs, H = data.synthetic_scene(
            n_points=n, n_planes=planes, outlier_rate=outl, noise_px=noise,
            seed=seed, **kw,
        )
        cs = cs._replace(name=name)
        out.append((cs, H))
    return out


# Motion-segmentation suite (model='fundamental', the multi-model
# extension): multi-rigid-motion two-view scenes with known GT from
# data.synthetic_motion_scene. Name prefix 'fm' keeps the goldens
# (tests/goldens/fm*.npz) distinct from the homography suite's.
#
# Every (spec, seed) below is POSEDNESS-CHECKED: for each motion pair
# (a, b), an F fit on the union of their GT inliers must NOT cover both
# within tau (worst pairwise 'bridge coverage' <= ~0.66; fm5_a's best
# achievable over 20 seeds is 0.50). Scenes failing the check (e.g.
# 5 motions at noise 0.5 almost always contain a real bridge F covering
# >90% of two motions) make the FEWER-label solution genuinely
# energy-optimal — both implementations 'fail' them identically-ish but
# noisily, and a parity test there compares noise, not behavior.
MOTION_SUITE = [
    ("fm2_a", 400, 2, 0.10, 0.0, 201),
    ("fm2_b", 400, 2, 0.15, 0.5, 202),
    ("fm3_a", 400, 3, 0.20, 0.5, 203),
    ("fm3_b", 500, 3, 0.30, 0.5, 204),
    ("fm4_a", 400, 4, 0.10, 0.5, 205),
    ("fm4_b", 600, 4, 0.15, 0.5, 216),
    ("fm5_a", 700, 5, 0.15, 0.3, 220),
    ("fm_out40", 500, 3, 0.40, 0.5, 208),
    ("fm_out40b", 500, 3, 0.40, 0.5, 218),
]


def motion_scenes():
    """Materialize the motion suite: list of (CorrespondenceSet, true_F)."""
    out = []
    for name, n, motions, outl, noise, seed in MOTION_SUITE:
        cs, F = data.synthetic_motion_scene(
            n_points=n, n_motions=motions, outlier_rate=outl,
            noise_px=noise, seed=seed,
        )
        cs = cs._replace(name=name)
        out.append((cs, F))
    return out


# Mixed plane + motion suite (models/mixed.py; VERDICT r3 task 4 — the
# mixed fit gets the same golden-anchored evidence standard as both
# single-class paths). Covers the regimes the mixed module's own docstring
# names as hard: H-in-F containment (planes + motions together), the
# pure-motion edge (no planes at all — the r3 crux regime), and the
# pure-plane edge (no motions; F stage must come up empty).
# Scenes are SCREENED for epipolar distinguishability (bridgeability
# <= 0.6, benchmarks/fm_floor.py --bridgeability): two rigid motions
# whose point sets are >~80% covered by ONE fitted F are unresolvable
# by epipolar residuals — the 'bridge' then has lower PEARL energy than
# the 2-motion truth (label cost saved, data cost barely up), so ANY
# correct optimizer returns it and the golden becomes a lottery ticket.
# Measured on the original mx03_a (seed 304): motions 2+3 were 96%
# covered by one joint F (median Sampson 0.44/1.12 px), and both the
# float64 oracle and the TPU fit bridged them on a key-dependent subset
# of runs. Original seeds 302/313/304 screened at 0.84/0.87/0.96; the
# replacements below are 0.42/0.59/0.51, inside the fm suite's de-facto
# range (0.29-0.81).
# name, n_points, n_planes, n_motions, outlier_rate, noise_px, seed
MIXED_SUITE = [
    ("mx21_a", 600, 2, 1, 0.10, 0.5, 301),
    ("mx12_a", 600, 1, 2, 0.15, 0.5, 312),
    ("mx22_a", 700, 2, 2, 0.10, 0.5, 303),
    ("mx22_b", 700, 2, 2, 0.30, 0.5, 324),
    ("mx03_a", 500, 0, 3, 0.15, 0.5, 307),   # pure-motion edge
    ("mx30_a", 500, 3, 0, 0.15, 0.5, 305),   # pure-plane edge
]


def mixed_scenes():
    """Materialize the mixed suite: list of (CorrespondenceSet, Hs, Fs)."""
    out = []
    for name, n, planes, motions, outl, noise, seed in MIXED_SUITE:
        cs, Hs, Fs = data.synthetic_mixed_scene(
            n_points=n, n_planes=planes, n_motions=motions,
            outlier_rate=outl, noise_px=noise, seed=seed,
        )
        cs = cs._replace(name=name)
        out.append((cs, Hs, Fs))
    return out


def tau_for_noise(noise_px: float) -> float:
    """Inlier threshold for a given correspondence noise level.

    The symmetric transfer error sums noise from both images and amplifies
    it through the homography Jacobian; empirically tau ~ 6x the per-image
    sigma captures ~99% of true inliers without inflating the outlier
    absorption band (med3_c: tau=3 loses a plane, tau=4.2 recovers all
    three at <1% error). Floor of 3 px matches the reference default.
    """
    return max(3.0, 6.0 * noise_px)


def suite_params(name):
    for n, npts, planes, outl, noise, seed, kw in SUITE:
        if n == name:
            return {"inlier_threshold": tau_for_noise(noise)}
    raise KeyError(name)
