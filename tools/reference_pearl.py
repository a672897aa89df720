"""Reference-style CPU Multi-H: double-precision NumPy PEARL with the C++
alpha-expansion solver — the behavioral stand-in for the unobtainable C++
reference binary (SURVEY.md §0, §8.5; reference mount empty all session).

Role (SURVEY.md §2 C10 'parity tool'): generate golden labelings and
misclassification numbers that the TPU pipeline must match within 0.5%
absolute (BASELINE.json:5). Everything here favors fidelity over speed:
float64, numpy SVD DLT, exact alpha-expansion with label costs each PEARL
iteration.

model='fundamental' runs the same PEARL machinery on epipolar geometry
(8-point SVD solves, Sampson residuals) — the oracle for the multi-motion
extension's goldens (f_*.npz).
"""

from __future__ import annotations

import dataclasses

import numpy as np

# Oracle provenance, recorded into tests/goldens/summary.json (ADVICE r2:
# the oracle co-evolved with the TPU path in round 2 — goldens must say
# which oracle produced them so regressions shared by both implementations
# stay attributable). Bump on any behavioral change to this file or to
# native/expansion.cpp.
ORACLE_VERSION = (
    "r4.1: float64 NumPy PEARL + native Dinic/BVZ/Delong expansion. "
    "Homography path bit-identical to r2.1 (its goldens remain valid). "
    "Fundamental path r4 changes: fixed-tau LO schedule [1,1,1] (A/B: "
    "suite mean 4.40 vs 4.51 for the r3 narrow-start — wide rounds build "
    "two-motion bridges), union-refit merge now ENERGY-TESTED (merge iff "
    "data-cost increase of the joint members under the union F < "
    "label_cost; coverage alone cannot separate fragments from bridges), "
    "split-refine second phase (spatial-median member splits + coverage "
    "re-selection + short beta-on PEARL; suite mean 4.40 -> 3.62, fm4_a "
    "8.0 -> 3.0 — bridges are stable under member refits, their spatial "
    "halves are not). "
    "Adds mixed_fit (plane+motion union label space: sequential H-then-F "
    "+ joint expansion polish with GRIC-style f_bias, mirroring "
    "models/mixed.py) for the mx*.npz goldens. "
    "r4.2: split-refine gains flow-component and principal-flow-axis "
    "QUARTILE cuts (spatially interleaved motions are inseparable by the "
    "spatial cut; an imbalanced bridge's flow mean lands inside the "
    "majority motion — mirrors pipeline.fit exactly); mixed_fit defaults "
    "f_scope='all' (the motion stage sees every point; the remainder "
    "variant fragments motions, measured) and f_bias=0.5 (sweep: 0.35 "
    "loses a plane to an overfitting per-plane F on the pure-plane "
    "scene, 0.65 loses true motions). Mixed suite scenes re-screened "
    "for epipolar bridgeability <= 0.6 (fm_floor.py --bridgeability; "
    "the original mx03_a was 0.96 — one F covered two motions to "
    "sub-tau accuracy, making the bridge objective-optimal). "
    "r5: EXCLUSIVE-CORE refit phase (fundamental only; see "
    "PearlParams.exclusive_iterations) — energy-tested refits of every "
    "model on the members no other active model claims within tau, "
    "escaping the PARTIAL-bridge fixed point (a converged F holding a "
    "thin deep-inlier slice of a neighboring motion; measured energy "
    "shows GT configs are LOWER-energy, i.e. an optimizer gap). Suite "
    "mean 3.62 -> 2.74. r5.1: MEMBER-RESAMPLE LO phase "
    "(PearlParams.resample_iterations; LO-RANSAC inner sampling) — "
    "trimmed-score resampling of each model's members, escaping the "
    "POLLUTED-BASIN fixed point the exclusive core cannot (unshared "
    "foreign members); energy-tested under expansion relabels."
)


@dataclasses.dataclass
class PearlParams:
    model: str = "homography"  # or "fundamental" (motion segmentation)
    inlier_threshold: float = 3.0
    spatial_weight: float = 0.1
    label_cost: float = 20.0
    outlier_cost: float = 1.0
    n_hypotheses: int = 2048
    n_candidates: int = 256
    max_labels: int = 16
    knn_k: int = 6
    min_inliers: int = 10
    pearl_iterations: int = 8
    merge_iou: float = 0.5
    nms_iou: float = 0.8
    lo_rounds: int = 3
    sampling_rounds: int = 5
    sampling_motion_weight: float = 2.0
    seed: int = 0
    lo_schedule: tuple = ()  # squared-threshold multipliers override;
    # () = the per-model default below (homography: the gradual wide
    # descent; fundamental: the narrow bridge-avoiding schedule)
    split_iterations: int = 4  # fundamental only: PEARL iterations of
    # the split-refine second phase (0 disables; mirrors the pipeline's
    # config.f_split_refine / f_split_iterations)
    resample_iterations: int = 2  # fundamental only: alternations of the
    # r5 MEMBER-RESAMPLE LO move (0 disables; mirrors the pipeline's
    # config.f_resample_lo; LO-RANSAC's inner-sampling, Lebeda et al.
    # BMVC 2012). Escapes the POLLUTED-BASIN fixed point the exclusive
    # core cannot: ~10% foreign members that are NOT shared inliers of
    # any other model stay in the exclusive core, and weighted LSQ on
    # that set stays off its true motion — but a random 12-point member
    # subset is all-pure with ~(0.9)^12 ~ 28% odds, and the TRIMMED
    # (best-80%) member-residual score drops the foreign tail (a capped
    # score would keep preferring the bridge: its foreign points are
    # DEEP inliers). Accepted per-round only when the full PEARL energy
    # decreases under an expansion relabel.
    resample_subsets: int = 16  # random 12-point subsets per model/round
    exclusive_iterations: int = 3  # fundamental only: alternations of
    # the r5 EXCLUSIVE-CORE refit move (0 disables; mirrors the
    # pipeline's config.f_exclusive_refine). A converged F can be a
    # PARTIAL bridge: it covers its own motion plus a thin slice of a
    # neighbor's points at DEEP-inlier residuals (fm2_b: ~20 foreign
    # points at 0.1-0.4 px), so no margin/purity test can see them, and
    # the member LSQ including them is a fixed point of PEARL's refit
    # step. But those foreign points are SHARED inliers (inside tau of
    # their own motion's model too) — refitting each model on the
    # members no other active model claims within tau snaps it to its
    # pure motion; an expansion relabel then hands the foreign points
    # back. Accepted only when the full PEARL energy decreases
    # (measured on the suite: GT configs had LOWER energy than every
    # partial-bridge config, i.e. this was an optimizer gap, not an
    # objective one; oracle mean 3.65 -> 2.66).


def _to_h(x):
    return np.concatenate([x, np.ones((x.shape[0], 1))], axis=1)


def _transfer(H, x):
    y = _to_h(x) @ H.T
    w = y[:, 2:3]
    w = np.where(np.abs(w) < 1e-12, 1e-12, w)
    return y[:, :2] / w


def _adjugate(m):
    """Scale-free 3x3 inverse (adjugate) — never raises on singular H; a
    degenerate homography just produces huge residuals and gets rejected,
    same as the JAX path."""
    c = np.empty_like(m)
    c[0, 0] = m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1]
    c[0, 1] = m[0, 2] * m[2, 1] - m[0, 1] * m[2, 2]
    c[0, 2] = m[0, 1] * m[1, 2] - m[0, 2] * m[1, 1]
    c[1, 0] = m[1, 2] * m[2, 0] - m[1, 0] * m[2, 2]
    c[1, 1] = m[0, 0] * m[2, 2] - m[0, 2] * m[2, 0]
    c[1, 2] = m[0, 2] * m[1, 0] - m[0, 0] * m[1, 2]
    c[2, 0] = m[1, 0] * m[2, 1] - m[1, 1] * m[2, 0]
    c[2, 1] = m[0, 1] * m[2, 0] - m[0, 0] * m[2, 1]
    c[2, 2] = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
    return c


def symmetric_error_sq(H, x1, x2):
    fwd = np.sum((_transfer(H, x1) - x2) ** 2, axis=1)
    bwd = np.sum((_transfer(_adjugate(H), x2) - x1) ** 2, axis=1)
    return fwd + bwd


def dlt(x1, x2, w=None):
    """Weighted normalized DLT, float64 numpy SVD (the oracle path)."""
    n = x1.shape[0]
    if w is None:
        w = np.ones(n)
    ws = w.sum()
    if ws < 4:
        return None

    def norm(x):
        mean = (x * w[:, None]).sum(0) / ws
        c = x - mean
        rms = np.sqrt(((c**2).sum(1) * w).sum() / ws)
        s = np.sqrt(2.0) / max(rms, 1e-12)
        T = np.array([[s, 0, -s * mean[0]], [0, s, -s * mean[1]], [0, 0, 1]])
        return c * s, T

    x1n, T1 = norm(x1)
    x2n, T2 = norm(x2)
    a = np.zeros((2 * n, 9))
    x, y = x1n[:, 0], x1n[:, 1]
    u, v = x2n[:, 0], x2n[:, 1]
    a[0::2, 3:6] = -np.stack([x, y, np.ones(n)], 1)
    a[0::2, 6:9] = np.stack([v * x, v * y, v], 1)
    a[1::2, 0:3] = np.stack([x, y, np.ones(n)], 1)
    a[1::2, 6:9] = -np.stack([u * x, u * y, u], 1)
    sw = np.repeat(np.sqrt(np.maximum(w, 0)), 2)
    _, _, vt = np.linalg.svd(a * sw[:, None], full_matrices=False)
    H = np.linalg.inv(T2) @ vt[-1].reshape(3, 3) @ T1
    return H / np.linalg.norm(H)


def f_sampson_sq(F, x1, x2):
    """First-order (Sampson) squared epipolar error, float64 — the
    fundamental-model analog of symmetric_error_sq. Independent of
    multih_tpu.ops.fmodel (straightforward NumPy, SURVEY.md §4 oracle
    style)."""
    x1h = _to_h(x1)
    x2h = _to_h(x2)
    l = x1h @ F.T                       # epiline of x1 in image 2
    m = x2h @ F                         # epiline of x2 in image 1
    e = np.sum(x2h * l, axis=1)
    den = l[:, 0] ** 2 + l[:, 1] ** 2 + m[:, 0] ** 2 + m[:, 1] ** 2
    return e * e / np.maximum(den, 1e-12)


def fundamental_8pt(x1, x2, w=None):
    """Weighted normalized 8-point fundamental matrix, float64 numpy SVD,
    rank-2 enforced in the normalized frame (the oracle path; mirrors the
    structure of dlt() above, one epipolar row per point)."""
    n = x1.shape[0]
    if w is None:
        w = np.ones(n)
    ws = w.sum()
    if ws < 8:
        return None

    def norm(x):
        mean = (x * w[:, None]).sum(0) / ws
        c = x - mean
        rms = np.sqrt(((c**2).sum(1) * w).sum() / ws)
        s = np.sqrt(2.0) / max(rms, 1e-12)
        T = np.array([[s, 0, -s * mean[0]], [0, s, -s * mean[1]], [0, 0, 1]])
        return c * s, T

    x1n, T1 = norm(x1)
    x2n, T2 = norm(x2)
    x, y = x1n[:, 0], x1n[:, 1]
    u, v = x2n[:, 0], x2n[:, 1]
    a = np.stack([u * x, u * y, u, v * x, v * y, v, x, y, np.ones(n)], 1)
    sw = np.sqrt(np.maximum(w, 0))
    _, _, vt = np.linalg.svd(a * sw[:, None], full_matrices=False)
    Fn = vt[-1].reshape(3, 3)
    uu, ss, vv = np.linalg.svd(Fn)
    Fn = uu @ np.diag([ss[0], ss[1], 0.0]) @ vv
    F = T2.T @ Fn @ T1
    nrm = np.linalg.norm(F)
    if not np.isfinite(nrm) or nrm < 1e-12:
        return None
    return F / nrm


def _morton_codes(pts):
    """2-D Morton (Z-order) codes of point positions, 16 bits per axis —
    the same spatial ordering pipeline.morton_order uses; here it defines
    the split-refine phase's spatial median split."""
    q = pts - pts.min(axis=0)
    s = max(float(q.max()), 1e-12)
    xi = np.minimum((q[:, 0] / s * 65535.0).astype(np.uint64), 65535)
    yi = np.minimum((q[:, 1] / s * 65535.0).astype(np.uint64), 65535)

    def spread(v):
        v = (v | (v << 8)) & np.uint64(0x00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x33333333)
        v = (v | (v << 1)) & np.uint64(0x55555555)
        return v

    return (spread(xi) << np.uint64(1)) | spread(yi)


def knn_graph(pts, k):
    from scipy.spatial import cKDTree

    tree = cKDTree(pts)
    _, idx = tree.query(pts, k + 1)
    nbr = idx[:, 1:]
    n = pts.shape[0]
    pq = np.stack(
        [np.repeat(np.arange(n), k), nbr.reshape(-1)], axis=1
    ).astype(np.int32)
    return nbr.astype(np.int32), pq, np.ones(n * k)


def pearl_fit(x1, x2, p: PearlParams):
    """Full reference-style fit: hypothesize -> LO -> NMS -> PEARL with
    alpha-expansion labeling. Returns (labels, homographies, active)."""
    from multih_tpu import native

    rng = np.random.default_rng(p.seed)
    n = x1.shape[0]
    thr = p.inlier_threshold**2
    # model dispatch (multi-model extension; the homography path is the
    # reference's problem and is unchanged by this refactor)
    if p.model == "fundamental":
        m_min = 8
        # the oracle samples 12 points, not the minimal 8: an 8-point F
        # on a compact 3D blob at 0.5 px noise is noise-dominated
        # (measured on fm_out40 motion 1: mean 0.20 of the motion covered
        # from CLEAN minimal samples, and LO cannot climb out because the
        # covered subset is quasi-planar; 12-point samples cover 0.99).
        # Fidelity over minimality is this tool's stated role.
        s_min = 12
        resid = f_sampson_sq
        refit_w = fundamental_8pt
    else:
        m_min = 4
        s_min = 4
        resid = symmetric_error_sq
        refit_w = dlt
    nbr, pq, ew = knn_graph(x1, p.knn_k)
    # sampling neighbors live in (position, motion) space: same-plane
    # points cluster by motion even when plane regions interleave spatially
    # (clean-quad rate on interleaved scenes: ~1% spatial -> ~58% at w=2).
    # The Potts graph (pq, ew) above stays purely spatial, like the
    # reference's C8. Mirrors the TPU pipeline's sampling_motion_weight.
    if p.sampling_motion_weight > 0:
        feat = np.concatenate(
            [x1, p.sampling_motion_weight * (x2 - x1)], axis=1
        )
        nbr_s, _, _ = knn_graph(feat, p.knn_k)
    else:
        nbr_s = nbr

    # LO growth schedule (squared-threshold multipliers): gradual descent
    # with repeats, starting wide. A homography from a tight local quad
    # extrapolates with error ~(dist/quad_size)^2 * noise — hundreds of px
    # at plane scale — so a single wide iteration cannot escape the seed's
    # neighborhood; each repeated refit extends the acceptance region a
    # little and the next one extrapolates further. With the old schedule
    # (16, 4, 1, 1, 1) specific hard6_a/hard7_a planes NEVER grew (best
    # coverage 6-9% over 512 grown samples); with this one every plane of
    # both scenes reaches 97-100% coverage.
    lo_schedule = [64, 64, 32, 32, 16, 16, 8, 8, 4, 4, 2, 1, 1]
    if p.model == "fundamental":
        # The wide homography schedule exists because a plane homography
        # from a tight quad extrapolates quadratically badly — growth
        # needs many gradual steps. An F's epipolar constraint is 1-D
        # and global: a pure minimal sample already scores its whole
        # motion, while WIDE thresholds absorb other motions' points and
        # LO converts pure samples into two-motion 'bridges' (measured
        # on fm4_a: zero pure candidates for 2 of 4 motions survived the
        # wide schedule). Fixed-tau growth measured best over the motion
        # suite (r4 A/B: [1,1,1] mean 3.79 vs 4.51 for the r3
        # [4,2,2,1,1,1,1] narrow-start and 4.46 for [1]*5) — matching the
        # pipeline's model-resolved lo_shrink_eff (config.py).
        lo_schedule = [1, 1, 1]
    if p.lo_schedule:
        lo_schedule = list(p.lo_schedule)

    def lo_grow(H, rounds, base_mask=None):
        """Gradual shrinking-threshold LO, keep-if-better at tau."""
        for mult in lo_schedule:
            rr = resid(H, x1, x2)
            w = np.maximum(0, 1 - rr / (thr * mult)) ** 2 * (rr < thr * mult)
            if base_mask is not None:
                w = w * base_mask
            Hn = refit_w(x1, x2, w)
            if Hn is None or not np.isfinite(Hn).all():
                continue
            if ((resid(Hn, x1, x2) < thr).sum()
                    >= (rr < thr).sum()):
                H = Hn
        return H

    # Progressive guided sampling (role of C5+C7: the reference draws one
    # hypothesis per correspondence from affine frames; point-only input
    # needs re-sampling to reach the same coverage): in each round, sample
    # only among points not yet claimed by a found plane, grow the best
    # hypotheses by LO, claim their inliers, repeat. Guarantees later
    # (smaller / more occluded) planes get clean dense samples instead of
    # competing with already-found structures.
    # Round budget trade-off: more rounds = more claim opportunities (good
    # for many planes), but each round must still contain a clean minimal
    # sample of an UNFOUND plane among its uniform half — on interleaved
    # scenes (no locality signal) clean-quad probability is ~0.2-1% per
    # sample, so 10 thin rounds of ~100 uniform samples each find nothing
    # round after round while 5 rounds of ~400 reliably land one. With the
    # gradual LO schedule above, one clean quad per plane is all a round
    # needs. Claims are gated on min_inliers: claiming a 3-point junk
    # "plane" just churns the available set.
    claimed = np.zeros(n, bool)
    rounds = p.sampling_rounds
    per_round = p.n_hypotheses // rounds
    Hs = []
    for _ in range(rounds):
        avail = np.where(~claimed)[0]
        if avail.size < max(2 * s_min, p.min_inliers):
            break

        def local_cluster(size):
            """Seed + (size-1) motion-space neighbors (one cluster)."""
            seed_pt = rng.choice(avail)
            nb = [q for q in nbr_s[seed_pt] if not claimed[q]]
            if len(nb) < size - 1:
                nb = list(nbr_s[seed_pt])
            return np.concatenate(
                [[seed_pt], rng.choice(nb, size - 1, replace=False)]
            )

        round_H = []
        for s in range(per_round):
            if s % 2 == 0:
                idx = rng.choice(avail, s_min, replace=False)
            elif s_min == 4:
                idx = local_cluster(4)
            else:
                # fundamental: TWO independent locality clusters — a
                # single cluster is planar-degenerate far too often
                # (mirrors ops/sampling.py's two-cluster draw)
                idx = np.concatenate(
                    [local_cluster(s_min // 2), local_cluster(s_min // 2)]
                )
                if np.unique(idx).size < s_min:
                    idx = rng.choice(avail, s_min, replace=False)
            H = refit_w(x1[idx], x2[idx])
            if H is not None and np.isfinite(H).all():
                round_H.append(H)
        if not round_H:
            continue
        round_H = np.stack(round_H)
        # rank by inliers among UNCLAIMED points, grow the best few
        r_avail = np.stack(
            [resid(H, x1[avail], x2[avail]) for H in round_H]
        )
        order = np.argsort(-(r_avail < thr).sum(1))
        grown = []
        for i in order[: max(16, p.n_candidates // rounds)]:
            grown.append(lo_grow(round_H[i], p.lo_rounds))
        Hs.extend(grown)
        # claim: the best grown hypothesis takes its tau-inliers — but only
        # if it is a real plane (>= min_inliers); claiming junk churns avail
        best = max(
            grown,
            key=lambda H: (resid(H, x1, x2) < thr).sum(),
        )
        newly = resid(best, x1, x2) < thr
        if newly.sum() >= p.min_inliers:
            claimed |= newly
    Hs = np.stack(Hs)

    r = np.stack([resid(H, x1, x2) for H in Hs])
    masks = r < thr
    counts = masks.sum(1)
    if p.model == "fundamental":
        # Marginal-coverage (facility-location) greedy: epipolar 'bridge'
        # models spanning two motions outcount every pure single-motion
        # model, so count+NMS fills the roster with bridges and can lose a
        # motion outright; greedily maximizing NEWLY-covered points makes
        # a pure model of an uncovered motion beat any bridge (same
        # calibration as models/selection.py::select_candidates_coverage).
        # min_gain=4 (NOT min_inliers): after a full two-motion bridge is
        # taken, a pure model's marginal gain is only the bridge's missed
        # points — it must still enter the roster so PEARL can dismantle
        # the bridge (pure Fs fit tighter, expansion reassigns, the bridge
        # starves and dies to label cost). Mirrors
        # selection.select_candidates_coverage's min_gain.
        covered = np.zeros(n, bool)
        picked = []
        while len(picked) < p.max_labels:
            gains = np.array([
                -1 if i in picked else int((masks[i] & ~covered).sum())
                for i in range(len(Hs))
            ])
            best = int(np.argmax(gains))
            if gains[best] < 4:
                break
            picked.append(best)
            covered |= masks[best]
    else:
        # NMS by inlier IoU (count-ordered)
        order = np.argsort(-counts)
        picked = []
        for i in order:
            if counts[i] < p.min_inliers or len(picked) >= p.max_labels:
                break
            dup = False
            for j in picked:
                inter = (masks[i] & masks[j]).sum()
                union = (masks[i] | masks[j]).sum()
                if union and inter / union >= p.nms_iou:
                    dup = True
                    break
            if not dup:
                picked.append(i)
    Hs = Hs[picked]
    k = len(Hs)
    if k == 0:
        return np.full(n, 0, np.int32), np.zeros((0, 3, 3)), []

    active = list(range(k))
    # internal outlier sentinel: a value no model index can ever reach —
    # the fundamental path may APPEND union-proposal models to Hs during
    # PEARL (below), so len(Hs) is not stable; the sentinel is remapped
    # to the final len(Hs) at return (bit-identical labels for the
    # homography path, whose roster never grows).
    out_lab = 1 << 20
    labels = np.full(n, out_lab, np.int32)

    def run_pearl(n_iters, beta_from):
        """PEARL alternation over the current roster; label-cost beta
        turns on at iteration beta_from (growth phase first — candidate
        value must be judged at full support, or real planes with
        initially-weak hypotheses get killed before they can grow; same
        gating as the TPU pipeline). Mutates labels/active; Hs rows are
        updated in place."""
        nonlocal labels, active
        for it in range(n_iters):
            if not active:
                break
            beta = p.label_cost if it >= beta_from else 0.0
            # data costs over active labels + outlier
            r = np.stack([resid(Hs[l], x1, x2) for l in active])
            d = np.concatenate(
                [
                    np.minimum(r / thr, 8.0).T * p.outlier_cost,
                    np.full((n, 1), p.outlier_cost),
                ],
                axis=1,
            )
            h = np.concatenate([np.full(len(active), beta), [0.0]])
            lab_idx, _ = native.expansion_solve(
                d, pq, ew, p.spatial_weight, h
            )
            labels = np.array(
                [active[l] if l < len(active) else out_lab for l in lab_idx],
                np.int32,
            )
            # refit on Tukey-weighted members; planes keep their H (and stay in
            # the label set, as gco does) even when temporarily under-supported
            # during the growth phase
            new_active = []
            for l in active:
                member = labels == l
                if beta > 0 and member.sum() < p.min_inliers:
                    continue
                if member.sum() >= m_min:
                    rr = resid(Hs[l], x1, x2)
                    w = member * np.maximum(0, 1 - rr / thr) ** 2 * (rr < thr)
                    H = refit_w(x1, x2, w)
                    if H is not None and np.isfinite(H).all():
                        if ((resid(H, x1, x2) < thr).sum()
                                >= (rr < thr).sum()):
                            Hs[l] = H
                new_active.append(l)
            # merge duplicates. Homography: by inlier-set containment
            # (intersection over the smaller set) — fringe fragments mostly
            # contained in a stronger plane merge away even when union-IoU is
            # small. Fundamental: symmetric Jaccard (union IoU) — containment
            # would kill pure motions inside epipolar bridges (the same
            # model-class calibration as the TPU pipeline's
            # merge_duplicate_planes).
            if p.model == "fundamental":
                def overlap(a, b):
                    return (a & b).sum() / max((a | b).sum(), 1)
            else:
                def overlap(a, b):
                    return (a & b).sum() / max(min(a.sum(), b.sum()), 1)
            merged = []
            masks = {
                l: resid(Hs[l], x1, x2) < thr for l in new_active
            }
            for l in sorted(new_active, key=lambda l: -masks[l].sum()):
                dup = any(
                    overlap(masks[l], masks[m]) >= p.merge_iou
                    for m in merged
                )
                if not dup:
                    merged.append(l)
            active = merged
            labels = np.where(np.isin(labels, active), labels, out_lab)

            # Fundamental only: UNION-REFIT merge, ENERGY-TESTED
            # (J-linkage-style consolidation judged by the PEARL objective
            # itself). Two under-grown fragments of one motion share few
            # tau-inliers (Jaccard can't see them as duplicates) yet a single
            # F refit on their joint members still covers both. But a fitted
            # 'bridge' F can ALSO cover >= 0.8 of two DISTINCT motions inside
            # tau (measured on mx03_a: 0.96/0.95 coverage); no residual-
            # quality threshold separates the cases, and a roster PROPOSAL
            # doesn't either (a union F never wins members pointwise — each
            # fragment is LSQ-optimal on its own members; traced on fm4_a).
            # The energy does: merging removes one label (-label_cost) and
            # raises the joint members' data cost by Delta = sum over members
            # of (cost under union F - cost under own F). Measured: fm4_a
            # true-fragment pair Delta ~ 9.6 < beta 20 (merge), mx03_a
            # bridge Delta ~ 34 > 20 (reject). Runs on MEMBERS, not
            # tau-masks, so a bridge hypothesis that lost its second motion's
            # points to a pure model cannot re-absorb them here. Mirrors
            # pipeline._pearl_iteration's union_refit_merge.
            if p.model == "fundamental":
                changed = True
                while changed and len(active) > 1:
                    changed = False
                    order = sorted(active, key=lambda l: -(labels == l).sum())
                    for i, la in enumerate(order):
                        for lb in order[i + 1:]:
                            ma, mb = labels == la, labels == lb
                            if ma.sum() < m_min or mb.sum() < m_min:
                                continue
                            Hu = refit_w(x1, x2, (ma | mb).astype(float))
                            if Hu is None or not np.isfinite(Hu).all():
                                continue
                            r_un = resid(Hu, x1, x2)
                            ru = r_un < thr
                            if ru[ma].mean() < 0.8 or ru[mb].mean() < 0.8:
                                continue
                            d_un = np.minimum(r_un / thr, 8.0) * p.outlier_cost
                            d_a = np.minimum(
                                resid(Hs[la], x1, x2) / thr, 8.0
                            ) * p.outlier_cost
                            d_b = np.minimum(
                                resid(Hs[lb], x1, x2) / thr, 8.0
                            ) * p.outlier_cost
                            delta = ((d_un - d_a)[ma].sum()
                                     + (d_un - d_b)[mb].sum())
                            if delta < p.label_cost:
                                labels = np.where(mb, la, labels)
                                active = [l for l in active if l != lb]
                                Hs[la] = Hu
                                changed = True
                                break
                        if changed:
                            break

            # Explicit label-cost pruning by COLLECTIVE energy gain
            # (fundamental only; mirrors the TPU pipeline's multi-round
            # prune). Expansion's per-move label-cost handling can only empty
            # a label when ONE alpha absorbs all its members in a single
            # move; a junk motion whose members' second-best labels differ
            # survives every individual move even when removing it outright
            # is profitable. Here: remove the label whose members' total
            # switch-to-best-alternative data cost is less than beta, up to 8
            # per iteration, reassigning members by data-cost argmin (the
            # next expansion re-optimizes smoothness; on the final iteration
            # the argmin assignment is the exact greedy).
            if p.model == "fundamental" and beta > 0:
                for _ in range(8):
                    if len(active) <= 1:
                        break
                    rmap = {l: resid(Hs[l], x1, x2) for l in active}
                    dmap = {
                        l: np.minimum(rmap[l] / thr, 8.0) * p.outlier_cost
                        for l in active
                    }
                    best_gain, best_l, best_alt = 0.0, None, None
                    for l in active:
                        member = labels == l
                        others = [m for m in active if m != l]
                        alt_stack = np.stack(
                            [dmap[m] for m in others]
                            + [np.full(n, p.outlier_cost)]
                        )
                        alt_idx = np.argmin(alt_stack, axis=0)
                        alt_cost = alt_stack[alt_idx, np.arange(n)]
                        switch = (alt_cost - dmap[l])[member].sum()
                        gain = beta - switch
                        if gain > best_gain:
                            alt_lab = np.array(
                                others + [out_lab]
                            )[alt_idx]
                            best_gain, best_l, best_alt = gain, l, alt_lab
                    if best_l is None:
                        break
                    member = labels == best_l
                    labels = np.where(member, best_alt, labels)
                    active = [l for l in active if l != best_l]

    run_pearl(p.pearl_iterations, p.pearl_iterations // 2)

    if p.model == "fundamental" and p.split_iterations > 0 and active:
        # Split-refine phase (mirrors pipeline.fit's split_refine /
        # config.f_split_refine): PEARL has no split move, and an
        # epipolar 'bridge' F covering two motions is STABLE under member
        # refits — its member set stays mixed, so the weighted LSQ stays
        # a bridge. Its spatial halves, however, are (nearly) pure
        # motions: split every active model's member set at the spatial
        # (Morton) median, refit an F on each half, re-select the roster
        # coverage-greedily from {survivors + halves}, and run a short
        # second PEARL phase with the label cost on from the start. Pure
        # halves win members pointwise on data cost; the bridge starves
        # and dies to the label-cost prune.
        morton_rank = np.argsort(np.argsort(_morton_codes(x1)))
        flow = x2 - x1  # flow-axis splits: see the pipeline's rationale
        new_models = []
        for l in list(active):
            member_idx = np.where(labels == l)[0]
            if member_idx.size < 2 * m_min:
                continue
            mr = member_idx[np.argsort(morton_rank[member_idx])]
            rr = resid(Hs[l], x1, x2)
            tk = np.maximum(0, 1 - rr / thr) ** 2 * (rr < thr)
            halves = [mr[: mr.size // 2], mr[mr.size // 2:]]
            # flow-component + principal-flow-axis mean cuts (spatially
            # overlapping motions are inseparable by any spatial cut;
            # their flow fields are not — mirrors pipeline.fit's
            # split_refine axes exactly)
            fm = flow[member_idx]
            cov = np.cov(fm.T) if member_idx.size > 1 else np.eye(2)
            _, vec = np.linalg.eigh(cov)
            for am in (fm[:, 0], fm[:, 1]):
                mean_a = am.mean()
                halves.append(member_idx[am <= mean_a])
                halves.append(member_idx[am > mean_a])
            # principal-axis QUARTILE cuts (q25/q50/q75, not mean: an
            # imbalanced bridge's mean lands inside the majority motion)
            pax = fm @ vec[:, -1]
            for qf in (0.25, 0.5, 0.75):
                cut = np.quantile(pax, qf)
                halves.append(member_idx[pax <= cut])
                halves.append(member_idx[pax > cut])
            for half in halves:
                w = np.zeros(n)
                w[half] = tk[half]
                if (w > 0).sum() < m_min:
                    continue
                Hn = refit_w(x1, x2, w)
                if Hn is not None and np.isfinite(Hn).all():
                    new_models.append(Hn)
        if new_models:
            base = len(Hs)
            Hs = np.concatenate([Hs, np.stack(new_models)], axis=0)
            cand = list(active) + list(range(base, len(Hs)))
            masks_c = {i: resid(Hs[i], x1, x2) < thr for i in cand}
            covered = np.zeros(n, bool)
            picked = []
            while len(picked) < p.max_labels:
                gains = [
                    (-1 if i in picked
                     else int((masks_c[i] & ~covered).sum()), i)
                    for i in cand
                ]
                g, i = max(gains)
                if g < 4:
                    break
                picked.append(i)
                covered |= masks_c[i]
            active = picked
            run_pearl(p.split_iterations, 0)

    if (p.model == "fundamental" and len(active) >= 1
            and (p.exclusive_iterations > 0
                 or p.resample_iterations > 0)):
        # Exclusive-core refit phase (see PearlParams.exclusive_iterations;
        # mirrors pipeline.fit's f_exclusive_refine): alternate
        # {refit every active model on the Tukey-weighted members that
        # are inside tau of NO other active model; expansion relabel};
        # keep the new configuration iff the full PEARL energy (data +
        # Potts + label cost) decreases.
        def _config_energy(rs, li):
            m = rs.shape[0]
            d = np.concatenate(
                [np.minimum(rs / thr, 8.0).T * p.outlier_cost,
                 np.full((n, 1), p.outlier_cost)], axis=1)
            data = d[np.arange(n), li].sum()
            potts = p.spatial_weight * np.sum(
                ew * (li[pq[:, 0]] != li[pq[:, 1]]))
            used = len(set(li[li < m].tolist()))
            return data + potts + p.label_cost * used

        ids = list(active)
        remap = {l: i for i, l in enumerate(ids)}
        li = np.array(
            [remap.get(l, len(ids)) for l in labels], np.int64
        )
        Fl = [Hs[l] for l in ids]

        def _relabel_accept(fx, e0):
            """Expansion relabel of a refit roster; accept iff the full
            PEARL energy decreases. Returns (accepted, Fl, li)."""
            rx = np.stack([resid(F, x1, x2) for F in fx])
            d = np.concatenate(
                [np.minimum(rx / thr, 8.0).T * p.outlier_cost,
                 np.full((n, 1), p.outlier_cost)], axis=1)
            h = np.concatenate([np.full(len(fx), p.label_cost), [0.0]])
            li_x, _ = native.expansion_solve(
                d, pq, ew, p.spatial_weight, h
            )
            if _config_energy(rx, li_x) < e0:
                return True, fx, li_x
            return False, None, None

        for _ in range(p.exclusive_iterations if len(ids) > 1 else 0):
            rs = np.stack([resid(F, x1, x2) for F in Fl])
            e0 = _config_energy(rs, li)
            inl = rs < thr
            n_in = inl.sum(0)
            fx = []
            for i in range(len(Fl)):
                w = ((li == i) & inl[i] & (n_in == 1)).astype(np.float64)
                fn = None
                if w.sum() >= 1.5 * m_min:
                    wt = w * np.maximum(0.0, 1.0 - rs[i] / thr) ** 2
                    fn = refit_w(x1, x2, wt)
                fx.append(fn if fn is not None and np.isfinite(fn).all()
                          else Fl[i])
            ok, fl_n, li_n = _relabel_accept(fx, e0)
            if ok:
                Fl, li = fl_n, li_n
            else:
                break

        # member-resample LO phase (PearlParams.resample_iterations;
        # mirrors pipeline.fit's f_resample_lo — see the param comment)
        rng_r = np.random.default_rng(0x7e5a)
        for _ in range(p.resample_iterations):
            rs = np.stack([resid(F, x1, x2) for F in Fl])
            e0 = _config_energy(rs, li)
            fx = []
            for i in range(len(Fl)):
                mem = np.nonzero(li == i)[0]
                if len(mem) < max(12, 1.5 * m_min):
                    fx.append(Fl[i])
                    continue
                n_trim = int(0.8 * len(mem))

                def tcost(F):
                    return float(np.sort(
                        resid(F, x1, x2)[mem])[:n_trim].sum())

                best, bc = Fl[i], tcost(Fl[i])
                for _s in range(p.resample_subsets):
                    sub = rng_r.choice(mem, 12, replace=False)
                    w = np.zeros(n)
                    w[sub] = 1.0
                    Fc = refit_w(x1, x2, w)
                    if Fc is None or not np.isfinite(Fc).all():
                        continue
                    cands = [Fc]
                    r_c = resid(Fc, x1, x2)
                    wt = np.zeros(n)
                    wt[mem] = np.maximum(
                        0.0, 1.0 - np.clip(r_c[mem] / thr, 0, 1)
                    ) ** 2
                    Fc2 = refit_w(x1, x2, wt)
                    if Fc2 is not None and np.isfinite(Fc2).all():
                        cands.append(Fc2)
                    for F in cands:
                        c = tcost(F)
                        if c < bc:
                            best, bc = F, c
                fx.append(best)
            ok, fl_n, li_n = _relabel_accept(fx, e0)
            if ok:
                Fl, li = fl_n, li_n
            else:
                break

        for i, l in enumerate(ids):
            Hs[l] = Fl[i]
        labels = np.array(
            [ids[v] if v < len(ids) else out_lab for v in li], np.int32
        )
        active = [l for l in ids
                  if int(np.sum(labels == l)) >= p.min_inliers]
        dropped = set(ids) - set(active)
        if dropped:
            labels = np.where(np.isin(labels, list(dropped)), out_lab,
                              labels)

    # remap the internal outlier sentinel to the conventional len(Hs)
    # (identical to the historical labels for the homography path, whose
    # roster never grows during PEARL)
    labels = np.where(labels == out_lab, len(Hs), labels).astype(np.int32)
    return labels, Hs, active


def mixed_fit(x1, x2, p_h: PearlParams, p_f: PearlParams,
              f_bias: float = 0.5, prune_rounds: int = 4,
              f_scope: str = "all"):
    """Mixed plane + motion oracle (models/mixed.py's float64 stand-in;
    VERDICT r3 task 4: the mixed fit gets the same golden-anchored
    evidence standard as both single-class paths).

    Mirrors the TPU fit's structure exactly:
      1. specific model first, both stages on all points (f_scope="all",
         the measured default — see models/mixed.py's docstring);
      2. joint polish over the union label space: data costs in per-class
         threshold units, a GRIC-style f_bias penalty on the codim-1
         labels, alpha-expansion with label costs in place of the TPU's
         mean-field+ICM, and the same greedy one-removal label-cost prune
         (collective switch-cost gain) between reassignments.

    Returns (labels, models (K,3,3), is_f (K,), n_active) with outlier
    label == len(models) (the union-roster convention of MixedFitResult).
    """
    from multih_tpu import native

    assert p_h.model == "homography" and p_f.model == "fundamental"
    n = x1.shape[0]
    thr_h = p_h.inlier_threshold ** 2
    thr_f = p_f.inlier_threshold ** 2

    labels_h, Hs_h, act_h = pearl_fit(x1, x2, p_h)
    explained = labels_h != len(Hs_h)
    rem = np.where(~explained)[0]
    # f_scope="all" (default, mirrors models/mixed.py): the motion stage
    # sees every point and the polish's f_bias resolves the containment
    # asymmetry; "remainder" masks it to the plane leftovers (measured
    # worse — fragments the motions; see the TPU module's docstring)
    if f_scope == "all":
        _, Fs_f, act_f = pearl_fit(x1, x2, p_f)
    elif rem.size >= max(3 * p_f.min_inliers, 24):
        lab_f_sub, Fs_f, act_f = pearl_fit(x1[rem], x2[rem], p_f)
    else:
        Fs_f, act_f = np.zeros((0, 3, 3)), []

    models = [Hs_h[l] for l in act_h] + [Fs_f[l] for l in act_f]
    is_f = np.array(
        [0.0] * len(act_h) + [1.0] * len(act_f), dtype=np.float64
    )
    k = len(models)
    if k == 0:
        return np.zeros(n, np.int32), np.zeros((0, 3, 3)), is_f, 0

    _, pq, ew = knn_graph(x1, p_h.knn_k)
    bias = f_bias * p_h.outlier_cost

    def union_costs(active_mask):
        # per-class threshold units — the only scale on which a 2-D
        # transfer distance and a 1-D epipolar distance are comparable
        cols = []
        for j, M in enumerate(models):
            if not active_mask[j]:
                cols.append(np.full(n, 1e6))
                continue
            if is_f[j]:
                r = f_sampson_sq(M, x1, x2) / thr_f
                cols.append(
                    np.minimum(r, 8.0) * p_h.outlier_cost + bias
                )
            else:
                r = symmetric_error_sq(M, x1, x2) / thr_h
                cols.append(np.minimum(r, 8.0) * p_h.outlier_cost)
        cols.append(np.full(n, p_h.outlier_cost))
        return np.stack(cols, axis=1)  # (N, K+1)

    active = np.ones(k, bool)
    h_costs = np.concatenate([np.full(k, p_h.label_cost), [0.0]])
    d = union_costs(active)
    labels, _ = native.expansion_solve(d, pq, ew, p_h.spatial_weight,
                                       h_costs)
    labels = labels.astype(np.int32)

    # joint label-cost prune over the union space (same collective-gain
    # rule as the TPU polish and the fundamental path's prune): a
    # near-planar slice of a motion blob dies here because its members
    # switch to the blob's F almost for free, while a true plane's
    # members have no cheap alternative.
    for _ in range(prune_rounds):
        if active.sum() <= 0:
            break
        d = union_costs(active)
        best_gain, best_j = 0.0, None
        for j in range(k):
            if not active[j]:
                continue
            member = labels == j
            if not member.any():
                best_gain, best_j = p_h.label_cost, j
                break
            alt = d.copy()
            alt[:, j] = np.inf
            switch = (alt.min(axis=1) - d[np.arange(n), labels])[member]
            gain = p_h.label_cost - switch.sum()
            if gain > best_gain:
                best_gain, best_j = gain, j
        if best_j is None:
            break
        active[best_j] = False
        d = union_costs(active)
        labels, _ = native.expansion_solve(
            d, pq, ew, p_h.spatial_weight, h_costs
        )
        labels = labels.astype(np.int32)

    # refit alternation on the motion half (mirrors models/mixed.py's
    # polish_refits: stage-F models frozen through the polish claim only
    # their truncated member sets; a Tukey refit on the polished members
    # re-grows them), accepted per-model if member-restricted inliers
    # don't shrink, then one expansion relabel
    for _ in range(2):
        changed = False
        for j in range(k):
            if not (active[j] and is_f[j]):
                continue
            member = labels == j
            if member.sum() < 12:
                continue
            r_own = f_sampson_sq(models[j], x1, x2) / thr_f
            w = member * np.maximum(0, 1 - r_own) ** 2 * (r_own < 1)
            if (w > 0).sum() < 12:
                continue
            Fn = fundamental_8pt(x1, x2, w)
            if Fn is None or not np.isfinite(Fn).all():
                continue
            r_new = f_sampson_sq(Fn, x1, x2) / thr_f
            if (r_new[member] < 1).sum() >= (r_own[member] < 1).sum():
                models[j] = Fn
                changed = True
        if not changed:
            break
        d = union_costs(active)
        labels, _ = native.expansion_solve(
            d, pq, ew, p_h.spatial_weight, h_costs
        )
        labels = labels.astype(np.int32)

    # per-class min-support prune + outlier fold-in (mirrors the TPU
    # bookkeeping)
    support = np.array([(labels == j).sum() for j in range(k)])
    min_sup = np.where(is_f > 0, p_f.min_inliers, p_h.min_inliers)
    active &= support >= min_sup
    labels = np.where(active[np.clip(labels, 0, k - 1)] & (labels < k),
                      labels, k).astype(np.int32)
    return labels, np.stack(models), is_f, int(active.sum())


def misclassification_vs_gt(labels, gt, outlier_label):
    from multih_tpu.utils import evaluation

    return evaluation.misclassification_error(labels, gt, outlier_label)
