"""Configuration for the Multi-H TPU pipeline.

The reference (danini/multi-h, C++) exposes its parameters as CLI args and
compile-time constants parsed in ``src/main.cpp`` (SURVEY.md §5 "Config /
flag system"; the reference mount was empty this session — see SURVEY.md §0 —
so defaults follow the Multi-H BMVC 2016 paper and BASELINE.json:5).

Everything here is a frozen (hashable) dataclass so a config instance can be
passed as a static argument to ``jax.jit`` — all shapes and loop trip counts
derived from it are compile-time constants, as required for XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Literal


@dataclasses.dataclass(frozen=True)
class MultiHConfig:
    """All tunables of the pipeline. Mirrors the reference CLI 1:1 in spirit:
    inlier threshold / smoothness weight / label cost / iteration caps
    (SURVEY.md §5), plus the TPU-specific static-shape knobs the reference
    does not need (padded sizes, fixed iteration counts).
    """

    # --- model class (above-parity: multi-model fitting) ---
    model: Literal["homography", "fundamental"] = "homography"
    # "homography": the reference's problem — multiple scene planes
    # (minimal 4-pt DLT, transfer residuals, SURVEY.md §2 C5/C6).
    # "fundamental": multi-motion segmentation (AdelaideRMF's other
    # half) — minimal 8-pt solves, epipolar residuals (ops/fmodel.py);
    # the PEARL machinery, selection, labeling and sharding are shared.
    # Residual names map per model: symmetric = symmetric transfer /
    # symmetric epipolar distance, transfer = forward-only (half the
    # FLOPs on either model), sampson = first-order geometric.
    f_sample_points: int = 8
    # Points per fundamental-model sample (8 or 12; ignored for
    # homographies). 8 = the textbook minimal sample (Givens-QR
    # nullspace). 12 = two 6-point locality clusters solved by normal
    # equations + 9x9 eigensolve. Raw 8-point Fs on a compact 3D blob
    # at ~0.5 px noise are noise-dominated (measured: clean minimal
    # samples of a motion cover a mean 0.20 of it; 12-point samples
    # 0.99) — but the A/B over the 9-scene motion suite (3 keys each)
    # kept 8 for THIS pipeline: the claim/LO/roster machinery already
    # rescues noisy minimal samples (mean 4.72% at 8 vs 5.30% at 12,
    # 27/27 vs 26/27 correct motion counts — fewer, larger clusters
    # lose sample diversity). The float64 parity oracle, which has a
    # simpler growth loop, uses 12 (tools/reference_pearl.py).
    f_split_refine: bool = True
    f_split_iterations: int = 4
    # Split-refine phase (fundamental only): after the main PEARL phase,
    # every active model's member set is split spatially in half (points
    # are Morton-sorted, so the index median IS a spatial split), an F is
    # refit on each half, the roster is re-selected coverage-greedily
    # from {survivors + splits}, and a short second PEARL phase
    # (f_split_iterations) runs. This is the split move PEARL lacks: an
    # epipolar 'bridge' model covering two motions is stable under
    # member refits (its member set stays mixed, so the weighted LSQ
    # stays a bridge), but its spatial halves are pure motions — they
    # win pointwise on data cost and the bridge dies to the label-cost
    # prune. Measured: fm suite mean 4.91 -> lower with splits; the
    # homography path never runs this (planes cannot bridge).
    f_exclusive_refine: bool = True
    f_exclusive_iterations: int = 3
    # Exclusive-core refit phase (fundamental only, r5; mirrors the
    # oracle's PearlParams.exclusive_iterations): after split-refine,
    # alternate {refit every active model on the Tukey-weighted members
    # that are inside tau of NO other active model; relabel}, keeping
    # the new configuration iff the full PEARL energy decreases. This
    # escapes the PARTIAL-bridge fixed point: a converged F covering its
    # own motion plus a thin slice of a neighbor's points at
    # DEEP-inlier residuals (fm2_b: ~20 foreign points at 0.1-0.4 px).
    # No margin or purity test can see those points (they are nowhere
    # near the tau boundary), and member LSQ including them is a fixed
    # point of PEARL's refit step — but they are SHARED inliers (their
    # own motion's model also holds them inside tau), so the exclusive
    # core drops exactly them. Energy-tested because the move is
    # aggressive: measured on the suite, every partial-bridge
    # configuration had HIGHER energy than its GT configuration (an
    # optimizer gap, not an objective one); oracle suite mean
    # 3.62 -> 2.74, fm2_b 5.0 -> 1.0 (docs/PERF.md r5 study).
    f_resample_lo: bool = True
    f_resample_subsets: int = 16
    f_resample_iterations: int = 2
    # Member-resample LO phase (fundamental only, r5; LO-RANSAC's
    # inner-sampling step, Lebeda et al. BMVC 2012; mirrors the oracle's
    # PearlParams.resample_iterations): after the exclusive phase,
    # sample f_resample_subsets random 12-point subsets of each model's
    # members, solve each (overdetermined normal-equation F), score by
    # the TRIMMED (best-80%) member residual sum, Tukey-polish the
    # winner, and feed the best-of-{incumbent, winner, polish} into the
    # same energy-tested joint/sequential acceptance as the exclusive
    # phase. Escapes the POLLUTED-BASIN fixed point the exclusive core
    # cannot: ~10% foreign members that are NOT shared inliers of any
    # other model stay in the exclusive core, and the weighted LSQ on
    # that set is self-consistently off its true motion — but a random
    # 12-subset is all-pure with ~(0.9)^12 ~ 28% odds, and trimming
    # drops the foreign tail from the score (a capped/MSAC score would
    # keep preferring the bridge: its foreign points are DEEP inliers).
    # Measured on fm4_a (r5's worst parity scene): the weak model's
    # median Sampson on its GT motion 0.62-0.77 -> 0.29 px with lost
    # tail -> 0 in every key (docs/PERF.md r5).
    f_member_acceptance: bool = True
    # Fundamental refit acceptance counts MEMBER inliers, not global
    # (pipeline._pearl_iteration): a bridge F must be allowed to purify
    # toward its members even when the purified F has fewer global
    # inliers. False = the homography rule (global count) for A/B and
    # path-gate tests.
    f_union_merge: bool = True
    # Energy-tested union-refit merge of fragment pairs each PEARL
    # iteration (fundamental only). False disables the move (A/B /
    # path-gate surface; the Jaccard duplicate merge still runs).

    # --- geometry / residuals (reference C6) ---
    inlier_threshold: float = 3.0       # px; squared internally
    residual: Literal["symmetric", "transfer", "sampson"] = "symmetric"
    rank_residual: Literal["", "symmetric", "transfer", "sampson"] = ""
    # residual kind for RANKING-ONLY inlier sweeps (the claim-chain
    # candidate pick and the verify_subsample pre-pass, both of which
    # only choose a superset that is re-scored / re-grown at full
    # `residual` fidelity before anything is committed). "" = use
    # `residual`. "transfer" halves the largest kernel sweep of the
    # stress fit (the forward-only residual drops the adjugate
    # back-projection) — adoption A/B in docs/PERF.md.

    # --- hypothesis generation (reference C5) ---
    n_hypotheses: int = 2048            # minimal 4-pt samples per fit
    max_points: int = 512               # padded correspondence count N
    progressive_rounds: int = 4         # guided re-sampling rounds: claim
                                        # found planes' inliers, re-sample
                                        # among the rest (1 = plain sampling)
    claims_per_round: int = 1           # R: planes claimed per progressive
                                        # round — the round's top-R
                                        # candidates are LO-grown together
                                        # and greedily accepted when
                                        # mutually disjoint (>=50% novel
                                        # inliers, >= min_inliers novel),
                                        # so one round can retire several
                                        # planes instead of one. Default 1
                                        # (claim precision): measured A/B,
                                        # R=4 costs ~0.1-0.15 pp suite mean
                                        # on outlier-heavy scenes. At
                                        # stress scale rounds=2/R=8 is both
                                        # faster (34 vs 37 ms device) and
                                        # equally accurate — big scenes
                                        # should trade rounds for claims
                                        # (bench.py does; docs/PERF.md)

    # --- candidate selection / mode-seeking analog (reference C7) ---
    n_candidates: int = 256             # top-M hypotheses kept for NMS
    lo_rounds: int = 3                  # LO refit rounds on the top-M
                                        # (thresholds shrink 4t, 2t, t)
    lo_shrink: float = 0.0              # LO threshold schedule base: round
                                        # i of R grows at
                                        # sqrt(shrink^(R-1-i)) * tau.
                                        # 0.0 = auto per model class:
                                        # 4.0 for homographies (classic
                                        # 4t, 2t, t — a plane H from a
                                        # tight quad extrapolates
                                        # quadratically badly and needs
                                        # the wide rounds to grow), 1.0
                                        # (fixed-tau growth) for
                                        # fundamentals — epipolar
                                        # constraints are 1-D, so a wide
                                        # first round absorbs OTHER
                                        # motions' points and LO converts
                                        # pure samples into two-motion
                                        # 'bridge' basins that every later
                                        # stage inherits (measured: motion
                                        # suite mean 4.60 -> 4.00 at
                                        # fixed tau; 2.0 and 5-round
                                        # fixed-tau variants both worse —
                                        # docs/PERF.md F-accuracy study)
    max_labels: int = 16                # K: max simultaneous planes
    nms_iou: float = 0.8                # inlier-set IoU above which a
                                        # hypothesis is a duplicate
    merge_iou: float = 0.5              # post-refit plane merge threshold

    # --- neighborhood graph (reference C8) ---
    knn_k: int = 6                      # spatial neighbors per point
    sampling_motion_weight: float = 2.0 # locality-biased sampling draws
                                        # neighbors in (x1, w*(x2-x1))
                                        # space: same-plane points cluster
                                        # by motion even when spatially
                                        # interleaved (clean-quad rate on
                                        # interleaved scenes: 1% spatial ->
                                        # 58% at w=2). 0 = spatial only
                                        # (reuses the labeling graph).
                                        # The Potts labeling graph itself
                                        # stays purely spatial (C8).
    knn_row_block: int = 0              # row-block size for the blocked
                                        # k-NN build (memory O(N*block));
                                        # 0 = auto: dense (N,N) for
                                        # N <= 4096, 2048-row blocks above
    claim_subsample: int = 4            # stride for the progressive-round
                                        # claim ranking counts (argmax
                                        # selection only — claim masks
                                        # and all verification stay
                                        # full-resolution); 1 = off
    verify_subsample: int = 1           # stride for the full-pool
                                        # verification RANKING counts
                                        # (Morton-strided = spatially
                                        # uniform): the top
                                        # verify_rescore*n_candidates
                                        # hypotheses by subsampled count
                                        # are then rescored at FULL
                                        # resolution before the top-M
                                        # pick, so selected candidates
                                        # always carry exact counts.
                                        # 1 = off (default: exact
                                        # ranking). The S x N sweep is
                                        # the largest stress stage
                                        # (docs/PERF.md); stride 4 cuts
                                        # it ~4x for ~0.4% of its cost
                                        # in rescoring.
    verify_rescore: int = 4             # superset factor M_pre =
                                        # verify_rescore * n_candidates
                                        # for the full-res rescore pass
                                        # (only used when
                                        # verify_subsample > 1)
    knn_approx: bool = True             # lax.approx_max_k (recall 0.98,
                                        # TPU-native) instead of exact
                                        # top_k in the k-NN builds; the
                                        # graph only shapes sampling
                                        # locality + Potts smoothing, and
                                        # approx_max_k is exact on CPU,
                                        # so tests/goldens are unaffected.
                                        # Only reached when knn_window is
                                        # off or ungated (the windowed
                                        # build is exact everywhere).
    knn_window: bool = True             # restrict k-NN search to the
                                        # 3-block Morton window when the
                                        # banded-operator gate holds
                                        # (spatial_sort, N % agree_block
                                        # == 0, N >= 2 blocks): O(N*block)
                                        # build, backend-identical exact
                                        # top_k, and zero far edges by
                                        # construction — the basis of the
                                        # fused MRF kernel. False restores
                                        # the full-range k-NN search.
    window_sampling: bool = False       # window-stratified minimal
                                        # sampling: each sample draws its
                                        # 4 points inside a static Morton
                                        # window and the coordinate gather
                                        # runs as per-window one-hot MXU
                                        # contractions instead of a
                                        # 4S-index XLA row gather
                                        # (sampling.windowed_quadruples;
                                        # ~4.4 ms -> sub-ms at the stress
                                        # shape, docs/PERF.md). Needs the
                                        # windowed k-NN gate to hold and
                                        # n_hypotheses per round divisible
                                        # by N/agree_block; default off —
                                        # the stress bench configs enable
                                        # it after the accuracy A/B.
    refit_moments: bool = True          # batched weighted DLT refits via
                                        # the 30-moment matmul formulation
                                        # (geometry.homography_refit_batch)
                                        # instead of materializing per-
                                        # candidate DLT row tensors; False
                                        # restores the vmapped reference
                                        # path for parity debugging
    agree_block: int = 256              # block size of the banded neighbor
                                        # agreement operator (PEARL sweeps
                                        # as block-tridiagonal MXU matmuls
                                        # instead of gather/scatter; needs
                                        # spatial_sort and N % block == 0,
                                        # else the gather path runs).
                                        # 0 disables the banded operator.

    # --- PEARL energy (reference C9/C10, gco alpha-expansion analog) ---
    spatial_weight: float = 0.1         # lambda: Potts smoothness weight
                                        # (swept on synthetic scenes; see
                                        # tools/ parity tuning)
    label_cost: float = 20.0            # beta: per-active-label penalty
    outlier_cost: float = 1.0           # data cost of the outlier label,
                                        # in units of truncated residual cost
    pearl_iterations: int = 8           # outer alternation count (fixed)
    meanfield_iterations: int = 6       # inner mean-field sweeps (fixed)
    icm_iterations: int = 2             # ICM polish sweeps (fixed)
    # (6/2 measured better AND ~20% faster than 10/4 on the benchmark
    # suite — heavier inner relaxation over-smooths before refits settle)
    temperature: float = 0.25           # final mean-field temperature
    temperature_start: float = 2.0      # annealed from this
    min_inliers: int = 10               # drop planes smaller than this

    # --- numerics ---
    dtype: Literal["float32"] = "float32"
    # "eigh" = XLA's native symmetric eigensolver: small HLO graph (fast
    # compile) and fast at refit-scale batches. "jacobi" = the unrolled
    # fixed-sweep solver (the Pallas-kernel algorithm) — use for very large
    # batches or kernels. Minimal solves don't use this (they go through
    # the Givens-QR nullspace path).
    eig_method: Literal["eigh", "jacobi", "inverse_iteration"] = "eigh"
    eig_iterations: int = 6             # Jacobi sweeps / inverse-iter steps

    # --- execution ---
    spatial_sort: bool = True           # Morton-order points at fit entry:
                                        # neighbor gathers become
                                        # near-diagonal (TPU gathers are
                                        # locality-sensitive; ~3.4x faster
                                        # labeling sweeps at N=10k). Exact.
    use_pallas: bool = True             # route hot ops through Pallas
    mrf_fused_front: bool = False
    # Fuse the residual+data-cost chain into the mean-field kernel's load
    # pass (mean_field_fused_front; homography transfer/symmetric kinds).
    # Implemented, parity-tested, and measured a WASH at the stress shape
    # — docs/PERF.md's last named headroom idea (est. 1-2 ms) does not
    # materialize: the traced PEARL while-loop is 3.21 ms fused vs
    # 3.15 ms unfused, because XLA already folds the (K, N) residual +
    # cost chain into ~free elementwise fusions, while the fused kernel
    # pays for it with in-kernel front work plus per-grid-step dct/r
    # output flushes. Kept (off) as the measured negative result and for
    # shapes where the XLA chain might not fuse (very large L).
                                        # kernels (effective on TPU backend;
                                        # CPU always uses the jnp reference)
    pallas_approx_rcp: bool = True      # fast hardware reciprocal in the
                                        # verification kernel (+6% end to
                                        # end); its ~2^-14 relative error
                                        # can flip threshold-boundary ties,
                                        # so counts may differ from the jnp
                                        # path by ~+-2 per hypothesis. False
                                        # = exact division (parity debug).
    residual_chunk: int = 512           # hypothesis-axis tile for the
                                        # residual sweep (bounds memory)

    @property
    def minimal_points(self) -> int:
        """Points per minimal sample: 4 (homography DLT) or 8 (8-point
        fundamental)."""
        return 8 if self.model == "fundamental" else 4

    @property
    def lo_shrink_eff(self) -> float:
        """Resolved LO schedule base (lo_shrink == 0.0 -> per-model auto;
        see the lo_shrink field comment)."""
        if self.lo_shrink > 0.0:
            return self.lo_shrink
        return 1.0 if self.model == "fundamental" else 4.0

    def __post_init__(self):
        if self.model not in ("homography", "fundamental"):
            # 'mixed' is deliberately NOT a config value: the mixed fit is
            # composed from TWO configs (models/mixed.py, CLI --model
            # mixed); accepting it here would silently run the homography
            # dispatch everywhere downstream (ADVICE r3, medium).
            raise ValueError(
                f"model must be 'homography' or 'fundamental', got "
                f"{self.model!r} (mixed fitting takes two configs via "
                f"models.mixed.make_fit_mixed)"
            )
        if self.n_candidates > self.n_hypotheses:
            object.__setattr__(self, "n_candidates", self.n_hypotheses)
        if self.max_labels > self.n_candidates:
            raise ValueError("max_labels must be <= n_candidates")
        if self.model == "fundamental" and self.window_sampling:
            raise ValueError(
                "window_sampling is a homography-path optimization "
                "(4-pt window gather); disable it for model='fundamental'"
            )
        if self.f_sample_points not in (8, 12):
            raise ValueError("f_sample_points must be 8 or 12")
        if (self.model == "fundamental" and self.f_sample_points == 12
                and self.knn_k < 5):
            raise ValueError(
                "f_sample_points=12 draws two 6-point clusters: "
                "knn_k >= 5 required"
            )


DEFAULT = MultiHConfig()
