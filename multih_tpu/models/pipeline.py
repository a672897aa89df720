"""The Multi-H pipeline: one jitted ``fit()`` from correspondences to
(per-point plane labels, homographies).

Reference equivalent: ``MultiH::run`` (SURVEY.md §2 C2, §3.1) — generate
hypotheses, collapse them to plane candidates, then PEARL-alternate labeling
and refitting until convergence. The reference runs these as sequential C++
loops with a graph-cut solver in the middle; here every stage is a
static-shape tensor program and the whole thing is a single XLA computation:
host -> device once at entry, device -> host once at exit (SURVEY.md §3.1,
BASELINE.json:5).

Stage map (reference component -> here):
  C5  hypothesis generation  -> threefry sampling + vmapped 4pt DLT
  C6  residual verification  -> chunked hypotheses x points contraction
  C7  mode-seeking           -> top-M + inlier-IoU NMS (selection.py)
  C9/C10 PEARL + alpha-exp   -> annealed mean-field + ICM (labeling.py)
  C12 LO refit               -> batched masked weighted DLT, all planes at
                                once, with an accept-if-better guard
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from multih_tpu.config import MultiHConfig
from multih_tpu.models import labeling, selection
from multih_tpu.ops import fmodel, geometry, sampling
from multih_tpu.ops.kernels import dlt_kernel


class FitResult(NamedTuple):
    """What the reference CLI prints/draws, as arrays (SURVEY.md §2 C1)."""

    labels: jax.Array          # (N,) int32 in [0, K]; K = outlier label
    homographies: jax.Array    # (K, 3, 3) float32, ||H||_F = 1
    active: jax.Array          # (K,) float {0,1} — which planes survived
    support: jax.Array         # (K,) float — inlier count per plane
    energy: jax.Array          # scalar — final PEARL energy
    energy_trace: jax.Array    # (pearl_iterations,) energy after each iter
    n_hypotheses_ok: jax.Array # scalar — non-degenerate hypothesis count
    n_far_dropped: jax.Array   # scalar int32 — far k-NN edges beyond the
                               # banded operator's capacity (0 in practice;
                               # nonzero means the Potts energy silently
                               # lost edges — surfaced per ADVICE r2)


def pad_points(x1, x2, gt_labels=None, max_points: int = 512):
    """Host-side helper: pad (n, 2) correspondence arrays to the static
    max_points with a validity mask. Reference C13 reads variable-length
    files; XLA needs static shapes (SURVEY.md §7 'dynamic shapes')."""
    import numpy as np

    n = x1.shape[0]
    if n > max_points:
        raise ValueError(f"{n} points > max_points={max_points}")
    pad = max_points - n
    x1p = np.pad(np.asarray(x1, np.float32), ((0, pad), (0, 0)))
    x2p = np.pad(np.asarray(x2, np.float32), ((0, pad), (0, 0)))
    valid = np.zeros((max_points,), np.float32)
    valid[:n] = 1.0
    out = (x1p, x2p, valid)
    if gt_labels is not None:
        out = out + (np.pad(np.asarray(gt_labels, np.int32), (0, pad),
                            constant_values=-1),)
    return out


def _interleave10(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of v (uint32) to even bit positions —
    the classic Morton magic-number expansion."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_order(pts: jax.Array, valid: jax.Array) -> jax.Array:
    """Spatial (Z-order) sort permutation of the points, invalid last.

    TPU gathers are locality-sensitive: with points in Morton order, k-NN
    neighbor indices become near-diagonal and every per-sweep gather in the
    PEARL labeling runs ~3.4x faster (measured at N=10k). The permutation
    is exact — the pipeline runs on permuted points and the labels are
    scattered back at the end.
    """
    big = jnp.asarray(1.0, pts.dtype) / jnp.asarray(0.0, pts.dtype)  # inf
    lo = jnp.min(jnp.where(valid[:, None] > 0, pts, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None] > 0, pts, -big), axis=0)
    extent = jnp.maximum(hi - lo, 1e-3)
    q = jnp.clip(
        ((pts - lo) / extent * 1023.0), 0.0, 1023.0
    ).astype(jnp.uint32)
    code = _interleave10(q[:, 0]) | (_interleave10(q[:, 1]) << 1)
    code = jnp.where(valid > 0, code, jnp.uint32(0xFFFFFFFF))
    return jnp.argsort(code)


def _thr(cfg: MultiHConfig, tau=None, dtype=jnp.float32):
    """Squared inlier threshold. `tau` may be a *traced* scalar (px): the
    threshold only ever feeds comparisons and weights, so a per-call tau
    needs no recompilation — the basis for auto-tau and no-recompile
    threshold sweeps."""
    if tau is None:
        return jnp.asarray(cfg.inlier_threshold**2, dtype)
    t = jnp.asarray(tau, dtype)
    return t * t


# ---------------------------------------------------------------------------
# model-class dispatch (homography = the reference's problem; fundamental =
# the multi-motion extension, ops/fmodel.py). Everything downstream of the
# residual matrix — selection, labeling, PEARL, sharding — is shared.
# ---------------------------------------------------------------------------

def model_residual_matrix(Ms, x1, x2, kind, cfg: MultiHConfig):
    """(S, 3, 3) models x (N, 2) points -> (S, N) squared residuals of the
    configured model class (px^2-comparable on either)."""
    if cfg.model == "fundamental":
        return fmodel.residual_matrix_f(Ms, x1, x2, kind)
    return geometry.residual_matrix(Ms, x1, x2, kind)


def _prepare_refit_basis(x1, x2, cfg: MultiHConfig):
    if cfg.model == "fundamental":
        return fmodel.prepare_refit_f(x1, x2)
    return geometry.prepare_refit(x1, x2)


def _refit_batch(w, basis, cfg: MultiHConfig):
    """(C, N) weights -> (C, 3, 3) moment-formulated batched refit of the
    configured model class (one MXU matmul either way)."""
    if cfg.model == "fundamental":
        return fmodel.fundamental_refit_batch(
            w, basis, cfg.eig_method, cfg.eig_iterations,
            eig_pallas=_pallas_enabled(cfg),
        )
    return geometry.homography_refit_batch(
        w, basis, cfg.eig_method, cfg.eig_iterations,
        eig_pallas=_pallas_enabled(cfg),
    )


def _refit_direct(x1, x2, w, cfg: MultiHConfig):
    """Single-candidate weighted refit (the cfg.refit_moments=False
    reference path)."""
    if cfg.model == "fundamental":
        from multih_tpu.ops import epipolar

        return epipolar.fundamental_8pt(x1, x2, w, cfg.eig_method)
    return geometry.homography_from_points(
        x1, x2, w, cfg.eig_method, cfg.eig_iterations
    )


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

def _round_sample_indices(key, avail, nbr_idx, nbr_ok, n_samples, m=4):
    """(S, m) minimal-sample index tuples for one progressive round: half
    uniform over `avail`, half locality-biased with `nbr_ok` edge
    preference. Pure threefry counter math — cheap, and computed
    identically on every shard of a hypothesis-sharded fit (each shard
    then solves only its own slot slice; SURVEY.md §2 P3).

    m=8/12 (fundamental): the locality-biased half draws TWO independent
    seed+neighbor clusters per sample (4+4 or 6+6) — two spread clusters
    condition the epipolar solve far better than one tight
    m-neighborhood, and it keeps working at any knn_k >= m//2 - 1."""
    k_u, k_l = jax.random.split(key)
    s_local = n_samples // 2
    idx_u = sampling.sample_indices(k_u, n_samples - s_local, avail > 0,
                                    m=m)
    if m == 4:
        idx_l = sampling.localized_sample_indices(
            k_l, s_local, avail > 0, nbr_idx, nbr_ok
        )
    else:
        assert m in (8, 12), m
        k_a, k_b = jax.random.split(k_l)
        idx_l = jnp.concatenate(
            [
                sampling.localized_sample_indices(
                    k_a, s_local, avail > 0, nbr_idx, nbr_ok,
                    cluster=m // 2,
                ),
                sampling.localized_sample_indices(
                    k_b, s_local, avail > 0, nbr_idx, nbr_ok,
                    cluster=m // 2,
                ),
            ],
            axis=1,
        )
    return jnp.concatenate([idx_u, idx_l], axis=0)  # (S, m)


def _solve_minimal_f(x1, x2, avail, idx, cfg: MultiHConfig):
    """Fundamental solves for the given (S, m) sample indices
    (model='fundamental'; m = cfg.f_sample_points). Same
    single-row-gather trick as the homography path: one (S, m, 8)
    gather of a packed (N, 8) array instead of three separate gathers.
    m=8 solves the exact minimal system by Givens-QR nullspace; m=12
    the overdetermined one by normal equations + 9x9 eigensolve."""
    packed_src = jnp.concatenate(
        [x1, x2, avail[:, None], jnp.zeros((x1.shape[0], 3), x1.dtype)],
        axis=1,
    )  # (N, 8)
    g = packed_src[idx]                    # (S, m, 8)
    if idx.shape[1] == 8:
        Fs = fmodel.fundamental_8pt_batch_qr(g[:, :, 0:2], g[:, :, 2:4])
    else:
        Fs = fmodel.fundamental_npt_batch(
            g[:, :, 0:2], g[:, :, 2:4],
            cfg.eig_iterations, cfg.eig_method,
        )
    uses_pad = jnp.any(g[:, :, 4] == 0, axis=1)
    finite = jnp.all(jnp.isfinite(Fs.reshape(-1, 9)), axis=1)
    ok = (jnp.logical_not(uses_pad) & finite).astype(x1.dtype)
    return Fs, ok


def _solve_minimal(x1, x2, avail, idx, cfg: MultiHConfig):
    """Minimal 4-pt DLT solves for the given (S, 4) sample indices.

    TPU gather cost is per-index-latency-bound and layout-sensitive, so
    the coordinates come from ONE row-gather of a packed (N, 8) array
    (4S index lookups instead of the 12S of separate x1/x2/avail
    gathers), immediately transposed to a dense (32, S) coordinate-major
    form — after which every extract is a dense lane-major row read and
    the Pallas DLT kernel consumes its native (16, S) packing with no
    (S, 4, 2) round trip (whose 2-wide minor dim pads to 128 lanes; the
    original triple gather traced at 8.3 ms/fit at stress scale)."""
    s = idx.shape[0]
    packed_src = jnp.concatenate(
        [x1, x2, avail[:, None], jnp.zeros((x1.shape[0], 3), x1.dtype)],
        axis=1,
    )  # (N, 8)
    g = packed_src[idx]                    # (S, 4, 8): one gather
    gt = g.reshape(s, 32).T                # (32, S): dense on lanes
    return _solve_from_gt(gt, cfg)


def _solve_from_gt(gt, cfg: MultiHConfig):
    """Shared solve tail: (32, S) coordinate-major rows (row 8q+c =
    channel c of quadruple point q; channel 4 = avail at the point) ->
    (Hs, ok). Fed either by `_solve_minimal`'s row gather or by
    `sampling.windowed_quadruples`' MXU window gather."""
    row = lambda q, c: gt[8 * q + c]       # point q, channel c -> (S,)
    x1x = jnp.stack([row(q, 0) for q in range(4)])  # (4, S)
    x1y = jnp.stack([row(q, 1) for q in range(4)])
    x2x = jnp.stack([row(q, 2) for q in range(4)])
    x2y = jnp.stack([row(q, 3) for q in range(4)])
    degenerate = geometry.quad_degenerate_t(x1x, x1y, 1e-4) | \
        geometry.quad_degenerate_t(x2x, x2y, 1e-4)
    uses_pad = (
        (row(0, 4) == 0) | (row(1, 4) == 0)
        | (row(2, 4) == 0) | (row(3, 4) == 0)
    )
    ok = jnp.logical_not(degenerate | uses_pad).astype(gt.dtype)
    if _pallas_enabled(cfg):
        # SURVEY.md §7 stage 7b: batch-on-lanes Pallas solve — the vmapped
        # QR pads the 9-wide matrices to 128 lanes and is ~20x slower at
        # the stress scale (docs/PERF.md)
        packed = jnp.concatenate(
            [jnp.stack([x1x, x1y], axis=1).reshape(8, -1),
             jnp.stack([x2x, x2y], axis=1).reshape(8, -1)], axis=0
        )  # (16, S): xa ya xb yb ... per image
        Hs = dlt_kernel.homography_4pt_pallas_packed(packed)
    else:
        p1 = jnp.stack([x1x, x1y], axis=-1).transpose(1, 0, 2)  # (S,4,2)
        p2 = jnp.stack([x2x, x2y], axis=-1).transpose(1, 0, 2)
        Hs = geometry.homography_4pt_batch_qr(p1, p2)
    return Hs, ok


def generate_hypotheses(key, x1, x2, valid, nbr_idx, cfg: MultiHConfig,
                        tau=None, shard=None, window_block=0):
    """C5 + C7 seeding: threefry-sampled minimal 4-pt DLT solves, fully
    vmapped, in `cfg.progressive_rounds` progressive guided rounds.

    The reference reaches full per-plane coverage by drawing one hypothesis
    per correspondence from its local affine frame (Multi-H paper §3.1);
    with point-only input the equivalent coverage guarantee comes from
    progressive re-sampling: after each round, the round's top-R
    candidates (R = cfg.claims_per_round) are LO-grown TOGETHER in one
    batched refine, greedily accepted when mutually disjoint (>= 50%
    novel inliers and >= min_inliers of them), and their inliers
    'claimed'; the next round samples only among unclaimed points — so
    later/smaller planes get dense clean samples instead of competing
    with already-found structure, and one round can retire several planes
    at once. All rounds are static-shape; 'claiming' is a soft mask,
    never a shape change.

    shard: optional (axis_name, n_shards) — call is inside a shard_map
    over that mesh axis. Sample indices (cheap counter math) are computed
    replicated; the expensive solves and claim-ranking counts run only on
    this shard's slice of each round's slot range, and the per-round
    top-R candidate exchange is an all_gather of R (count, slot, H)
    triples per shard. Results are EXACTLY the unsharded pool: the same
    slots hold the same hypotheses, claims pick the same candidates
    (count-desc, slot-asc tie order on both paths), so a hyp-sharded fit
    is bit-compatible with the single-device fit (tested). Returns
    (Hs_local, ok_local, global_slots) instead of (Hs, ok); claimed
    planes ride shard 0 with their unsharded slot ids.
    """
    rounds = max(1, cfg.progressive_rounds)
    n_claim = max(1, cfg.claims_per_round)
    s_round = cfg.n_hypotheses // rounds
    s_rem = cfg.n_hypotheses - s_round * (rounds - 1)
    thr = _thr(cfg, tau, x1.dtype)

    if shard is not None:
        axis_name, n_shards = shard
        d = jax.lax.axis_index(axis_name)
    else:
        axis_name, n_shards, d = None, 1, 0

    claimed = jnp.zeros_like(valid)
    pools, oks, slots = [], [], []
    base = 0  # global slot of the next pool segment (static)
    keys = jax.random.split(key, rounds)
    for r in range(rounds):
        avail = valid * (1.0 - claimed)
        # if a round runs out of unclaimed points, fall back to all valid
        # (branch-free: blend by the predicate)
        enough = (jnp.sum(avail) >= 16.0).astype(x1.dtype)
        avail = avail * enough + valid * (1.0 - enough)
        n_s = s_rem if r == rounds - 1 else s_round
        nb_win = x1.shape[0] // window_block if window_block > 0 else 0
        use_win = (
            window_block > 0 and n_s % max(nb_win, 1) == 0
            and (shard is None or nb_win % n_shards == 0)
        )
        if use_win:
            # window-stratified sampling + MXU window gather: replaces
            # the 4S-index row gather AND the avail[nbr_idx] edge-mask
            # gather (docs/PERF.md "Remaining headroom"). Columns are
            # window-major, so a shard's window subset IS its contiguous
            # global slot range — draws replicated, gathers+solves local,
            # bit-compatible with the unsharded pool (same contract as
            # the _round_sample_indices path).
            if shard is not None:
                s_loc = n_s // n_shards
                wrange = (d * (nb_win // n_shards), nb_win // n_shards)
            else:
                s_loc = n_s
                wrange = None
            gt = sampling.windowed_quadruples(
                keys[r], x1, x2, avail, nbr_idx, n_s, window_block,
                use_kernel=_pallas_enabled(cfg), window_range=wrange,
            )
            Hs_r, ok_r = _solve_from_gt(gt, cfg)
        else:
            nbr_ok = avail[nbr_idx]
            m_pts = (cfg.f_sample_points if cfg.model == "fundamental"
                     else cfg.minimal_points)
            idx = _round_sample_indices(
                keys[r], avail, nbr_idx, nbr_ok, n_s, m=m_pts
            )
            if shard is not None:
                s_loc = n_s // n_shards
                assert s_loc * n_shards == n_s, (n_s, n_shards)
                idx = jax.lax.dynamic_slice(
                    idx, (d * s_loc, 0), (s_loc, m_pts)
                )
            else:
                s_loc = n_s
            if cfg.model == "fundamental":
                Hs_r, ok_r = _solve_minimal_f(x1, x2, avail, idx, cfg)
            else:
                Hs_r, ok_r = _solve_minimal(x1, x2, avail, idx, cfg)
        pools.append(Hs_r)
        oks.append(ok_r)
        slots.append(base + d * s_loc + jnp.arange(s_loc))
        if r == rounds - 1:
            break
        # claim: rank this round's (local) pool by inliers among unclaimed
        # points — on a strided Morton subsample (spatially uniform after
        # the fit's spatial sort): the ranking only picks candidates, and
        # the top planes lead by hundreds of inliers, so it survives 4x
        # subsampling while the full-resolution sweep was ~17% of the
        # stress fit (docs/PERF.md). Claim masks below stay full-res.
        ss = max(1, cfg.claim_subsample)
        counts_av = count_inliers(
            Hs_r, x1[::ss], x2[::ss], avail[::ss], cfg, tau,
            kind=cfg.rank_residual or None,
        ) * ok_r
        c_top, i_top = jax.lax.top_k(counts_av, min(n_claim, s_loc))
        H_top = Hs_r[i_top]
        if shard is not None:
            # exchange top-R candidates; global order = (count desc,
            # slot asc) — exactly jax.lax.top_k's stable tie order on the
            # unsharded pool, so both paths grow the same planes
            slot_top = i_top + d * s_loc
            c_all = jax.lax.all_gather(c_top, axis_name).reshape(-1)
            s_all = jax.lax.all_gather(slot_top, axis_name).reshape(-1)
            H_all = jax.lax.all_gather(H_top, axis_name).reshape(-1, 3, 3)
            order = jnp.lexsort((s_all, -c_all))[:n_claim]
            H_top = H_all[order]
        # LO-grow all R candidates in one batched refine (replicated under
        # sharding: R*9 floats of input, identical math on every shard)
        H_grown = lo_refine_candidates(
            H_top, x1, x2, valid, cfg, cfg.lo_rounds, tau
        )
        r_grown = model_residual_matrix(H_grown, x1, x2, cfg.residual,
                                        cfg)
        inl = (r_grown < thr).astype(x1.dtype) * valid[None, :]  # (R, N)
        # greedy disjoint accept, strongest first: a candidate claims only
        # if most of its support is new territory — duplicates of already-
        # claimed planes are left for the main NMS/merge machinery
        accepted = []
        for j in range(H_grown.shape[0]):
            novel = inl[j] * (1.0 - claimed)
            n_novel = jnp.sum(novel)
            acc = (
                (n_novel >= cfg.min_inliers)
                & (n_novel >= 0.5 * jnp.sum(inl[j]))
            ).astype(x1.dtype)
            claimed = jnp.clip(claimed + inl[j] * acc, 0.0, 1.0)
            accepted.append(acc)
        acc_v = jnp.stack(accepted)
        if shard is not None:
            # claimed planes ride shard 0 (every shard knows them; only
            # one may surface them to the verification sweep)
            acc_v = acc_v * (d == 0).astype(x1.dtype)
        pools.append(H_grown)
        oks.append(acc_v)
        slots.append(base + n_s + jnp.arange(H_grown.shape[0]))
        base += n_s + H_grown.shape[0]

    Hs = jnp.concatenate(pools, axis=0)
    ok = jnp.concatenate(oks, axis=0)
    if shard is not None:
        return Hs, ok, jnp.concatenate(slots, axis=0).astype(jnp.int32)
    return Hs, ok


def _pallas_enabled(cfg: MultiHConfig) -> bool:
    """Pallas kernels target the TPU backend; CPU tests keep the jnp
    reference path (SURVEY.md §7 stage 7). Evaluated at trace time."""
    return cfg.use_pallas and jax.default_backend() == "tpu"


def banded_gate(cfg: MultiHConfig, n_pts: int) -> bool:
    """Whether the banded agreement operator (and the windowed k-NN that
    feeds it) is eligible: Morton-sorted points and a block-aligned N.
    THE single source of truth — fit() branches on this, and
    tests/test_path_gates.py asserts it, so a gate regression fails a
    named test instead of silently changing numerics (VERDICT r4
    task 7)."""
    return (cfg.agree_block > 0 and cfg.spatial_sort
            and n_pts % cfg.agree_block == 0
            and n_pts >= 2 * cfg.agree_block)


def fused_front_gate(cfg: MultiHConfig, adj, has_pt_mesh: bool) -> bool:
    """Whether _pearl_iteration may run the fused residual+data-cost+
    mean-field kernel (config.mrf_fused_front): Pallas on, a far-edge-
    free banded adjacency, single-device point axis (a Pallas call
    cannot carry the pt-mesh sharding constraints on r), and one of the
    homography residual kinds the kernel implements."""
    return (_pallas_enabled(cfg) and cfg.mrf_fused_front
            and labeling._mrf_kernel_ok(adj)
            and not has_pt_mesh and cfg.model == "homography"
            and cfg.residual in ("symmetric", "transfer"))


def graph_path(cfg: MultiHConfig, n_pts: int) -> str:
    """Which k-NN graph implementation fit() selects for these shapes:
    'windowed' (Morton 3-block window, banded), 'row_blocked' (exact
    full-range build), or 'row_blocked_approx' (cfg.knn_approx
    fallback). Mirrors fit()'s branch exactly (single source of truth
    for the windowed condition is banded_gate)."""
    if banded_gate(cfg, n_pts) and cfg.knn_window:
        return "windowed"
    return "row_blocked_approx" if cfg.knn_approx else "row_blocked"


def count_inliers(Hs, x1, x2, valid, cfg: MultiHConfig, tau=None,
                  kind: str | None = None):
    """C6 over the full pool without materializing (S, N).

    TPU: one Pallas launch — a 2-D (hyp, point) grid with on-chip count
    accumulation (kernels/residual_kernel.py) for every cfg.residual kind
    ('symmetric' forward+backward, 'transfer' forward-only, 'sampson'
    first-order reprojection — VERDICT r2 item 8). Elsewhere: scan
    hypothesis chunks with the jnp reference residual, reducing each
    immediately. With cfg.pallas_approx_rcp (default), kernel counts may
    differ from the jnp path by ~+-2 threshold-boundary ties.

    `kind` overrides cfg.residual for this sweep (ranking call sites
    pass cfg.rank_residual); None = cfg.residual.
    """
    kind = kind or cfg.residual
    thr = _thr(cfg, tau, x1.dtype)
    if _pallas_enabled(cfg):
        from multih_tpu.ops.kernels import residual_kernel

        # the kernel's F variants share the (TH, 9) hypothesis layout;
        # the 'f_' prefix selects the epipolar algebra
        k_kind = f"f_{kind}" if cfg.model == "fundamental" else kind
        return residual_kernel.inlier_counts_padded(
            Hs, x1, x2, valid, thr,
            hyp_tile=256, pt_tile=min(2048, max(512, x1.shape[0])),
            approx_rcp=cfg.pallas_approx_rcp, kind=k_kind,
        )
    s = Hs.shape[0]
    chunk = min(cfg.residual_chunk, s)
    pad = (-s) % chunk
    Hp = jnp.concatenate(
        [Hs, jnp.broadcast_to(jnp.eye(3, dtype=Hs.dtype), (pad, 3, 3))]
    ) if pad else Hs

    def per_chunk(h):
        r = model_residual_matrix(h, x1, x2, kind, cfg)
        return jnp.sum((r < thr).astype(x1.dtype) * valid[None, :], axis=1)

    counts = jax.lax.map(per_chunk, Hp.reshape(-1, chunk, 3, 3))
    return counts.reshape(-1)[:s]


# backward-compatible alias (older call sites / notebooks)
count_inliers_chunked = count_inliers


def _pt_constrain(mesh):
    """Sharding-constraint helper for the point (N) axis — SURVEY.md §5
    'long-context', second scaling axis (VERDICT r3 task 3).

    The fit is one jitted program; sharding it over points is done the
    idiomatic XLA way — annotate the point-carrying tensors with
    `with_sharding_constraint` and let GSPMD insert the collectives —
    rather than hand-writing a shard_map: the banded agreement operator
    is block-tridiagonal over Morton blocks, so its `jnp.roll` over the
    block axis lowers to exactly the one-block halo exchange
    (collective-permute) the decomposition calls for, the windowed k-NN
    build is per-block compute on the same layout, and the moment-refit /
    count reductions over N become partial sums + all-reduce.

    Returns c(x, *spec) which constrains when the mesh has a 'pt' axis of
    size > 1 and is the identity otherwise (zero cost in the common
    single-chip fit).
    """
    if mesh is None or mesh.shape.get("pt", 1) <= 1:
        return lambda x, *spec: x
    from jax.sharding import NamedSharding, PartitionSpec as P

    def c(x, *spec):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec))
        )

    c.is_pt_mesh = True  # _pearl_iteration gates the fused front on this
    return c


def replicated_ok(vals, axis_name) -> jax.Array:
    """Runtime replication guard for shard_map regions compiled with
    check_vma=False (VERDICT r3 task 7): all_gather each value and test
    exact equality across shards. Returns a float {0,1} scalar that IS
    replicated by construction (the all_gather + reduction is identical
    on every shard). Used by the sharding tests to close the gap between
    'parity-tested on these configs' and 'checked at runtime'."""
    ok = jnp.bool_(True)
    for v in vals:
        g = jax.lax.all_gather(v, axis_name)
        ok &= jnp.all(g == g[:1])
    return ok.astype(jnp.float32)


def _hypothesize_verify_sharded(key, x1, x2, valid, nbr_sample,
                                cfg: MultiHConfig, tau, mesh,
                                extra_Hs=None, extra_ok=None,
                                window_block=0, replication_check=False):
    """Hypothesis generation AND the verification sweep + top-M, sharded
    over the mesh's 'hyp' axis in one shard_map region (SURVEY.md §2 P3
    inside the full fit — round 3 extends the sharding from verification-
    only to the whole hypothesize+verify block, VERDICT r2 item 2).

    Each device solves and sweeps only its slice of every progressive
    round's slot range; cross-device traffic is R (count, slot, H)
    triples per claim round plus M (count, slot, H) triples for the final
    top-M — independent of pool size, so the collective cost stays
    constant as the pool scales past one chip (BASELINE.json:10).

    Slot bookkeeping reproduces the unsharded pool exactly (same slot ->
    same hypothesis, same tie order), so the sharded fit is
    bit-compatible with the single-device fit (tests/test_sharding.py).

    Returns (top_counts (M,), Hs_cand (M, 3, 3)), replicated.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_shards = mesh.shape["hyp"]
    m = cfg.n_candidates
    rounds = max(1, cfg.progressive_rounds)
    n_claim = max(1, cfg.claims_per_round)
    s_total = cfg.n_hypotheses + (rounds - 1) * n_claim
    tau_arr = jnp.asarray(
        cfg.inlier_threshold if tau is None else tau, x1.dtype
    )
    if extra_Hs is None:
        extra_Hs = jnp.zeros((0, 3, 3), x1.dtype)
        extra_ok = jnp.zeros((0,), x1.dtype)
    pad = (-extra_Hs.shape[0]) % n_shards
    if pad:
        extra_Hs = jnp.concatenate(
            [extra_Hs,
             jnp.broadcast_to(jnp.eye(3, dtype=x1.dtype), (pad, 3, 3))]
        )
        extra_ok = jnp.concatenate(
            [extra_ok, jnp.zeros((pad,), x1.dtype)]
        )

    def local_fn(key, x1, x2, valid, nbr, tau_arr, e_hs, e_ok):
        d = jax.lax.axis_index("hyp")
        with jax.named_scope("hypothesize"):
            Hs_loc, ok_loc, slot_loc = generate_hypotheses(
                key, x1, x2, valid, nbr, cfg, tau_arr,
                shard=("hyp", n_shards), window_block=window_block,
            )
        e_loc = e_hs.shape[0]  # shard_map already sliced the extras
        if e_loc:
            eslot = s_total + d * e_loc + jnp.arange(e_loc)
            Hs_loc = jnp.concatenate([Hs_loc, e_hs], axis=0)
            ok_loc = jnp.concatenate([ok_loc, e_ok], axis=0)
            slot_loc = jnp.concatenate(
                [slot_loc, eslot.astype(jnp.int32)], axis=0
            )
        # cfg.verify_subsample > 1: the local ranking sweep runs on the
        # (replicated) Morton-strided subsample and each shard surfaces
        # the larger M_pre pre-selection; the exact-count rescore of the
        # gathered global M_pre set runs replicated (M_pre x N — ~1% of
        # the pool sweep), so the final top-M carries exact counts and
        # stays bit-compatible with the unsharded two-stage pick (the
        # gathered lexsort order equals unsharded top_k's stable
        # (count desc, slot asc) order, and the rescore+top_k below is
        # the identical computation on every shard).
        vs = max(1, cfg.verify_subsample)
        m_sel = min(cfg.verify_rescore * m, s_total) if vs > 1 else m
        with jax.named_scope("verify"):
            # mirror the unsharded rule exactly (bit-compatibility):
            # rank_residual only when the exact-count rescore follows
            counts = count_inliers(
                Hs_loc, x1[::vs], x2[::vs], valid[::vs], cfg, tau_arr,
                kind=(cfg.rank_residual or None) if vs > 1 else None,
            ) * ok_loc
        m_loc = min(m_sel, counts.shape[0])
        c_loc, i_loc = jax.lax.top_k(counts, m_loc)
        # M (count, slot, H) triples per device on ICI; top-M replicated.
        # lexsort (count desc, slot asc) == lax.top_k's stable tie order
        # on the unsharded pool — bit-compatible candidate list.
        c_all = jax.lax.all_gather(c_loc, "hyp").reshape(-1)
        s_all = jax.lax.all_gather(slot_loc[i_loc], "hyp").reshape(-1)
        h_all = jax.lax.all_gather(Hs_loc[i_loc], "hyp").reshape(-1, 3, 3)
        n_ok = jax.lax.psum(jnp.sum(ok_loc), "hyp")
        if vs > 1:
            o_all = jax.lax.all_gather(ok_loc[i_loc], "hyp").reshape(-1)
            order = jnp.lexsort((s_all, -c_all))[:m_sel]
            h_pre = h_all[order]
            with jax.named_scope("verify_rescore"):
                counts_full = count_inliers(
                    h_pre, x1, x2, valid, cfg, tau_arr
                ) * o_all[order]
            c_fin, sel = jax.lax.top_k(counts_full, m)
            out = c_fin, h_pre[sel], n_ok
        else:
            order = jnp.lexsort((s_all, -c_all))[:m]
            out = c_all[order], h_all[order], n_ok
        if replication_check:
            return out + (replicated_ok(out, "hyp"),)
        return out

    n_out = 4 if replication_check else 3
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P("hyp"), P("hyp")),
        out_specs=(P(),) * n_out,
        # outputs ARE replicated (identical final selection on every
        # shard) but the static checker cannot infer it; the sharding
        # tests verify it at runtime via replication_check=True
        check_vma=False,
    )
    return fn(key, x1, x2, valid, nbr_sample, tau_arr, extra_Hs, extra_ok)


def refit_planes(Hs, labels, residuals, x1, x2, valid, cfg: MultiHConfig,
                 tau=None, basis=None):
    """C12: re-estimate every plane's H from its currently assigned points,
    all planes in one batched weighted DLT.

    Assignment alone is not enough: the labeling absorbs some true outliers
    (they happen to sit within tau), and unweighted LSQ lets them bias the
    plane. The reference refits on *inliers* of each plane (SURVEY.md §3.4);
    here the membership weight is additionally gated by the current residual
    and shaped by a Tukey-biweight falloff, which is both more robust and
    free on TPU (elementwise math feeding the same weighted-DLT reduction).
    Planes with too few members keep their previous H.
    """
    k = cfg.max_labels
    thr = _thr(cfg, tau, x1.dtype)
    member = (
        jax.nn.one_hot(labels, k + 1, dtype=x1.dtype)[:, :k] * valid[:, None]
    )  # (N, K)
    support = jnp.sum(member, axis=0)  # (K,)
    rr = jnp.clip(residuals.T / thr, 0.0, 1.0)  # (N, K)
    tukey = (1.0 - rr) ** 2 * (residuals.T < thr)
    w = member * tukey

    eff_support = jnp.sum((w > 0).astype(x1.dtype), axis=0)
    m_min = float(cfg.minimal_points)
    if cfg.refit_moments:
        # all K planes in one (K, N) x (N, 30|36) moment matmul
        if basis is None:
            basis = _prepare_refit_basis(x1, x2, cfg)
        Hs_mom = _refit_batch(w.T, basis, cfg)
        Hs_new = jnp.where(
            (eff_support >= m_min)[:, None, None], Hs_mom, Hs
        )
    else:
        def refit_one(w_l, H_old, sup):
            H_new = _refit_direct(x1, x2, w_l, cfg)
            return jnp.where(sup >= m_min, H_new, H_old)

        Hs_new = jax.vmap(refit_one)(w.T, Hs, eff_support)
    return Hs_new, support


def merge_duplicate_planes(r, support, active, thr, merge_iou: float,
                           containment: bool = True):
    """Deactivate planes whose inlier sets duplicate a stronger plane's.

    Refit makes each fragment's H global over its plane, so fragments of
    the same physical plane converge to near-identical inlier sets — the
    TPU-side completion of the reference's parameter-space mode-seeking
    (C7): detect duplicates by inlier-set *containment* (one K x K matmul)
    and keep the best-supported representative. Containment (intersection
    over the smaller set) rather than union-IoU: a fringe hypothesis whose
    inliers are mostly a subset of a real plane's must merge even though
    its IoU against the much larger set is small. Greedy keep-order by
    support, like selection NMS.

    containment=False switches to symmetric Jaccard IoU (inter / union) —
    the fundamental-model rule: epipolar 'bridge' models legitimately
    contain >50% of a pure motion's inliers (measured: 0.64/0.96 coverage
    of two motions by one fitted F at tau=5), so containment would merge
    the pure model INTO the bridge; Jaccard between a pure model and a
    bridge stays ~0.2 while same-motion refit fragments still exceed any
    sane threshold (~0.9).
    """
    k = r.shape[0]
    masks = (r < thr).astype(r.dtype) * active[:, None]  # (K, N)
    counts = jnp.sum(masks, axis=1)
    inter = jnp.dot(masks, masks.T, preferred_element_type=jnp.float32)
    if containment:
        denom = jnp.minimum(counts[:, None], counts[None, :])
    else:
        denom = counts[:, None] + counts[None, :] - inter
    iou = inter / jnp.maximum(denom, 1.0)
    # keep-order MUST follow label support (who actually owns members),
    # not raw inlier count: otherwise a member-less duplicate can win the
    # merge and immediately die to the min-support prune, erasing the
    # plane entirely (labels are assigned to the lowest-indexed of several
    # near-identical candidates; its duplicates hold no members).
    order = jnp.argsort(-(support + 1e-3 * counts))  # support, count ties

    pos = jnp.argsort(order)  # pos[l] = rank of plane l (0 = strongest)

    def body(i, keep):
        l = order[i]
        # killed if any kept, strictly stronger plane overlaps it
        earlier = pos < pos[l]
        dup = jnp.any(earlier & (keep > 0) & (iou[l] >= merge_iou))
        return keep.at[l].set(jnp.where(dup, 0.0, keep[l]))

    return jax.lax.fori_loop(0, k, body, active)


def lo_refine_candidates(Hs, x1, x2, valid, cfg: MultiHConfig, rounds: int,
                         tau=None):
    """LO-RANSAC-style candidate growth (reference C12 as used inside C7):
    minimal-sample hypotheses — especially the locality-biased ones — are
    only accurate near their sample; refitting each candidate on its own
    Tukey-weighted inliers turns a local fragment into a global plane
    estimate, multiplying its inlier count before selection ever happens.
    Rounds run with a geometrically shrinking inlier threshold
    (4tau -> 2tau -> tau for 3 rounds), the classic LO-RANSAC schedule: the
    wide first round captures the plane's full extent despite the seed's
    local bias, later rounds sharpen. All candidates refit in one batched
    weighted DLT per round; a keep-if-better guard (at the final tau) makes
    the sequence monotone in true inlier count."""
    thr = _thr(cfg, tau, x1.dtype)

    def count(r):
        return jnp.sum((r < thr) * valid[None, :], axis=1)

    basis = _prepare_refit_basis(x1, x2, cfg) if cfg.refit_moments else None
    m_min = float(cfg.minimal_points)

    def one_round(Hs, mult):
        thr_r = thr * mult
        r = model_residual_matrix(Hs, x1, x2, cfg.residual, cfg)
        rr = jnp.clip(r / thr_r, 0.0, 1.0)
        w = ((1.0 - rr) ** 2 * (r < thr_r)) * valid[None, :]  # (M, N)
        enough = jnp.sum((w > 0).astype(x1.dtype), axis=1) >= m_min
        if cfg.refit_moments:
            # one (M, N) x (N, 30|36) moment matmul for the whole batch
            # instead of materializing per-candidate row tensors
            Hs_new = jnp.where(
                enough[:, None, None],
                _refit_batch(w, basis, cfg),
                Hs,
            )
        else:
            Hs_new = jax.vmap(
                lambda wl, hold: jnp.where(
                    jnp.sum((wl > 0).astype(x1.dtype)) >= m_min,
                    _refit_direct(x1, x2, wl, cfg),
                    hold,
                )
            )(w, Hs)
        r_new = model_residual_matrix(Hs_new, x1, x2, cfg.residual, cfg)
        better = (count(r_new) >= count(r))[:, None, None]
        return jnp.where(better, Hs_new, Hs), None

    # squared-space multipliers: linear thresholds shrink geometrically to
    # tau, e.g. lo_shrink=4, rounds=3 -> 4tau, 2tau, tau -> squared
    # 16, 4, 1; lo_shrink=1 -> fixed-tau growth every round
    mults = jnp.asarray(
        [cfg.lo_shrink_eff ** (rounds - 1 - i) for i in range(rounds)],
        x1.dtype,
    )
    Hs, _ = jax.lax.scan(one_round, Hs, mults)
    return Hs


def _pearl_iteration(carry, it, x1, x2, valid, nbr_idx, nbr_w,
                     cfg: MultiHConfig, tau=None, adj=None, ptc=None):
    """One PEARL alternation (SURVEY.md §3.1 inner loop):
    residuals -> data costs -> mean-field+ICM labeling -> refit -> accept
    -> merge duplicates -> label-cost prune.

    `it` is the iteration index: label-cost pruning only engages in the
    second half of the alternation — deactivation is permanent here
    (unlike gco, which keeps pruned labels in the candidate set), so
    planes must be given time to grow to their full support first."""
    Hs, active, q = carry  # q is label-major (L, N) across iterations
    thr = _thr(cfg, tau, x1.dtype)
    k = cfg.max_labels
    has_pt_mesh = getattr(ptc, "is_pt_mesh", False)
    if ptc is None:
        ptc = lambda x, *spec: x  # noqa: E731 — identity (no pt mesh)

    use_k = _pallas_enabled(cfg)
    # fused front (ops/kernels/mrf_kernel.mean_field_fused_front): the
    # residual matrix, data costs and every mean-field sweep in ONE
    # launch; eligibility centralized in fused_front_gate (path-gate
    # tested).
    fused_front = fused_front_gate(cfg, adj, has_pt_mesh)
    if fused_front:
        q, dct, r = labeling.pearl_relax_fused(
            x1, x2, valid, Hs, active, thr, cfg.outlier_cost,
            cfg.spatial_weight, cfg.meanfield_iterations,
            cfg.temperature_start, cfg.temperature, q, adj,
            kind=cfg.residual,
        )
    else:
        r = model_residual_matrix(Hs, x1, x2, cfg.residual, cfg)  # (K, N)
        r = ptc(r, None, "pt")
        # everything below runs label-major (L, N): points on lanes — the
        # (N, L) forms pad L~17 to 128 lanes, 7.5x the bytes per
        # intermediate
        dct = labeling.data_costs_t(
            r, valid, thr, cfg.outlier_cost, active
        )
        q = labeling.mean_field_t(
            dct, nbr_idx, nbr_w, cfg.spatial_weight,
            cfg.meanfield_iterations, cfg.temperature_start,
            cfg.temperature, q_init=q, adj=adj, use_kernel=use_k,
        )
    # Two ICM starts, keep the lower-energy labeling. Mean-field smooths
    # well once planes have mass but cannot nucleate sparse fragments
    # against the outlier field (its updates are local; alpha-expansion's
    # maxflow moves are not) — the data-argmin start nucleates every
    # covered point and lets ICM trim, covering exactly that regime.
    labels = labeling.best_labeling_t(
        [jnp.argmax(q, axis=0), jnp.argmin(dct, axis=0)],
        dct, nbr_idx, nbr_w, cfg.spatial_weight, cfg.icm_iterations,
        adj=adj, use_kernel=use_k,
    )
    labels = ptc(labels, "pt")

    # refit on assignments; accept per-plane only if inliers don't shrink.
    # Homography: GLOBAL inlier count (the reference-calibrated rule;
    # golden parity anchors it — a plane's H has zero freedom left, so a
    # member refit never trades global support for member fit).
    # Fundamental: MEMBER-restricted count — an epipolar 'bridge' model
    # holding mostly one motion's points must be allowed to purify toward
    # its members even though the pure F has FEWER global inliers than
    # the bridge (measured on fm4_a: the global rule preserved a bridge
    # covering 0.60/0.78 of two motions across all 8 PEARL iterations,
    # leaving one motion with no pure model and 11% misclassification).
    Hs_new, support = refit_planes(Hs, labels, r, x1, x2, valid, cfg, tau)
    r_new = model_residual_matrix(Hs_new, x1, x2, cfg.residual, cfg)
    member_k = (
        labels[None, :] == jnp.arange(k)[:, None]
    ).astype(x1.dtype) * valid[None, :]  # (K, N)
    acc_w = (
        member_k
        if cfg.model == "fundamental" and cfg.f_member_acceptance
        else valid[None, :]
    )
    in_old = jnp.sum((r < thr) * acc_w, axis=1)
    in_new = jnp.sum((r_new < thr) * acc_w, axis=1)
    better = (in_new >= in_old)[:, None, None]
    Hs = jnp.where(better, Hs_new, Hs)
    r_acc = jnp.where(better[..., 0], r_new, r)

    # mode consolidation: refit fragments of one physical plane now look
    # identical -> merge by inlier IoU (containment for homographies,
    # symmetric Jaccard for fundamental — see merge_duplicate_planes)
    active = merge_duplicate_planes(
        r_acc, support, active, thr, cfg.merge_iou,
        containment=cfg.model == "homography",
    )

    # PEARL label cost (reference C9's beta * |labels| term): deactivate the
    # plane whose removal lowers the energy the most, if any. Removal gain =
    # beta - sum over members of (runner-up cost - current cost).
    #
    # One greedy removal per iteration for homographies (the reference-
    # calibrated behavior; golden parity anchors it). The fundamental
    # model needs several rounds per iteration, gains recomputed after
    # each removal (interactions: two junk models can share members): a
    # 7-dof F captures 14-19 chance inliers on PURE NOISE, so an
    # all-outlier scene surfaces ~10 junk motions at once and the 4
    # prune-enabled iterations of a one-per-iteration schedule cannot
    # clear them (measured; tests/test_fmodel_pipeline.py).
    oh_lab = (
        labels[None, :] == jnp.arange(k + 1)[:, None]
    ).astype(x1.dtype)  # (K+1, N), lane-dense
    prune_on = it >= cfg.pearl_iterations // 2
    prune_rounds = 1 if cfg.model == "homography" else 8

    def prune_body(_, active):
        dct_now = labeling.data_costs_t(
            r_acc, valid, thr, cfg.outlier_cost, active
        )  # (K+1, N)
        member = oh_lab[:k] * valid[None, :] * active[:, None]
        # runner-up: cheapest alternative label per point, excluding its
        # own. One-hot select + where, not take_along_axis + .at[].set:
        # the label-axis gather and the aliased scatter traced at
        # ~1.3 ms/fit combined.
        own = jnp.sum(oh_lab * dct_now, axis=0)
        masked = jnp.where(oh_lab > 0, jnp.inf, dct_now)
        runner = jnp.min(masked, axis=0)
        switch_cost = jnp.sum(
            (runner - own)[None, :] * member, axis=1
        )  # (K,) extra data cost if plane removed
        gain = cfg.label_cost - switch_cost
        worst = jnp.argmax(jnp.where(active > 0, gain, -jnp.inf))
        return active.at[worst].set(
            jnp.where((gain[worst] > 0) & prune_on, 0.0, active[worst])
        )

    active = jax.lax.fori_loop(0, prune_rounds, prune_body, active)

    # drop tiny planes outright — but only once the growth phase is over
    # (same gating as the label cost: deactivation is permanent here, and
    # a real plane's membership can be temporarily tiny while its H is
    # still converging; duplicates with zero members are the merge step's
    # job, not this one's)
    keep_small = jnp.logical_not(prune_on)
    active = active * (
        (support >= cfg.min_inliers) | keep_small
    ).astype(active.dtype)

    energy = labeling.total_energy_t(
        labels, dct, nbr_idx, nbr_w, cfg.spatial_weight, cfg.label_cost,
        active, adj=adj,
    )

    if cfg.model == "fundamental" and cfg.f_union_merge:
        # Union-refit merge, ENERGY-TESTED (J-linkage-style consolidation
        # judged by the PEARL objective itself; mirrors the float64
        # oracle): two under-grown FRAGMENTS of one motion share few
        # tau-inliers — the Jaccard merge can't see them as duplicates —
        # yet one F refit on their joint members covers both. But a
        # fitted 'bridge' F can ALSO cover >= 0.8 of two DISTINCT motions
        # inside tau (measured on mx03_a: 0.96/0.95), and no residual-
        # quality threshold separates the two cases; a free-slot PROPOSAL
        # doesn't either (a union F never wins members pointwise — each
        # fragment is LSQ-optimal on its own members, traced on fm4_a).
        # What does separate them is the energy: merging removes one
        # label (-label_cost) and raises the joint members' data cost by
        # Delta = sum over members of (cost under union F - cost under
        # own F). Measured: fm4_a true-fragment pair Delta ~ 9.6 < beta
        # 20 (merge), mx03_a bridge Delta ~ 34 > 20 (reject). All K^2
        # pair refits run as ONE batched moment matmul; the lowest-Delta
        # passing pair merges per iteration (fragments are few; later
        # iterations re-run the pass).
        with jax.named_scope("union_refit_merge"):
            member_act = member_k * active[:, None]        # (K, N)
            sup_act = jnp.sum(member_act, axis=1)          # (K,)
            w_u = (
                member_act[:, None, :] + member_act[None, :, :]
            ).reshape(k * k, -1)                           # (K^2, N)
            basis_u = _prepare_refit_basis(x1, x2, cfg)
            Hs_u = _refit_batch(w_u, basis_u, cfg)         # (K^2, 3, 3)
            fin_u = jnp.all(
                jnp.isfinite(Hs_u.reshape(k * k, -1)), axis=1
            ).reshape(k, k)
            r_u = model_residual_matrix(
                Hs_u, x1, x2, cfg.residual, cfg
            ).reshape(k, k, -1)
            inl_u = (r_u < thr).astype(x1.dtype)
            cov_a = jnp.einsum("abn,an->ab", inl_u, member_act,
                               precision=jax.lax.Precision.HIGHEST) \
                / jnp.maximum(sup_act[:, None], 1.0)
            cov_b = jnp.einsum("abn,bn->ab", inl_u, member_act,
                               precision=jax.lax.Precision.HIGHEST) \
                / jnp.maximum(sup_act[None, :], 1.0)
            # energy delta of the merge: data-cost increase of both
            # member sets under the union F vs their own F (truncated
            # quadratic, same shaping as labeling.data_costs_t)
            d_u = jnp.minimum(r_u / thr, 8.0) * cfg.outlier_cost
            d_own = jnp.minimum(r_acc / thr, 8.0) * cfg.outlier_cost
            inc_a = jnp.einsum(
                "abn,an->ab", d_u, member_act,
                precision=jax.lax.Precision.HIGHEST,
            ) - jnp.sum(d_own * member_act, axis=1)[:, None]
            inc_b = jnp.einsum(
                "abn,bn->ab", d_u, member_act,
                precision=jax.lax.Precision.HIGHEST,
            ) - jnp.sum(d_own * member_act, axis=1)[None, :]
            delta = inc_a + inc_b
            m_min = float(cfg.minimal_points)
            ok_pair = (
                (cov_a >= 0.8) & (cov_b >= 0.8) & fin_u
                & (delta < cfg.label_cost)
                & (active[:, None] > 0) & (active[None, :] > 0)
                & (sup_act[:, None] >= sup_act[None, :])
                & (sup_act[:, None] >= m_min)
                & (sup_act[None, :] >= m_min)
                & (jnp.arange(k)[:, None] != jnp.arange(k)[None, :])
            )
            score = jnp.where(ok_pair, -delta, -jnp.inf).reshape(-1)
            best = jnp.argmax(score)
            a_i, b_i = best // k, best % k
            do = jnp.isfinite(score[best])
            active = active.at[b_i].set(jnp.where(do, 0.0, active[b_i]))
            Hs = Hs.at[a_i].set(jnp.where(do, Hs_u[best], Hs[a_i]))

    return (Hs, active, q), energy


def fit(x1, x2, valid, key, cfg: MultiHConfig,
        affines=None, tau=None, seed_Hs=None, seed_ok=None,
        mesh=None) -> FitResult:
    """Full Multi-H fit on one (padded) correspondence set.

    Args:
      x1, x2: (N, 2) float32 matched keypoints (N = cfg.max_points).
      valid: (N,) float {0,1}.
      key: jax PRNG key.
      cfg: static MultiHConfig.
      affines: optional (N, 2, 2) local affine frames (dp2/dp1 around each
        correspondence, e.g. from SIFT shape). When given, the paper's
        one-point hypothesis path is added to the pool: F is estimated from
        all correspondences and one homography per point is derived from
        (F, p1, p2, A) — Multi-H paper §3.1, reference C4+C5.
      tau: optional *traced* inlier threshold in px, overriding
        cfg.inlier_threshold without recompilation (see estimate_tau).
      seed_Hs: optional (M, 3, 3) externally supplied candidate
        homographies joining the hypothesis pool before verification —
        the streaming warm start (planes persist across frames, so the
        previous frame's surviving planes are near-perfect candidates and
        a small sampled budget suffices to find what changed). Seeds
        compete on equal terms: verified, LO-grown and NMS'd like any
        sampled hypothesis, so a stale seed simply loses.
      seed_ok: optional (M,) float {0,1} seed validity (e.g. the previous
        fit's `active`); non-finite seeds are masked out regardless.
      mesh: optional jax.sharding.Mesh (static). When its 'hyp' axis is
        > 1, the verification sweep + top-M run sharded over the
        hypothesis axis (_hypothesize_verify_sharded) — P3 inside the
        full fit: generation, solves and the verification sweep all run
        on per-device pool slices.
    """
    k = cfg.max_labels
    thr = _thr(cfg, tau, x1.dtype)
    # point-axis sharding anchors (identity unless mesh has a 'pt' axis):
    # GSPMD propagates from these few constraints — the band/einsum rolls
    # become one-block halo exchanges, reductions over N become psums
    ptc = _pt_constrain(mesh)

    # spatial (Morton) ordering: all per-sweep neighbor gathers in the
    # PEARL labeling become near-diagonal (~3.4x faster at N=10k); exact —
    # labels are scattered back at the end
    if cfg.spatial_sort:
        perm = morton_order(x1, valid)
        x1, x2, valid = x1[perm], x2[perm], valid[perm]
        if affines is not None:
            affines = affines[perm]
    x1 = ptc(x1, "pt", None)
    x2 = ptc(x2, "pt", None)
    valid = ptc(valid, "pt")

    # C8: spatial neighborhood (the Potts smoothness graph). With Morton-
    # ordered points and a block-aligned N, the k-NN search is restricted
    # to the 3-block Morton window (knn_graph_windowed): O(N*block) build,
    # exact on every backend, and — by construction — zero edges outside
    # the band of the agreement operator below. Otherwise the full-range
    # row-blocked build runs.
    n_pts = x1.shape[0]
    banded_ok = banded_gate(cfg, n_pts)
    windowed = graph_path(cfg, n_pts) == "windowed"

    def graph_of(feats):
        if windowed:
            return labeling.knn_graph_windowed(
                feats, valid, cfg.knn_k, cfg.agree_block
            )
        return labeling.knn_graph(
            feats, valid, cfg.knn_k, cfg.knn_row_block, cfg.knn_approx
        )

    with jax.named_scope("knn_graph"):
        nbr_idx, nbr_w = graph_of(x1)
        nbr_idx = ptc(nbr_idx, "pt", None)
        nbr_w = ptc(nbr_w, "pt", None)
    # banded agreement operator: with Morton-ordered points, ~96% of k-NN
    # edges connect near indices (100% under the windowed build), so every
    # PEARL sweep becomes a block-tridiagonal MXU matmul (one-time build
    # here; far edges kept exact — none exist when windowed). Without
    # spatial_sort the band assumption is void — gather path runs.
    if banded_ok:
        with jax.named_scope("banded_adjacency"):
            adj = labeling.build_banded_adjacency(
                nbr_idx, nbr_w, cfg.agree_block,
                far_capacity=0 if windowed else None,
            )
            # band sharded over its Morton-block axis: each device holds
            # its own blocks; agree_t's rolls become halo exchanges
            adj = adj._replace(
                band=ptc(adj.band, "pt", None, None),
                deg=ptc(adj.deg, "pt", None),
            )
    else:
        adj = None
    # sampling neighborhood: same-plane points cluster in (position,
    # motion) space even when plane regions spatially interleave — drawing
    # locality-biased quads from this graph raises the clean-quad rate
    # ~40x on interleaved scenes (see config.sampling_motion_weight). The
    # labeling graph above stays purely spatial (the reference's C8).
    if cfg.sampling_motion_weight > 0.0:
        feat = jnp.concatenate(
            [x1, cfg.sampling_motion_weight * (x2 - x1)], axis=1
        )
        with jax.named_scope("sampling_knn"):
            nbr_sample, _ = graph_of(feat)
    else:
        nbr_sample = nbr_idx

    # C5: hypothesis pool. Extras (the paper's affine one-point pool,
    # streaming warm-start seeds) join the pool before verification and
    # compete on equal terms with sampled hypotheses.
    key, k_gen, k_f = jax.random.split(key, 3)
    extra_Hs, extra_ok = [], []
    if affines is not None and cfg.model != "homography":
        raise ValueError(
            "affine one-point hypotheses are a homography-model path "
            "(Multi-H paper §3.1); drop `affines` for model='fundamental'"
        )
    if affines is not None:
        from multih_tpu.ops import epipolar

        F = epipolar.estimate_fundamental(
            k_f, x1, x2, valid, n_samples=min(512, cfg.n_hypotheses),
            threshold=max(1.0, cfg.inlier_threshold / 3.0),
        )
        H_aff = epipolar.homography_one_point_batch(F, x1, x2, affines)
        finite = jnp.all(jnp.isfinite(H_aff.reshape(-1, 9)), axis=1)
        extra_Hs.append(H_aff)
        extra_ok.append(valid * finite.astype(x1.dtype))

    if seed_Hs is not None:
        s_finite = jnp.all(
            jnp.isfinite(seed_Hs.reshape(seed_Hs.shape[0], -1)), axis=1
        ).astype(x1.dtype)
        extra_Hs.append(seed_Hs)
        extra_ok.append(
            s_finite if seed_ok is None else seed_ok * s_finite
        )

    n_shards = 1 if mesh is None else mesh.shape.get("hyp", 1)
    if n_shards > 1:
        # P3: generation + verification sharded over the 'hyp' mesh axis
        top_counts, Hs_cand, n_hyp_ok = _hypothesize_verify_sharded(
            k_gen, x1, x2, valid, nbr_sample, cfg, tau, mesh,
            jnp.concatenate(extra_Hs, axis=0) if extra_Hs else None,
            jnp.concatenate(extra_ok, axis=0) if extra_Hs else None,
            window_block=(
                cfg.agree_block if windowed and cfg.window_sampling else 0
            ),
        )
    else:
        with jax.named_scope("hypothesize"):
            Hs_all, ok = generate_hypotheses(
                k_gen, x1, x2, valid, nbr_sample, cfg, tau,
                window_block=(
                    cfg.agree_block
                    if windowed and cfg.window_sampling else 0
                ),
            )
        if extra_Hs:
            Hs_all = jnp.concatenate([Hs_all] + extra_Hs, axis=0)
            ok = jnp.concatenate([ok] + extra_ok, axis=0)
        # C6: verification sweep + top-M candidate pick. With
        # cfg.verify_subsample > 1 the (S, N) ranking sweep runs on a
        # Morton-strided point subsample (spatially uniform after the
        # fit's spatial sort) and only the top M_pre superset is
        # rescored at full resolution — selected candidates always
        # carry exact counts (same pattern as claim_subsample).
        vs = max(1, cfg.verify_subsample)
        with jax.named_scope("verify"):
            # rank_residual only applies when a full-fidelity rescore
            # follows (vs > 1); at vs == 1 these counts ARE the final
            # candidate counts and must use cfg.residual
            counts = count_inliers(
                Hs_all, x1[::vs], x2[::vs], valid[::vs], cfg, tau,
                kind=(cfg.rank_residual or None) if vs > 1 else None,
            ) * ok
            if vs > 1:
                m_pre = min(
                    cfg.verify_rescore * cfg.n_candidates, counts.shape[0]
                )
                _, pre_idx = jax.lax.top_k(counts, m_pre)
                counts_full = count_inliers(
                    Hs_all[pre_idx], x1, x2, valid, cfg, tau
                ) * ok[pre_idx]
                top_counts, sel = jax.lax.top_k(
                    counts_full, cfg.n_candidates
                )
                top_idx = pre_idx[sel]
            else:
                top_counts, top_idx = jax.lax.top_k(
                    counts, cfg.n_candidates
                )
        Hs_cand = Hs_all[top_idx]
        n_hyp_ok = jnp.sum(ok)

    # C7: LO growth + candidate selection
    with jax.named_scope("lo_refine"):
        Hs_top = lo_refine_candidates(
            Hs_cand, x1, x2, valid, cfg, cfg.lo_rounds, tau
        )
    with jax.named_scope("select"):
        r_top = model_residual_matrix(Hs_top, x1, x2, cfg.residual, cfg)
        grown_counts = jnp.sum((r_top < thr) * valid[None, :], axis=1)
        if cfg.model == "fundamental":
            # marginal-coverage greedy: epipolar 'bridging' hypotheses
            # outcount pure single-motion models and count+NMS fills the
            # roster with bridges (selection.select_candidates_coverage)
            cand_idx, cand_active = selection.select_candidates_coverage(
                r_top, valid, thr, jnp.ones_like(grown_counts),
                cfg.n_candidates, k, min_gain=float(cfg.min_inliers),
            )
        else:
            cand_idx, cand_active = selection.select_candidates(
                r_top, valid, thr, jnp.ones_like(grown_counts),
                cfg.n_candidates, k, cfg.nms_iou,
            )
    Hs = Hs_top[cand_idx]  # (K, 3, 3)
    active = cand_active * (
        grown_counts[cand_idx] >= cfg.min_inliers
    ).astype(x1.dtype)

    # C9-C12: PEARL alternation, fixed trip count. q starts from the data
    # costs of the selected candidates — a uniform start starves the
    # mean-field of the agreement signal it needs to nucleate sparse
    # fragments against the outlier field.
    r0 = model_residual_matrix(Hs, x1, x2, cfg.residual, cfg)
    d0 = labeling.data_costs_t(r0, valid, thr, cfg.outlier_cost, active)
    q0 = ptc(
        jax.nn.softmax(-d0 / cfg.temperature_start, axis=0), None, "pt"
    )  # (L, N)

    def step(carry, xs):
        return _pearl_iteration(
            carry, xs, x1, x2, valid, nbr_idx, nbr_w, cfg, tau, adj,
            ptc=ptc,
        )

    with jax.named_scope("pearl"):
        (Hs, active, q), energies = jax.lax.scan(
            step, (Hs, active, q0), jnp.arange(cfg.pearl_iterations)
        )

    if cfg.model == "fundamental" and cfg.f_split_refine:
        # Split move (PEARL has none): bridges — single Fs covering two
        # motions — are stable under member refits, but their spatial
        # halves are pure motions. Split every active model's member set
        # at its index median (points are Morton-sorted: the index median
        # IS a spatial split), refit an F on each half in one batched
        # moment matmul, re-select the roster coverage-greedily from
        # {survivors + splits}, and run a short second PEARL phase. Pure
        # halves win pointwise on data cost; the bridge loses its members
        # and dies to the label-cost prune. See config.f_split_refine.
        with jax.named_scope("split_refine"):
            r = model_residual_matrix(Hs, x1, x2, cfg.residual, cfg)
            dct = labeling.data_costs_t(
                r, valid, thr, cfg.outlier_cost, active
            )
            lab_s = labeling.best_labeling_t(
                [jnp.argmax(q, axis=0), jnp.argmin(dct, axis=0)],
                dct, nbr_idx, nbr_w, cfg.spatial_weight,
                cfg.icm_iterations, adj=adj,
                use_kernel=_pallas_enabled(cfg),
            )
            member = (
                lab_s[None, :] == jnp.arange(k)[:, None]
            ).astype(x1.dtype) * valid[None, :]  # (K, N)
            cum = jnp.cumsum(member, axis=1)
            half = cum[:, -1:] * 0.5
            rr = jnp.clip(r / thr, 0.0, 1.0)
            tk = (1.0 - rr) ** 2 * (r < thr)
            # four split axes per model: spatial (Morton-index median —
            # points are Morton-sorted, so this is a spatial cut), the
            # two FLOW components (member-mean cut), and the member
            # flow's PRINCIPAL axis (mean cut on the projection).
            # Spatially overlapping motions — e.g. two objects crossing
            # — are inseparable by any spatial cut, but their rigid
            # motions differ, so the flow field is bimodal over a
            # bridge's member set (measured: the mixed suite's mx03_a
            # bridges survive the spatial split on 2/6 keys; the flow
            # cuts fix those, and the principal-axis cut covers bridges
            # whose flow separation is diagonal to both components).
            flow = x2 - x1  # (N, 2)
            sup_m = jnp.maximum(jnp.sum(member, axis=1, keepdims=True),
                                1.0)

            def _axis_split(a_kn):
                mean_k = (
                    jnp.sum(member * a_kn, axis=1, keepdims=True) / sup_m
                )
                return (member * (a_kn <= mean_k),
                        member * (a_kn > mean_k))

            fx_lo, fx_hi = _axis_split(
                jnp.broadcast_to(flow[None, :, 0], member.shape)
            )
            fy_lo, fy_hi = _axis_split(
                jnp.broadcast_to(flow[None, :, 1], member.shape)
            )
            # leading eigenvector of each member set's 2x2 flow
            # covariance, closed form; degenerate (isotropic/empty)
            # covariances fall back to the x axis, whose cut already
            # exists above
            mf = (member @ flow) / sup_m                     # (K, 2)
            d0 = flow[None, :, 0] - mf[:, 0:1]
            d1 = flow[None, :, 1] - mf[:, 1:2]
            ca = jnp.sum(member * d0 * d0, axis=1)
            cb = jnp.sum(member * d0 * d1, axis=1)
            cc = jnp.sum(member * d1 * d1, axis=1)
            lam = 0.5 * (ca + cc) + jnp.sqrt(
                0.25 * (ca - cc) ** 2 + cb * cb
            )
            vx, vy = cb, lam - ca
            degv = (jnp.abs(vx) + jnp.abs(vy)) < 1e-12
            vx = jnp.where(degv, 1.0, vx)
            vy = jnp.where(degv, 0.0, vy)
            proj = (vx[:, None] * flow[None, :, 0]
                    + vy[:, None] * flow[None, :, 1])        # (K, N)
            # quartile cuts (q25/q50/q75) on the principal axis, not a
            # mean cut: a 70/30 bridge's member mean lands INSIDE the
            # majority motion's flow cluster, so both mean halves stay
            # majority-dominated and the refits stay bridges (measured:
            # mx03_a key1's 204-member bridge holds one 142-pt motion
            # plus 62 points of another); the quartile cuts bracket any
            # >=25% minority
            n_pts = member.shape[1]
            proj_sorted = jnp.sort(
                jnp.where(member > 0, proj, jnp.inf), axis=1
            )
            sup_i = jnp.sum(member, axis=1)
            pca_cuts = []
            for qf in (0.25, 0.5, 0.75):
                pos = jnp.clip(
                    (sup_i * qf).astype(jnp.int32), 0, n_pts - 1
                )
                cut = jnp.take_along_axis(
                    proj_sorted, pos[:, None], axis=1
                )
                pca_cuts += [member * (proj <= cut),
                             member * (proj > cut)]
            w_split = jnp.concatenate(
                [member * (cum <= half), member * (cum > half),
                 fx_lo, fx_hi, fy_lo, fy_hi] + pca_cuts, axis=0
            ) * jnp.tile(tk, (12, 1))  # (12K, N)
            basis = _prepare_refit_basis(x1, x2, cfg)
            Hs_split = _refit_batch(w_split, basis, cfg)
            n_eff = jnp.sum((w_split > 0).astype(x1.dtype), axis=1)
            ok_split = (
                (n_eff >= float(cfg.minimal_points))
                & jnp.all(jnp.isfinite(Hs_split.reshape(-1, 9)), axis=1)
            ).astype(x1.dtype)
            cand = jnp.concatenate([Hs, Hs_split], axis=0)  # (13K, 3, 3)
            cand_ok = jnp.concatenate([active, ok_split], axis=0)
            r_cand = model_residual_matrix(cand, x1, x2, cfg.residual,
                                           cfg)
            cand_idx, active = selection.select_candidates_coverage(
                r_cand, valid, thr, cand_ok, cand.shape[0], k,
                min_gain=float(cfg.min_inliers),
            )
            Hs = cand[cand_idx]
            r0s = r_cand[cand_idx]
            d0s = labeling.data_costs_t(
                r0s, valid, thr, cfg.outlier_cost, active
            )
            q = jax.nn.softmax(-d0s / cfg.temperature_start, axis=0)
            # iteration indices in the prune-enabled second half so the
            # label-cost prune runs from the first split iteration
            (Hs, active, q), en2 = jax.lax.scan(
                step, (Hs, active, q),
                jnp.arange(cfg.pearl_iterations,
                           cfg.pearl_iterations + cfg.f_split_iterations),
            )
            energies = jnp.concatenate([energies, en2])

    run_exclusive = (cfg.model == "fundamental" and cfg.f_exclusive_refine
                     and cfg.f_exclusive_iterations > 0)
    run_resample = (cfg.model == "fundamental" and cfg.f_resample_lo
                    and cfg.f_resample_iterations > 0)
    if run_exclusive or run_resample:
        # Fundamental-model refinement phases (the oracle runs the same
        # moves in float64 with exact expansion relabels). Both share
        # the relabel machinery and the energy-tested joint-then-
        # sequential acceptance: a rejected proposal leaves (Hs, q)
        # unchanged, so the fixed trip counts are caps, not schedules.
        #
        # 1. EXCLUSIVE-CORE refit (config.f_exclusive_refine): escape
        #    the partial-bridge fixed point by refitting every model on
        #    the members no OTHER active model claims within tau.
        # 2. MEMBER-RESAMPLE LO (config.f_resample_lo; LO-RANSAC's
        #    inner-sampling, Lebeda et al.): escape the POLLUTED-BASIN
        #    fixed point — a member set carrying ~10% foreign points
        #    whose foreign part is NOT shared with any other model (so
        #    the exclusive core keeps it, and weighted LSQ on the full
        #    member set is self-consistently off its true motion).
        #    Random 12-point member subsets are pure with good odds
        #    ((0.9)^12 ~ 28%), and a pure subset's F scored by TRIMMED
        #    member residual beats the bridge basin. Measured on fm4_a
        #    (the r5 worst-parity scene): the weak model's median
        #    Sampson on its GT motion 0.62-0.77 px -> 0.29 px, lost
        #    tail 5-6 -> 0, clutter-in-band 6 -> 0-1, in every key.
        with jax.named_scope("f_refine_phases"):
            basis_x = _prepare_refit_basis(x1, x2, cfg)
            use_k_x = _pallas_enabled(cfg)
            m_min_x = 1.5 * float(cfg.minimal_points)

            def _label_energy(r_e, q0):
                dct_e = labeling.data_costs_t(
                    r_e, valid, thr, cfg.outlier_cost, active
                )
                q_e = labeling.mean_field_t(
                    dct_e, nbr_idx, nbr_w, cfg.spatial_weight,
                    cfg.meanfield_iterations, cfg.temperature_start,
                    cfg.temperature, q_init=q0, adj=adj,
                    use_kernel=use_k_x,
                )
                lab_e = labeling.best_labeling_t(
                    [jnp.argmax(q_e, axis=0), jnp.argmin(dct_e, axis=0)],
                    dct_e, nbr_idx, nbr_w, cfg.spatial_weight,
                    cfg.icm_iterations, adj=adj, use_kernel=use_k_x,
                )
                e = labeling.total_energy_t(
                    lab_e, dct_e, nbr_idx, nbr_w, cfg.spatial_weight,
                    cfg.label_cost, active, adj=adj,
                )
                return lab_e, q_e, e

            def _accept(Hs_c, q_c, r_c, lab_c, e_c,
                        Hs_prop, r_prop, ok_prop):
                """Energy-tested acceptance shared by both phases.

                JOINT move first, oracle-style: swap in every ok
                proposal at once and score it under the FULL relabel
                (fresh mean-field from the carried q + ICM). The full
                relabel is what lets foreign points JUMP back to their
                own motion's label in the same move that purifies the
                bridge — an ICM-only relabel underestimates exactly
                those proposals (measured on fm2_b: the pure-motion
                refit improves its core's median residual 0.436 ->
                0.379 px yet scores 175.51 vs 175.30 under ICM and is
                rejected; the oracle's expansion relabel accepts it).

                Sequential per-model fallback (one degenerate proposal
                vetoes the joint move — measured on fm2_b, where the
                bridge's core refit explodes while the OTHER motion's
                exclusive refit is exactly the fix): replace one model
                at a time, relabel lightly (ICM from the carried
                labeling — the full mean-field refresh happens once per
                outer iteration), keep iff the energy drops."""
                r_j = jnp.where(ok_prop[:, None], r_prop, r_c)
                _, q_j, e_j = _label_energy(r_j, q_c)
                joint_ok = e_j < e_c

                def _model_step(c2, i):
                    Hs_s, r_s, lab_s, e_s = c2
                    Hn = jnp.where(ok_prop[i], Hs_prop[i], Hs_s[i])
                    r_n = r_s.at[i].set(
                        model_residual_matrix(
                            Hn[None], x1, x2, cfg.residual, cfg
                        )[0]
                    )
                    dct_n = labeling.data_costs_t(
                        r_n, valid, thr, cfg.outlier_cost, active
                    )
                    lab_n = labeling.best_labeling_t(
                        [lab_s, jnp.argmin(dct_n, axis=0)],
                        dct_n, nbr_idx, nbr_w, cfg.spatial_weight,
                        cfg.icm_iterations, adj=adj, use_kernel=use_k_x,
                    )
                    e_n = labeling.total_energy_t(
                        lab_n, dct_n, nbr_idx, nbr_w, cfg.spatial_weight,
                        cfg.label_cost, active, adj=adj,
                    )
                    better = e_n < e_s
                    return (
                        Hs_s.at[i].set(jnp.where(better, Hn, Hs_s[i])),
                        jnp.where(better, r_n, r_s),
                        jnp.where(better, lab_n, lab_s),
                        jnp.where(better, e_n, e_s),
                    ), None

                def _joint(_):
                    Hs_j = jnp.where(
                        ok_prop[:, None, None], Hs_prop, Hs_c
                    )
                    return Hs_j, q_j

                def _sequential(_):
                    (Hs_s, _, _, _), _ = jax.lax.scan(
                        _model_step, (Hs_c, r_c, lab_c, e_c),
                        jnp.arange(k)
                    )
                    return Hs_s, q_c

                return jax.lax.cond(joint_ok, _joint, _sequential,
                                    operand=None)

            def _exclusive_body(_, carry):
                Hs_c, q_c = carry
                r_c = model_residual_matrix(
                    Hs_c, x1, x2, cfg.residual, cfg
                )
                lab_c, q_c, e_c = _label_energy(r_c, q_c)
                inl = (r_c < thr).astype(x1.dtype) * valid[None, :]
                n_in = jnp.sum(inl * active[:, None], axis=0)  # (N,)
                member_c = (
                    lab_c[None, :] == jnp.arange(k)[:, None]
                ).astype(x1.dtype) * valid[None, :]
                rr_c = jnp.clip(r_c / thr, 0.0, 1.0)
                w_x = (member_c * inl * (n_in == 1.0)
                       * (1.0 - rr_c) ** 2)                    # (K, N)
                core = (w_x > 0).astype(x1.dtype)
                n_core = jnp.sum(core, axis=1)
                Hs_prop = _refit_batch(w_x, basis_x, cfg)
                r_prop = model_residual_matrix(
                    Hs_prop, x1, x2, cfg.residual, cfg
                )
                # degeneracy guard: an exclusive core can be small and
                # quasi-degenerate (the bridge keeps most of the
                # overlap), and its LSQ can explode — require the
                # proposal to keep >= 80% of its own core inside tau
                # before it is even energy-tested
                cov_core = jnp.sum(
                    (r_prop < thr).astype(x1.dtype) * core, axis=1
                ) / jnp.maximum(n_core, 1.0)
                ok_prop = (
                    (n_core >= m_min_x) & (cov_core >= 0.8)
                    & jnp.all(jnp.isfinite(Hs_prop.reshape(k, -1)),
                              axis=1)
                    & (active > 0)
                )
                return _accept(Hs_c, q_c, r_c, lab_c, e_c,
                               Hs_prop, r_prop, ok_prop)

            if run_exclusive:
                Hs, q = jax.lax.fori_loop(
                    0, cfg.f_exclusive_iterations, _exclusive_body,
                    (Hs, q)
                )

            def _trimmed_cost(r_like, member_f, t_idx):
                """(.., N) residuals -> trimmed member cost: sum of the
                smallest 80% of each model's member residuals. Trimming
                (not tau-capping) is load-bearing: a bridge's foreign
                points are DEEP inliers, so a capped/MSAC score still
                prefers the bridge; dropping the worst 20% of members
                scores the pure-motion fit on its own points only."""
                big = jnp.asarray(1e9, r_like.dtype)
                r_m = jnp.where(member_f > 0, r_like, big)
                csum = jnp.cumsum(jnp.sort(r_m, axis=-1), axis=-1)
                return jnp.take_along_axis(
                    csum, jnp.broadcast_to(t_idx, csum.shape[:-1])[
                        ..., None], axis=-1
                )[..., 0]

            def _resample_body(it, carry):
                Hs_c, q_c = carry
                r_c = model_residual_matrix(
                    Hs_c, x1, x2, cfg.residual, cfg
                )
                lab_c, q_c, e_c = _label_energy(r_c, q_c)
                member_c = (
                    lab_c[None, :] == jnp.arange(k)[:, None]
                ).astype(x1.dtype) * valid[None, :]          # (K, N)
                n_mem = jnp.sum(member_c, axis=1)
                m_pts = 12  # overdetermined small-sample solve
                s_sub = cfg.f_resample_subsets
                # S uniform 12-subsets of each model's members
                # (gumbel-top-k = weighted sampling w/o replacement)
                g = jax.random.gumbel(
                    jax.random.fold_in(key_x, it), (k, s_sub, n_pts),
                    dtype=x1.dtype,
                )
                logits = jnp.where(
                    member_c[:, None, :] > 0, g, -jnp.inf
                )
                _, idx = jax.lax.top_k(logits, m_pts)  # (K, S, 12)
                Fs_cand, ok_solve = _solve_minimal_f(
                    x1, x2, valid, idx.reshape(k * s_sub, m_pts), cfg
                )
                r_cand = model_residual_matrix(
                    Fs_cand, x1, x2, cfg.residual, cfg
                ).reshape(k, s_sub, n_pts)
                t_idx = jnp.maximum(
                    (0.8 * n_mem).astype(jnp.int32) - 1, 0
                )  # (K,)
                cost_cand = _trimmed_cost(
                    r_cand, member_c[:, None, :], t_idx[:, None]
                )  # (K, S)
                cost_cand = jnp.where(
                    ok_solve.reshape(k, s_sub) > 0, cost_cand, jnp.inf
                )
                best_s = jnp.argmin(cost_cand, axis=1)       # (K,)
                F_best = Fs_cand.reshape(k, s_sub, 3, 3)[
                    jnp.arange(k), best_s]
                cost_best = cost_cand[jnp.arange(k), best_s]
                # one Tukey refit of the winning candidate on the
                # members it holds inside tau (the LO polish step)
                r_best = model_residual_matrix(
                    F_best, x1, x2, cfg.residual, cfg
                )
                w_t = member_c * jnp.maximum(
                    0.0, 1.0 - jnp.clip(r_best / thr, 0.0, 1.0)
                ) ** 2
                F_ref = _refit_batch(w_t, basis_x, cfg)
                r_ref = model_residual_matrix(
                    F_ref, x1, x2, cfg.residual, cfg
                )
                cost_ref = _trimmed_cost(r_ref, member_c, t_idx)
                cost_ref = jnp.where(
                    jnp.all(jnp.isfinite(F_ref.reshape(k, -1)), axis=1),
                    cost_ref, jnp.inf,
                )
                cost_inc = _trimmed_cost(r_c, member_c, t_idx)
                take_ref = cost_ref < cost_best
                Hs_prop = jnp.where(take_ref[:, None, None],
                                    F_ref, F_best)
                r_prop = jnp.where(take_ref[:, None], r_ref, r_best)
                cost_prop = jnp.minimum(cost_ref, cost_best)
                ok_prop = (
                    (n_mem >= jnp.maximum(float(m_pts), m_min_x))
                    & (cost_prop < cost_inc) & (active > 0)
                    & jnp.all(jnp.isfinite(Hs_prop.reshape(k, -1)),
                              axis=1)
                )
                return _accept(Hs_c, q_c, r_c, lab_c, e_c,
                               Hs_prop, r_prop, ok_prop)

            if run_resample:
                key_x = jax.random.fold_in(key, 0x7e5a)
                n_pts = x1.shape[0]
                Hs, q = jax.lax.fori_loop(
                    0, cfg.f_resample_iterations, _resample_body,
                    (Hs, q)
                )

    # final hard assignment (same two-start scheme as the loop)
    with jax.named_scope("finalize"):
        r = model_residual_matrix(Hs, x1, x2, cfg.residual, cfg)
    dct = labeling.data_costs_t(r, valid, thr, cfg.outlier_cost, active)
    labels = labeling.best_labeling_t(
        [jnp.argmax(q, axis=0), jnp.argmin(dct, axis=0)],
        dct, nbr_idx, nbr_w, cfg.spatial_weight, cfg.icm_iterations,
        adj=adj, use_kernel=_pallas_enabled(cfg),
    )
    # points on inactive planes -> outlier label
    label_active = jnp.concatenate([active, jnp.ones((1,), active.dtype)])
    labels = jnp.where(label_active[labels] > 0, labels, k)
    # padded points -> outlier label
    labels = jnp.where(valid > 0, labels, k).astype(jnp.int32)

    member = (
        labels[None, :] == jnp.arange(k)[:, None]
    ).astype(x1.dtype)  # (K, N), lane-dense
    support = jnp.sum(member * valid[None, :], axis=1)

    if cfg.spatial_sort:
        # scatter labels back to the caller's point order
        labels = jnp.zeros_like(labels).at[perm].set(labels)

    return FitResult(
        labels=labels,
        homographies=Hs,
        active=active,
        support=support,
        energy=energies[-1],
        energy_trace=energies,
        n_hypotheses_ok=n_hyp_ok,
        n_far_dropped=(
            adj.n_dropped if adj is not None else jnp.zeros((), jnp.int32)
        ),
    )


def _noise_median_factor(cfg: MultiHConfig) -> float:
    """median(r^2 of true members) / sigma^2 for the configured model
    class + residual kind — scale-free, measured on synthetic scenes
    across sigma in {0.25, 0.5, 1, 2} px (std <= 7% of the mean in every
    cell). Homography symmetric transfer: 5.85 (the original
    calibration); fundamental Sampson: 0.466 (a first-order 1-D
    distance, ~ the chi^2_1 median 0.455 with mild geometry
    amplification); fundamental symmetric epipolar: 1.874 (two 1-D
    distances, correlated)."""
    if cfg.model == "fundamental":
        return 1.874 if cfg.residual == "symmetric" else 0.466
    return 5.85


def tau_from_members(r_own, is_member, cfg: MultiHConfig, dtype,
                     floor=None, cap=None):
    """tau = 6 sigma from the median squared own-model residual of the
    given members (the working threshold rule, docs/USAGE.md), via the
    measured per-model-class median factor. Falls back to the config's
    static tau when fewer than min_inliers members exist. Shared by the
    single-class `estimate_tau` and the mixed per-class estimator
    (models/mixed.py)."""
    if floor is None:
        floor = 1.5 if cfg.model == "fundamental" else 3.0
    if cap is None:
        cap = 9.0 if cfg.model == "fundamental" else 12.0
    vals = jnp.where(is_member, r_own, jnp.inf)
    n_m = jnp.sum(is_member.astype(jnp.int32))
    med = jnp.sort(vals)[jnp.maximum(n_m // 2, 0)]
    tau = jnp.sqrt(36.0 / _noise_median_factor(cfg)
                   * jnp.maximum(med, 1e-6))
    tau = jnp.clip(tau, floor, cap)
    return jnp.where(n_m >= cfg.min_inliers, tau,
                     jnp.asarray(cfg.inlier_threshold, dtype))


def estimate_tau(res: FitResult, x1, x2, valid, cfg: MultiHConfig,
                 floor=None, cap=None):
    """Noise-adaptive inlier threshold from a previous fit.

    The median squared residual of true members is a scale-free multiple
    of sigma^2 (`_noise_median_factor`: 5.85 for homography symmetric
    transfer, 0.466 / 1.874 for fundamental Sampson / symmetric), and
    the working threshold rule is tau = 6 sigma (docs/USAGE.md) — so
    tau = sqrt(36/factor * median). Members of inactive models and
    padded points are excluded; with no members the config's static tau
    is returned. floor/cap default per model class: (3, 12) px for
    homographies, (1.5, 9) for fundamental matrices.
    """
    k = cfg.max_labels
    r = model_residual_matrix(res.homographies, x1, x2, cfg.residual,
                              cfg)
    lab = res.labels
    is_member = (lab < k) & (valid > 0)
    r_own = jnp.take_along_axis(
        r.T, jnp.clip(lab, 0, k - 1)[:, None], axis=1
    )[:, 0]
    return tau_from_members(r_own, is_member, cfg, x1.dtype, floor, cap)


def fit_adaptive(x1, x2, valid, key, cfg: MultiHConfig,
                 probe_tau: float = 8.0, mesh=None):
    """Two-pass fit with a self-calibrated inlier threshold: a probe pass
    at a generous tau estimates the correspondence noise from the plane
    members' residuals, then the real fit runs at tau = 6 sigma. Both
    passes live in one XLA program (tau is traced — no recompile). Returns
    (FitResult, tau)."""
    k_probe, k_fit = jax.random.split(key)
    res0 = fit(x1, x2, valid, k_probe, cfg,
               tau=jnp.asarray(probe_tau, x1.dtype), mesh=mesh)
    tau = estimate_tau(res0, x1, x2, valid, cfg)
    return fit(x1, x2, valid, k_fit, cfg, tau=tau, mesh=mesh), tau


def make_fit(cfg: MultiHConfig):
    """jit-compiled fit with cfg baked in as a static constant."""
    return jax.jit(lambda x1, x2, valid, key: fit(x1, x2, valid, key, cfg))


def make_fit_tau(cfg: MultiHConfig):
    """jit-compiled fit taking the inlier threshold (px) as a *traced*
    argument — one compiled executable serves any tau (threshold sweeps,
    restarts under a frozen auto-calibrated tau, ...)."""
    return jax.jit(
        lambda x1, x2, valid, key, tau: fit(x1, x2, valid, key, cfg, tau=tau)
    )


def make_fit_seeded(cfg: MultiHConfig):
    """jit-compiled fit taking (M, 3, 3) seed homographies + (M,) validity
    as traced inputs — the streaming warm-start executable. M is static
    per compilation (use cfg.max_labels: the previous frame's planes)."""
    return jax.jit(
        lambda x1, x2, valid, key, seed_Hs, seed_ok: fit(
            x1, x2, valid, key, cfg, seed_Hs=seed_Hs, seed_ok=seed_ok
        )
    )


def make_fit_adaptive(cfg: MultiHConfig, probe_tau: float = 8.0):
    """jit-compiled two-pass adaptive-threshold fit."""
    return jax.jit(
        lambda x1, x2, valid, key: fit_adaptive(
            x1, x2, valid, key, cfg, probe_tau
        )
    )
