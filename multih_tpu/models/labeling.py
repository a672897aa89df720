"""Spatially-regularized multi-label assignment (the PEARL labeling step).

The reference minimizes E(L) = sum data(p, H_L(p)) + lambda * Potts over a
spatial neighbor graph + beta * |labels| with gco-v3.0 alpha-expansion
(SURVEY.md §2 C8-C11, §3.3; gco itself is vendored C++ built on BK maxflow).
Graph cuts are inherently sequential and host-bound, so the TPU rebuild uses
the contract from BASELINE.json:5: a fixed-iteration annealed mean-field
relaxation of the same energy over a precomputed k-NN graph, followed by an
ICM (iterated conditional modes) polish — all dense tensor ops with static
trip counts, living inside the same jit as the rest of the pipeline. Label
costs are handled PEARL-style at the outer loop (support-based pruning via
an active-label mask), not inside the relaxation.

Energy convention: plane data costs are a truncated quadratic that crosses
the outlier cost exactly at the inlier threshold (see data_costs); labels
are 0..K-1 = planes, K = outlier.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30
_HI = jax.lax.Precision.HIGHEST  # fp32 matmuls (TPU defaults to bf16)


# ---------------------------------------------------------------------------
# k-NN neighborhood graph (reference C8: Delaunay/k-NN over keypoints)
# ---------------------------------------------------------------------------

def knn_graph(pts: jax.Array, valid: jax.Array, k: int, row_block: int = 0,
              approx: bool = False):
    """Spatial k-NN over the first-image keypoint positions.

    Distances via the |a-b|^2 = |a|^2 + |b|^2 - 2ab matmul identity (MXU),
    then top-k. For large N the rows are processed in blocks of `row_block`
    under ``lax.map`` so peak memory is O(N * row_block), never the dense
    (N, N) matrix — at N=32k the dense build would need 4 GB; blocked at
    2048 rows it streams 256 MB tiles (the scaling axis of
    BASELINE.json:10). `row_block` <= 0 selects automatically: dense for
    N <= 4096 (one matmul, fastest), 2048-row blocks above. Padded points
    never appear as neighbors; their own rows are harmless self-loops with
    zero weight.

    With `approx`, the exact `top_k` is replaced by the TPU-native
    `lax.approx_max_k` (recall target 0.98): the k-NN graph only shapes
    sampling locality and Potts smoothing, so a ~2% chance of picking the
    (k+1)-th-nearest instead of the k-th is invisible in the energy —
    but the sort is several times faster at stress N (docs/PERF.md).
    CPU tests keep the exact path (approx_max_k is exact on CPU anyway).

    Returns (nbr_idx (N, k) int32, nbr_w (N, k) float): neighbor indices and
    {0,1} edge weights (0 for edges into padding or from padding).
    """
    n = pts.shape[0]
    if row_block <= 0:
        row_block = n if n <= 4096 else 2048
    big = jnp.asarray(1e30, pts.dtype)
    sq = jnp.sum(pts * pts, axis=1)
    col_pen = jnp.where(valid > 0, 0.0, big)  # exclude padding columns
    col_idx = jnp.arange(n)

    def rows_topk(p_blk, i_blk):
        d2 = (
            jnp.sum(p_blk * p_blk, axis=1)[:, None]
            + sq[None, :]
            - 2.0
            * jnp.dot(
                p_blk, pts.T, preferred_element_type=jnp.float32,
                precision=_HI,
            )
        )
        d2 = d2 + col_pen[None, :]
        d2 = d2 + big * (i_blk[:, None] == col_idx[None, :]).astype(d2.dtype)
        if approx:
            neg_d2, idx = jax.lax.approx_max_k(
                -d2, k, recall_target=0.98
            )
        else:
            neg_d2, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), (-neg_d2 < big * 0.5).astype(pts.dtype)

    if row_block >= n:
        nbr_idx, edge_real = rows_topk(pts, col_idx)
    else:
        nb = -(-n // row_block)
        pad = nb * row_block - n
        p = jnp.pad(pts, ((0, pad), (0, 0)))
        ii = jnp.arange(nb * row_block)
        idxs, reals = jax.lax.map(
            lambda a: rows_topk(*a),
            (p.reshape(nb, row_block, pts.shape[1]),
             ii.reshape(nb, row_block)),
        )
        nbr_idx = idxs.reshape(-1, k)[:n]
        edge_real = reals.reshape(-1, k)[:n]
    nbr_w = edge_real * valid[:, None]
    return nbr_idx, nbr_w


def knn_graph_windowed(feats: jax.Array, valid: jax.Array, k: int,
                       block: int):
    """k-NN restricted to the Morton window: each point's neighbors are its
    k nearest (in `feats` space) among the 3*block points of its own Morton
    block and the two adjacent blocks.

    With Morton-ordered points ~96% of exact k-NN edges already connect
    indices within one block (docs/PERF.md); the window keeps those and
    replaces the rare far edge with the next-nearest in-window point — a
    genuine spatial neighbor, since a 3-block Morton window is a compact
    spatial region. Three consequences, all deliberate:

    - the banded agreement operator needs NO far-edge fixup (every edge is
      in-band by construction — far_capacity=0), which is what makes the
      fused Pallas MRF kernel a pure band stream;
    - the build is O(N * 3*block) instead of O(N^2): one small batched
      matmul + a 768-wide exact top_k, replacing the row-blocked sweep
      that cost 8.1 ms per graph at stress N (docs/PERF.md);
    - the 768-candidate top_k is exact on every backend, so the TPU graph
      is bit-identical to the CPU/test graph (the `approx_max_k` recall
      caveat of `knn_graph` does not apply — VERDICT r2 weak #6).

    At nb = 2 blocks the window covers the whole array, so the result
    equals exact k-NN. `feats` may be (N, 2) positions or the (N, 4)
    motion-augmented sampling features — the *window* is always defined by
    the array (Morton) order of the first image's positions.

    Requires N % block == 0 and N >= 2*block (callers gate on this).
    Returns (nbr_idx (N, k) int32, nbr_w (N, k) float) like `knn_graph`.
    """
    n, d = feats.shape
    assert n % block == 0 and n >= 2 * block, (n, block)
    nb = n // block
    big = jnp.asarray(1e30, feats.dtype)

    fb = feats.reshape(nb, block, d)
    win = jnp.concatenate(
        [jnp.roll(fb, 1, axis=0), fb, jnp.roll(fb, -1, axis=0)], axis=1
    )  # (nb, 3B, d); wrapped blocks excluded via the index test below
    vb = valid.reshape(nb, block)
    v_win = jnp.concatenate(
        [jnp.roll(vb, 1, axis=0), vb, jnp.roll(vb, -1, axis=0)], axis=1
    )  # (nb, 3B)

    d2 = (
        jnp.sum(fb * fb, axis=2)[:, :, None]
        + jnp.sum(win * win, axis=2)[:, None, :]
        - 2.0
        * jnp.einsum(
            "nbd,ncd->nbc", fb, win, preferred_element_type=jnp.float32,
            precision=_HI,
        )
    )  # (nb, B, 3B)

    # candidate global index of window column c in block b is (b-1)*B + c;
    # out-of-range = wrapped block (no wraparound edges), penalized along
    # with padding columns and the self column
    b_ids = jnp.arange(nb)[:, None, None]
    c_ids = jnp.arange(3 * block)[None, None, :]
    g = (b_ids - 1) * block + c_ids  # (nb, 1, 3B)
    r_ids = b_ids * block + jnp.arange(block)[None, :, None]  # (nb, B, 1)
    bad = (g < 0) | (g >= n) | (g == r_ids)  # wrap or self
    d2 = d2 + big * bad.astype(d2.dtype)
    d2 = d2 + jnp.where(v_win[:, None, :] > 0, 0.0, big)

    # k smallest by unrolled min-extraction: lax.top_k sorts all 3B lanes
    # and cost 3.5 ms/graph at stress N (traced); k argmin+mask passes
    # over the same array are ~10x cheaper and tie-break identically
    # (argmin and top_k both prefer the lowest column index)
    work = d2.reshape(n, 3 * block)
    cols, vals = [], []
    col_iota = jnp.arange(3 * block)[None, :]
    for _ in range(k):
        c = jnp.argmin(work, axis=1)
        vals.append(jnp.min(work, axis=1))
        cols.append(c)
        work = work + big * (col_iota == c[:, None]).astype(work.dtype)
    col = jnp.stack(cols, axis=1)            # (N, k)
    best = jnp.stack(vals, axis=1)
    blk_row = jnp.arange(n)[:, None] // block
    nbr_idx = jnp.clip(
        (blk_row - 1) * block + col, 0, n - 1
    ).astype(jnp.int32)
    edge_real = (best < big * 0.5).astype(feats.dtype)
    return nbr_idx, edge_real * valid[:, None]


# ---------------------------------------------------------------------------
# symmetrized neighbor agreement operator
# ---------------------------------------------------------------------------
#
# Every hot sweep of the PEARL labeling (mean-field update, ICM half-sweep,
# energy evaluation) reduces to one primitive: the symmetrized neighbor
# agreement  agree[i] = sum_j w_sym_ij * p[j]  with
# w_sym_ij = 0.5 * (w_ij + w_ji) over the directed k-NN edges. The naive
# form is a row gather + a scatter-add per call — the slowest primitives on
# TPU (measured 1.8 ms/call at N=10k, ~14 calls per PEARL iteration = the
# dominant stress-fit cost). With Morton-ordered points ~96% of edges
# connect indices within one 256-block, so the operator is restructured as
# a BANDED BLOCK MATMUL: a (nb, B, 3B) banded adjacency built ONCE per fit
# (one scatter), then every agreement call is an MXU einsum over the block
# tridiagonal plus an exact sparse fixup for the few far edges. Same math,
# same energy — only the execution shape changes.


class BandedAdjacency(NamedTuple):
    """Symmetrized k-NN adjacency in block-tridiagonal + far-edge form.

    band: (nb, B, 3B) — band[b, r, c] = w_sym between global row b*B+r and
      global column (b-1)*B+c (columns span blocks b-1, b, b+1).
    far_out, far_in, far_w: (F,) — exact fixup for edges crossing more
      than one block (w_sym; zero-padded).
    deg: (N, 1) — symmetrized degree (band + far row sums).
    n_dropped: () int32 — far edges beyond capacity F (0 in practice; a
      nonzero value means the energy is missing edges — tested against).
    """

    band: jax.Array
    far_out: jax.Array
    far_in: jax.Array
    far_w: jax.Array
    deg: jax.Array
    n_dropped: jax.Array

    @property
    def block(self) -> int:
        return self.band.shape[1]

    def agree(self, p: jax.Array) -> jax.Array:
        """agree[i] = sum_j w_sym_ij p[j]; p is (N, L). Returns (N, L).

        The band is stored bf16 (exact for the {0, 0.5, 1} symmetrized
        unit weights — see build_banded_adjacency) and upcast in-register
        at the matmul: each agree call is memory-bound on the band read
        (the traced profile shows ~300 GB/s sustained), so halving the
        bytes halves the dominant PEARL cost with bit-identical results."""
        nb, b, _ = self.band.shape
        l = p.shape[1]
        pb = p.reshape(nb, b, l)
        win = jnp.concatenate(
            [jnp.roll(pb, 1, axis=0), pb, jnp.roll(pb, -1, axis=0)], axis=1
        )  # (nb, 3B, L); wrap rows hit only zero band entries
        out = jnp.einsum(
            "nbc,ncl->nbl", self.band.astype(p.dtype), win, precision=_HI
        ).reshape(-1, l)
        if self.far_w.shape[0] == 0:  # windowed graph: no far edges exist
            return out
        contrib = p[self.far_in] * self.far_w[:, None]
        return out.at[self.far_out].add(contrib)

    def agree_t(self, p_t: jax.Array) -> jax.Array:
        """Label-major agreement: p_t is (L, N), returns (L, N).

        The hot layout. (N, L) arrays pad the L≈17 label axis to 128
        lanes, so every sweep in that layout moves ~7.5x its logical
        bytes; label-major puts points on lanes (no padding) and labels
        on sublanes (17 -> 24, 1.4x). Measured effect is bounded by the
        far-edge fixup and per-op overheads (~15% per sweep, docs/PERF.md
        A/B) — the layout matters most for the elementwise (L, N) chains
        around the agreement. Same math as `agree` (one transpose of this
        function's result IS `agree`'s result; parity-tested)."""
        nb, b, _ = self.band.shape
        l = p_t.shape[0]
        pb = p_t.reshape(l, nb, b)
        win = jnp.concatenate(
            [jnp.roll(pb, 1, axis=1), pb, jnp.roll(pb, -1, axis=1)],
            axis=2,
        )  # (L, nb, 3B); wrap rows hit only zero band entries
        out = jnp.einsum(
            "nbc,lnc->lnb", self.band.astype(p_t.dtype), win,
            precision=_HI,
        ).reshape(l, -1)
        if self.far_w.shape[0] == 0:  # windowed graph: no far edges exist
            return out
        contrib = p_t[:, self.far_in] * self.far_w[None, :]
        return out.at[:, self.far_out].add(contrib)


def build_banded_adjacency(
    nbr_idx: jax.Array,
    nbr_w: jax.Array,
    block: int = 256,
    far_capacity: int | None = None,
    band_dtype=jnp.bfloat16,
) -> BandedAdjacency:
    """One-time (per fit) restructuring of the directed k-NN graph into
    the banded symmetric operator. N must be a multiple of `block`.

    Each directed edge (i, j, w) contributes 0.5*w to both (i<-j) and
    (j<-i) — exactly `_neighbor_agreement`'s 0.5*(direct+reverse)
    convention. Edges whose endpoints lie in non-adjacent blocks go to the
    sparse far list (capacity `far_capacity`; the default max(block,
    0.75N) covers the measured Morton-ordered worst case at block=256 —
    ~0.45N at stress scale — with ~1.7x margin; overflow is counted in
    `n_dropped` and surfaced as FitResult.n_far_dropped, never silently
    absorbed into wrong band slots).

    The band is stored at `band_dtype` (default bf16): accumulation and
    the degree run f32, and with the graph's unit edge weights every
    symmetrized band value is in {0, 0.5, 1.0} — exactly representable,
    so the cast loses nothing while halving the operator's memory
    traffic. Pass float32 for graphs with arbitrary float weights."""
    n, k = nbr_idx.shape
    assert n % block == 0, (n, block)
    nb = n // block
    if far_capacity == 0:
        # Scatter-free build for window-constrained graphs (every edge of
        # knn_graph_windowed lies in its row's 3B window by construction).
        # The general path's (2*N*k)-element scatter is per-index-latency
        # bound (traced at ~1.05 ms/fit at stress scale); here the forward
        # half is a regular per-row one-hot reduce and the reverse half is
        # the block-transpose of the forward band:
        #   band_f[b] = [L_b, M_b, R_b]  (B x B blocks)
        #   band of W^T at row b = [R_{b-1}^T, M_b^T, L_{b+1}^T]
        # so the symmetrized band is band_f + roll/transpose(band_f) — no
        # scatter anywhere. Wrap rows contribute zero: L_0 and R_{nb-1}
        # hold edges into out-of-range blocks, whose weights are zeroed by
        # the in-band mask (and never exist for windowed graphs). Any
        # out-of-window edge (impossible for windowed graphs) is dropped
        # and counted in n_dropped — same contract as capacity overflow.
        blk_row = jnp.arange(n, dtype=jnp.int32)[:, None] // block
        col = nbr_idx.astype(jnp.int32) - (blk_row - 1) * block  # (N, k)
        in_band = (col >= 0) & (col < 3 * block)
        w_f = jnp.where(in_band, 0.5 * nbr_w, 0.0)
        col = jnp.clip(col, 0, 3 * block - 1)
        oh = col[:, :, None] == jnp.arange(3 * block, dtype=jnp.int32)
        band_f = jnp.sum(w_f[:, :, None] * oh.astype(nbr_w.dtype), axis=1)
        band_f = band_f.reshape(nb, block, 3 * block)
        l_blk = band_f[:, :, :block]
        m_blk = band_f[:, :, block:2 * block]
        r_blk = band_f[:, :, 2 * block:]
        band = band_f + jnp.concatenate(
            [jnp.roll(jnp.swapaxes(r_blk, 1, 2), 1, axis=0),
             jnp.swapaxes(m_blk, 1, 2),
             jnp.roll(jnp.swapaxes(l_blk, 1, 2), -1, axis=0)], axis=2,
        )
        deg = band.sum(axis=2).reshape(n)
        # x2: the scatter path counts each dropped edge in both directions
        n_dropped = 2 * jnp.sum(
            (jnp.logical_not(in_band) & (nbr_w > 0)).astype(jnp.int32)
        )
        empty_i = jnp.zeros((0,), jnp.int32)
        return BandedAdjacency(
            band=band.astype(band_dtype), far_out=empty_i, far_in=empty_i,
            far_w=jnp.zeros((0,), nbr_w.dtype), deg=deg[:, None],
            n_dropped=n_dropped,
        )
    if far_capacity is None:
        # measured worst case at block=256 on Morton-ordered stress data is
        # ~0.45N (A/B in docs/PERF.md); the fixup's gather/scatter cost is
        # proportional to capacity, so the margin is deliberately 1.7x, not
        # "all edges could be far" — overflow is counted, tested against,
        # and the gather fallback (adj=None) remains for arbitrary orders
        far_capacity = max(block, (3 * n) // 4)

    i_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    j_idx = nbr_idx.reshape(-1).astype(jnp.int32)
    w_half = 0.5 * nbr_w.reshape(-1)
    # both directions of every directed edge
    out_e = jnp.concatenate([i_idx, j_idx])
    in_e = jnp.concatenate([j_idx, i_idx])
    w_e = jnp.concatenate([w_half, w_half])

    blk_out = out_e // block
    blk_in = in_e // block
    near = jnp.abs(blk_out - blk_in) <= 1  # no wraparound: |.| on ints
    live = w_e > 0

    # banded part: col index relative to block blk_out - 1
    col = in_e - (blk_out - 1) * block
    w_near = jnp.where(near & live, w_e, 0.0)
    col = jnp.where(near, col, 0)  # far edges carry zero weight here
    band = jnp.zeros((n, 3 * block), nbr_w.dtype)
    band = band.at[out_e, col].add(w_near)
    band = band.reshape(nb, block, 3 * block)

    # far part: compact far-live edges to the front, cap at capacity
    is_far = jnp.logical_not(near) & live
    order = jnp.argsort(jnp.logical_not(is_far), stable=True)
    sel = order[:far_capacity]
    far_live = is_far[sel]
    far_out = jnp.where(far_live, out_e[sel], 0)
    far_in = jnp.where(far_live, in_e[sel], 0)
    far_w = jnp.where(far_live, w_e[sel], 0.0)
    n_far = jnp.sum(is_far.astype(jnp.int32))
    n_dropped = jnp.maximum(n_far - far_capacity, 0)

    deg = band.sum(axis=2).reshape(n)
    deg = deg.at[far_out].add(far_w)
    return BandedAdjacency(
        band=band.astype(band_dtype), far_out=far_out, far_in=far_in,
        far_w=far_w, deg=deg[:, None], n_dropped=n_dropped,
    )


# ---------------------------------------------------------------------------
# energy terms
# ---------------------------------------------------------------------------

def data_costs(
    residuals: jax.Array,
    valid: jax.Array,
    threshold_sq: jax.Array,
    outlier_cost: float,
    active: jax.Array,
) -> jax.Array:
    """(K, N) plane residuals -> (N, K+1) data-cost matrix.

    Cost of plane l at point p = min(r^2 / tau^2, 8) * outlier_cost — the
    truncated quadratic the reference feeds gco's setDataCost (SURVEY.md
    §3.3). The cost crosses outlier_cost exactly at r = tau, and the
    truncation ceiling must stay well above outlier_cost + max Potts pull
    (lambda * degree), otherwise gross outliers embedded inside a plane's
    spatial cluster get absorbed by the smoothness term — with ceiling 8x,
    smoothness can only sway genuinely borderline points. Inactive labels
    cost +big so the relaxation never assigns them (pruning-by-mask, never
    by shape). Padded points get uniform zero cost (they never influence
    anything else because their graph edges carry zero weight).
    """
    return data_costs_t(
        residuals, valid, threshold_sq, outlier_cost, active
    ).T


def data_costs_t(
    residuals: jax.Array,
    valid: jax.Array,
    threshold_sq: jax.Array,
    outlier_cost: float,
    active: jax.Array,
) -> jax.Array:
    """Label-major primitive behind `data_costs`: (K, N) residuals ->
    (K+1, N) costs with no layout change — points stay on lanes. The
    (N, K+1) form pads its 17-wide minor dim to 128 lanes (7.5x the
    bytes of every materialized intermediate); the hot PEARL loop uses
    this form end to end (docs/PERF.md 'label-major sweeps')."""
    k, n = residuals.shape
    plane = jnp.minimum(residuals / threshold_sq, 8.0) * outlier_cost
    plane = plane + (1.0 - active)[:, None] * 1e6
    out = jnp.full((1, n), outlier_cost, residuals.dtype)
    d = jnp.concatenate([plane, out], axis=0)
    return d * valid[None, :]


def potts_energy(
    labels: jax.Array, nbr_idx: jax.Array, nbr_w: jax.Array
) -> jax.Array:
    """lambda-free Potts term: sum over directed edges w * [l_p != l_q] / 2
    (each undirected edge counted once in expectation)."""
    diff = (labels[:, None] != labels[nbr_idx]).astype(nbr_w.dtype)
    return 0.5 * jnp.sum(diff * nbr_w)


def total_energy(
    labels: jax.Array,
    dcost: jax.Array,
    nbr_idx: jax.Array,
    nbr_w: jax.Array,
    spatial_weight: float,
    label_cost: float,
    active: jax.Array,
    adj: BandedAdjacency | None = None,
) -> jax.Array:
    """E(L) exactly as the reference's PEARL objective (SURVEY.md §2 C9).

    Label-axis selection and the used-label histogram run as one-hot
    contractions/compares, not take_along_axis/scatter-add: both gathers
    traced at ~10x the contraction's cost inside the PEARL loop."""
    return total_energy_t(
        labels, dcost.T, nbr_idx, nbr_w, spatial_weight, label_cost,
        active, adj=adj,
    )


def total_energy_t(
    labels: jax.Array,
    dct: jax.Array,
    nbr_idx: jax.Array,
    nbr_w: jax.Array,
    spatial_weight: float,
    label_cost: float,
    active: jax.Array,
    adj: BandedAdjacency | None = None,
) -> jax.Array:
    """Label-major core of `total_energy`: dct is (L, N), the one-hot is
    built lane-dense as a (L, N) compare (the (N, L) form pads 17 -> 128
    lanes on TPU)."""
    l = dct.shape[0]
    oh = (labels[None, :] == jnp.arange(l)[:, None]).astype(dct.dtype)
    e_data = jnp.sum(oh * dct)
    e_smooth = spatial_weight * _potts_t(labels, nbr_idx, nbr_w, adj, dct)
    used = jnp.any(labels[None, :] == jnp.arange(l - 1)[:, None], axis=1)
    e_label = label_cost * jnp.sum(used * (active > 0))
    return e_data + e_smooth + e_label


# ---------------------------------------------------------------------------
# mean-field relaxation + ICM polish (replaces gco alpha-expansion)
# ---------------------------------------------------------------------------

def _neighbor_agreement(p: jax.Array, nbr_idx: jax.Array, nbr_w: jax.Array):
    """Expected same-label mass each point receives over the *symmetrized*
    directed k-NN graph: 0.5 * (sum over own edges + sum over reverse
    edges). k-NN is asymmetric; counting both directions makes the local
    conditionals consistent with the global energy (which counts every
    directed edge at weight w/2), exactly like the reference's symmetric
    Delaunay adjacency does by construction.

    p: (N, L) marginals or one-hot labels. Returns (N, L)."""
    direct = jnp.einsum("nkl,nk->nl", p[nbr_idx], nbr_w,
                        precision=_HI)
    contrib = (nbr_w[..., None] * p[:, None, :]).reshape(-1, p.shape[1])
    rev = jnp.zeros_like(p).at[nbr_idx.reshape(-1)].add(contrib)
    return 0.5 * (direct + rev)


def _degree(nbr_idx: jax.Array, nbr_w: jax.Array, dtype):
    """Symmetrized degree: total edge weight incident to each point under
    the same 0.5*(direct+reverse) convention."""
    n = nbr_idx.shape[0]
    direct = jnp.sum(nbr_w, axis=1)
    rev = jnp.zeros((n,), dtype).at[nbr_idx.reshape(-1)].add(
        nbr_w.reshape(-1)
    )
    return (0.5 * (direct + rev))[:, None]


def _agree_and_deg(nbr_idx, nbr_w, adj: BandedAdjacency | None, dtype):
    """The agreement operator + degree for the sweeps below: the banded
    MXU form when an adjacency was prebuilt, the gather/scatter reference
    form otherwise (small N, tests, non-Morton layouts)."""
    if adj is not None:
        return adj.agree, adj.deg
    return (
        lambda p: _neighbor_agreement(p, nbr_idx, nbr_w),
        _degree(nbr_idx, nbr_w, dtype),
    )


def _agree_and_deg_t(nbr_idx, nbr_w, adj: BandedAdjacency | None, dtype):
    """Label-major (L, N) variant: deg comes back as (1, N) and the
    fallback path transposes around the N-major reference gather."""
    if adj is not None:
        return adj.agree_t, adj.deg.T
    deg = _degree(nbr_idx, nbr_w, dtype)
    return (
        lambda p_t: _neighbor_agreement(p_t.T, nbr_idx, nbr_w).T,
        deg.T,
    )

def _mrf_kernel_ok(adj: BandedAdjacency | None) -> bool:
    """The fused Pallas MRF kernels require a far-edge-free banded
    adjacency (knn_graph_windowed builds one); static shape check."""
    return adj is not None and adj.far_w.shape[0] == 0


def mean_field(
    dcost: jax.Array,
    nbr_idx: jax.Array,
    nbr_w: jax.Array,
    spatial_weight: float,
    iterations: int,
    temp_start: float,
    temp_end: float,
    q_init: jax.Array | None = None,
    adj: BandedAdjacency | None = None,
    use_kernel: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Annealed mean-field for the Potts MRF.

    Update: q_p(l) ∝ exp(-(D_pl + lambda * sum_q w_pq (1 - q_q(l))) / T),
    with T annealed geometrically from temp_start to temp_end over the fixed
    iteration count. The per-iteration work is one gather over the k-NN
    graph plus elementwise math — the TPU replacement for one full
    alpha-expansion cycle (maxflow per label) in the reference.

    With `use_kernel` (TPU + far-free banded adjacency) every sweep runs
    inside one fused Pallas launch with q resident in VMEM
    (ops/kernels/mrf_kernel.py); same update, parity-tested.

    Returns q: (N, L) marginals.
    """
    return mean_field_t(
        dcost.T, nbr_idx, nbr_w, spatial_weight, iterations, temp_start,
        temp_end,
        q_init=None if q_init is None else q_init.T,
        adj=adj, use_kernel=use_kernel, interpret=interpret,
    ).T


def mean_field_t(
    dct: jax.Array,
    nbr_idx: jax.Array,
    nbr_w: jax.Array,
    spatial_weight: float,
    iterations: int,
    temp_start: float,
    temp_end: float,
    q_init: jax.Array | None = None,
    adj: BandedAdjacency | None = None,
    use_kernel: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Label-major core of `mean_field`: dct and q are (L, N) — points on
    lanes, labels on sublanes (see BandedAdjacency.agree_t) — with no
    entry/exit transposes, so the PEARL loop can carry q in the hot
    layout across iterations."""
    dcost = dct  # dtype/shape source below
    l, n = dct.shape

    if q_init is None:
        q = jax.nn.softmax(-dct, axis=0)
    else:
        q = q_init

    temps = _mf_temps(iterations, temp_start, temp_end, dcost.dtype)

    if use_kernel and _mrf_kernel_ok(adj):
        from multih_tpu.ops.kernels import mrf_kernel

        base = dct + spatial_weight * adj.deg.T  # (L, N)
        return mrf_kernel.mean_field_fused(
            q, base, adj.band, 1.0 / temps, spatial_weight,
            interpret=interpret,
        )

    agree_fn, deg = _agree_and_deg_t(nbr_idx, nbr_w, adj, dcost.dtype)

    def body(q, temp):
        agree = agree_fn(q)  # (L, N)
        # pairwise expected cost of choosing l: lambda * (deg - agreement)
        pair = spatial_weight * (deg - agree)
        q_new = jax.nn.softmax(-(dct + pair) / temp, axis=0)
        return q_new, None

    q, _ = jax.lax.scan(body, q, temps)
    return q


def _mf_temps(iterations, temp_start, temp_end, dtype):
    """mean_field_t's annealing schedule (shared with the fused front)."""
    if iterations <= 1:
        return jnp.full((max(iterations, 1),), temp_end, dtype)
    ratio = (temp_end / temp_start) ** (1.0 / (iterations - 1))
    return temp_start * ratio ** jnp.arange(iterations, dtype=dtype)


def pearl_relax_fused(
    x1, x2, valid, Hs, active, thr, outlier_cost: float,
    spatial_weight: float, iterations: int, temp_start: float,
    temp_end: float, q_init: jax.Array, adj: BandedAdjacency,
    kind: str = "symmetric", interpret: bool = False,
):
    """residual_matrix -> data_costs_t -> mean_field_t as ONE Pallas
    launch (ops/kernels/mrf_kernel.mean_field_fused_front): the (K, N)
    homography residuals and truncated-quadratic costs are computed in
    the kernel's load pass and stay resident in VMEM across all sweeps —
    the 'fuse the residual+data-cost chain into the mean-field load
    pass' headroom item of docs/PERF.md. Homography transfer/symmetric
    kinds only; requires a far-edge-free banded adjacency.

    Returns (q, dct, r) so the rest of the PEARL iteration (ICM starts,
    refit acceptance, energies) reuses the front's outputs instead of
    recomputing them.
    """
    from multih_tpu.ops import geometry
    from multih_tpu.ops.kernels import mrf_kernel

    dt = jnp.float32
    n = x1.shape[0]
    sw_deg = spatial_weight * adj.deg[:, 0].astype(dt)
    pts = jnp.stack(
        [
            x1[:, 0].astype(dt), x1[:, 1].astype(dt),
            x2[:, 0].astype(dt), x2[:, 1].astype(dt),
            valid.astype(dt), sw_deg,
            jnp.zeros((n,), dt), jnp.zeros((n,), dt),
        ],
        axis=0,
    )  # (8, N)
    k = Hs.shape[0]
    hm = jnp.concatenate(
        [
            Hs.reshape(k, 9).astype(dt),
            geometry.adjugate_3x3(Hs).reshape(k, 9).astype(dt),
            active.reshape(k, 1).astype(dt),
        ],
        axis=1,
    )
    hm = jnp.concatenate([hm, jnp.zeros((1, 19), dt)], axis=0)  # (L, 19)
    temps = _mf_temps(iterations, temp_start, temp_end, dt)
    return mrf_kernel.mean_field_fused_front(
        q_init.astype(dt), pts, hm, adj.band, 1.0 / temps, thr,
        spatial_weight, outlier_cost, kind=kind, interpret=interpret,
    )


def icm(
    labels: jax.Array,
    dcost: jax.Array,
    nbr_idx: jax.Array,
    nbr_w: jax.Array,
    spatial_weight: float,
    iterations: int,
    adj: BandedAdjacency | None = None,
) -> jax.Array:
    """Red-black ICM sweeps: each point moves to its locally cheapest label
    given the current neighbor labels, updating the two index-parity classes
    alternately and only on strict improvement. Fully synchronous ICM
    oscillates at strong coupling (the parallel-update analog of
    alpha-expansion's move cycling); half-sweeps with an improvement gate
    break the flip-flops while staying branch-free and vmappable."""
    n, l = dcost.shape
    # label-major hot loop, as in mean_field
    dct = dcost.T  # (L, N)
    agree_fn, deg = _agree_and_deg_t(nbr_idx, nbr_w, adj, dcost.dtype)
    parity = jnp.arange(n) % 2
    lab_ids = jnp.arange(l, dtype=labels.dtype)[:, None]  # (L, 1)

    def half(labels, par):
        onehot = (labels[None, :] == lab_ids).astype(dcost.dtype)  # (L,N)
        agree = agree_fn(onehot)
        cost = dct + spatial_weight * (deg - agree)  # (L, N)
        new = jnp.argmin(cost, axis=0)
        cur_c = jnp.take_along_axis(cost, labels[None, :], axis=0)[0]
        new_c = jnp.min(cost, axis=0)
        move = (new_c < cur_c - 1e-6) & (parity == par)
        return jnp.where(move, new, labels)

    def body(i, labels):
        labels = half(labels, 0)
        labels = half(labels, 1)
        return labels

    labels = jax.lax.fori_loop(0, iterations, body, labels)

    # expansion-style escape for the strong-coupling regime: single-point
    # moves cannot dissolve mutually-supporting islands, but the constant
    # labelings (zero Potts energy) are trivial to score — adopt the best
    # one if it beats the current state (alpha-expansion finds these moves
    # through maxflow; here they are a closed form).
    e_cur = (
        jnp.sum(jnp.take_along_axis(dct, labels[None, :], 0)[0])
        + spatial_weight * _potts(labels, nbr_idx, nbr_w, adj, dcost)
    )
    e_const = jnp.sum(dct, axis=1)  # (L,)
    best = jnp.argmin(e_const)
    return jnp.where(
        e_const[best] < e_cur, jnp.full_like(labels, best), labels
    )


def _potts(labels, nbr_idx, nbr_w, adj: BandedAdjacency | None, dcost):
    return _potts_t(labels, nbr_idx, nbr_w, adj, dcost.T)


def _potts_t(labels, nbr_idx, nbr_w, adj: BandedAdjacency | None, dct):
    """Potts energy through the active agreement operator: with a banded
    adjacency,  0.5 * sum_i (deg_i - agree_onehot[i, l_i])  — identical to
    the directed-edge sum (each undirected pair contributes w from both
    ordered directions, halved). Label-major layout (agree_t); dct is
    used for its (L, N) shape/dtype only (the transpose in the (N, L)
    wrapper is dead code after DCE)."""
    if adj is None:
        return potts_energy(labels, nbr_idx, nbr_w)
    lab_ids = jnp.arange(dct.shape[0], dtype=labels.dtype)[:, None]
    onehot = (labels[None, :] == lab_ids).astype(dct.dtype)  # (L, N)
    # one-hot contraction, not take_along_axis (traced: the gather along
    # the label axis costs ~10x the contraction)
    own = jnp.sum(onehot * adj.agree_t(onehot), axis=0)
    return 0.5 * jnp.sum(adj.deg[:, 0] - own)


def mrf_energy(
    labels: jax.Array,
    dcost: jax.Array,
    nbr_idx: jax.Array,
    nbr_w: jax.Array,
    spatial_weight: float,
    adj: BandedAdjacency | None = None,
) -> jax.Array:
    """data + lambda*Potts energy of a labeling (no label-cost term)."""
    return mrf_energy_t(
        labels, dcost.T, nbr_idx, nbr_w, spatial_weight, adj=adj
    )


def mrf_energy_t(
    labels: jax.Array,
    dct: jax.Array,
    nbr_idx: jax.Array,
    nbr_w: jax.Array,
    spatial_weight: float,
    adj: BandedAdjacency | None = None,
) -> jax.Array:
    """Label-major core of `mrf_energy` (dct: (L, N))."""
    l = dct.shape[0]
    oh = (labels[None, :] == jnp.arange(l)[:, None]).astype(dct.dtype)
    return jnp.sum(oh * dct) + spatial_weight * _potts_t(
        labels, nbr_idx, nbr_w, adj, dct
    )


def _icm_batch(starts: jax.Array, dct, spatial_weight, iterations,
               adj: BandedAdjacency, use_kernel: bool = False,
               interpret: bool = False) -> jax.Array:
    """All S restarts polished together, sharing every band read: the
    agreement is linear per label column, so the S one-hot stacks ride
    the label axis as one (S*L, N) operator call — one band sweep serves
    every restart (the agreement operator is memory-bound on the band,
    docs/PERF.md). Identical per-start results to sequential `icm`
    (parity-tested). With `use_kernel` (TPU + far-free adjacency) all
    half-sweeps run in one fused Pallas launch with the labels resident
    in VMEM (ops/kernels/mrf_kernel.py). starts: (S, N), dct: label-major
    (L, N) costs -> (S, N)."""
    s, n = starts.shape
    l = dct.shape[0]

    if use_kernel and _mrf_kernel_ok(adj):
        from multih_tpu.ops.kernels import mrf_kernel

        base = dct + spatial_weight * adj.deg.T  # (L, N)
        labels = mrf_kernel.icm_fused(
            starts.astype(jnp.int32), base, adj.band, iterations,
            spatial_weight, interpret=interpret,
        ).astype(starts.dtype)
        # constant-labeling escape, batched (see `icm` for rationale)
        e_cur = _energies_batch(labels, dct, adj, spatial_weight)
        e_const = jnp.sum(dct, axis=1)  # (L,)
        best = jnp.argmin(e_const)
        return jnp.where(
            (e_const[best] < e_cur)[:, None], jnp.full_like(labels, best),
            labels,
        )

    deg = adj.deg.T  # (1, N)
    parity = jnp.arange(n) % 2
    lab_ids = jnp.arange(l, dtype=starts.dtype)[None, :, None]  # (1,L,1)

    def half(labels, par):
        onehot = (labels[:, None, :] == lab_ids).astype(dct.dtype)
        agree = adj.agree_t(onehot.reshape(s * l, n)).reshape(s, l, n)
        cost = dct[None] + spatial_weight * (deg[None] - agree)  # (S,L,N)
        # argmin over the label axis, unrolled: jnp.argmin on the middle
        # axis of (S, L, N) lowers to an iota-reduce measured at
        # 0.59 ms/call (a third of the PEARL loop, docs/PERF.md); L is a
        # small static constant, so a compare-select chain of (S, N)
        # passes is ~30x cheaper. Strict < keeps first-minimum tie
        # semantics identical to jnp.argmin.
        new_c = cost[:, 0]
        new = jnp.zeros_like(labels)
        for lab in range(1, l):
            take = cost[:, lab] < new_c
            new_c = jnp.where(take, cost[:, lab], new_c)
            new = jnp.where(take, jnp.asarray(lab, labels.dtype), new)
        cur_c = jnp.sum(onehot * cost, axis=1)  # one-hot pick, no gather
        move = (new_c < cur_c - 1e-6) & (parity[None, :] == par)
        return jnp.where(move, new, labels)

    def body(i, labels):
        labels = half(labels, 0)
        labels = half(labels, 1)
        return labels

    labels = jax.lax.fori_loop(0, iterations, body, starts)

    # constant-labeling escape, batched (see `icm` for rationale)
    e_cur = _energies_batch(labels, dct, adj, spatial_weight)
    e_const = jnp.sum(dct, axis=1)  # (L,)
    best = jnp.argmin(e_const)
    return jnp.where(
        (e_const[best] < e_cur)[:, None], jnp.full_like(labels, best),
        labels,
    )


def _energies_batch(labels, dct, adj: BandedAdjacency, spatial_weight):
    """(S, N) labelings -> (S,) data + lambda*Potts energies, one one-hot
    and one operator call for everything. Label picks go through one-hot
    contractions, never take_along_axis: a gather along the middle axis
    of (S, L, N) costs ~0.26 ms on TPU (traced), the contraction ~0.02."""
    s, n = labels.shape
    l = dct.shape[0]
    lab_ids = jnp.arange(l, dtype=labels.dtype)[None, :, None]
    onehot = (labels[:, None, :] == lab_ids).astype(dct.dtype)  # (S,L,N)
    e_data = jnp.sum(onehot * dct[None], axis=(1, 2))
    agree = adj.agree_t(onehot.reshape(s * l, n)).reshape(s, l, n)
    own = jnp.sum(onehot * agree, axis=1)  # (S, N)
    e_potts = 0.5 * jnp.sum(adj.deg[None, :, 0] - own, axis=1)
    return e_data + spatial_weight * e_potts


def best_labeling(
    starts: list[jax.Array],
    dcost: jax.Array,
    nbr_idx: jax.Array,
    nbr_w: jax.Array,
    spatial_weight: float,
    icm_iterations: int,
    adj: BandedAdjacency | None = None,
    use_kernel: bool = False,
) -> jax.Array:
    """Run ICM from several start labelings and return the lowest-energy
    result — a restart strategy standing in for alpha-expansion's larger
    move space. Branch-free: all starts are polished, the winner selected
    by energy.

    With a banded adjacency the restarts are batched along the label axis
    (`_icm_batch`) so every sweep's band read is shared; on the gather
    fallback the starts stay a sequential Python loop (measured: vmapping
    lowers the gathers to a slower batched form — sequential is ~1.7x
    faster at N=10k)."""
    return best_labeling_t(
        starts, dcost.T, nbr_idx, nbr_w, spatial_weight, icm_iterations,
        adj=adj, use_kernel=use_kernel,
    )


def best_labeling_t(
    starts: list[jax.Array],
    dct: jax.Array,
    nbr_idx: jax.Array,
    nbr_w: jax.Array,
    spatial_weight: float,
    icm_iterations: int,
    adj: BandedAdjacency | None = None,
    use_kernel: bool = False,
) -> jax.Array:
    """Label-major core of `best_labeling`: dct is (L, N). The banded hot
    path runs transpose-free; the gather fallback (small N, tests) pays
    one transpose into the (N, L) reference `icm`."""
    if adj is not None and len(starts) > 1:
        stacked = jnp.stack(starts)  # (S, N)
        polished = _icm_batch(
            stacked, dct, spatial_weight, icm_iterations, adj,
            use_kernel=use_kernel,
        )
        energies = _energies_batch(polished, dct, adj, spatial_weight)
        return polished[jnp.argmin(energies)]
    dcost = dct.T
    polished = [
        icm(s, dcost, nbr_idx, nbr_w, spatial_weight, icm_iterations,
            adj=adj)
        for s in starts
    ]
    energies = jnp.stack(
        [
            mrf_energy(p, dcost, nbr_idx, nbr_w, spatial_weight, adj=adj)
            for p in polished
        ]
    )
    stacked = jnp.stack(polished)  # (n_starts, N)
    return stacked[jnp.argmin(energies)]
