"""Counter-based minimal sampling for hypothesis generation.

The reference draws its hypotheses sequentially — one per correspondence via
the affine+F one-point method and/or random 4-point samples (SURVEY.md §2 C5;
reference mount empty, see SURVEY.md §0). On TPU the sampler must be a pure
function of (key, sample_index) so the whole hypothesis pool is generated in
one launch with no sequential state: JAX's threefry counter RNG gives exactly
that (BASELINE.json:5 "counter-based threefry RNG with fully vmapped
hypothesis generation").

Sampling without replacement per minimal tuple uses the classic "draw from
a shrinking range, then shift past earlier picks" scheme (Floyd-style),
unrolled to the fixed minimal-sample size (4 for homographies, 8 for
fundamental matrices) — branch-free and vmappable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MINIMAL_SAMPLE = 4


def _draw_without_replacement(
    key: jax.Array, n_valid: jax.Array, m: int = MINIMAL_SAMPLE
) -> jax.Array:
    """`m` distinct indices uniform over [0, n_valid). n_valid is traced.

    Draw r_j in [0, n_valid - j), then map into the set of not-yet-taken
    values by shifting past earlier picks in sorted order (unrolled picks).
    """
    keys = jax.random.split(key, m)
    raw = jnp.stack(
        [
            jax.random.randint(keys[j], (), 0, jnp.maximum(n_valid - j, 1))
            for j in range(m)
        ]
    )
    return _fix_collisions(raw)


def _fix_collisions(raw: jax.Array) -> jax.Array:
    """Map raw draws r_j in [0, n-j) to distinct values in [0, n).

    Iteratively: for pick j, repeatedly increment past any earlier pick with
    value <= current. With earlier picks sorted, j sequential comparisons
    per pick are exact; the (<= m-1) earlier picks are sorted with an
    unrolled network.
    """
    m = raw.shape[0]
    out = [raw[0]]
    for j in range(1, m):
        prev = jnp.sort(jnp.stack(out))
        r = raw[j]
        for i in range(j):
            r = r + (prev[i] <= r).astype(r.dtype)
        out.append(r)
    return jnp.stack(out)


def sample_indices(
    key: jax.Array, n_samples: int, valid_mask: jax.Array,
    m: int = MINIMAL_SAMPLE,
) -> jax.Array:
    """(S, m) minimal-sample index tuples into the padded point array, each
    tuple distinct and drawn only from valid (unpadded) points.

    valid_mask: (N,) bool. Invalid points are excluded by sampling ranks in
    [0, n_valid) and mapping through the rank->position table (argsort puts
    valid positions first, in index order).
    """
    n = valid_mask.shape[0]
    n_valid = jnp.sum(valid_mask.astype(jnp.int32))
    # positions of valid points first (stable: ~mask ascending)
    order = jnp.argsort(jnp.logical_not(valid_mask), stable=True)
    keys = jax.random.split(key, n_samples)
    ranks = jax.vmap(
        functools.partial(_draw_without_replacement, m=m), in_axes=(0, None)
    )(keys, n_valid)  # (S, m) in [0, n_valid)
    ranks = jnp.clip(ranks, 0, n - 1)
    return order[ranks]


def localized_sample_indices(
    key: jax.Array,
    n_samples: int,
    valid_mask: jax.Array,
    nbr_idx: jax.Array,
    nbr_ok: jax.Array | None = None,
    cluster: int = 4,
) -> jax.Array:
    """Locality-biased sampling: pick a seed point, then 3 of its spatial
    neighbors. Planes are spatially coherent (the premise of Multi-H's
    smoothness term), so local samples are far more likely to be all-inlier
    — the TPU analog of the reference's per-point affine hypothesis locality
    (SURVEY.md §3.2).

    nbr_idx: (N, k) spatial k-NN indices (from the labeling graph, C8).
    nbr_ok: optional (N, k) {0,1} per-edge preference mask (e.g. "neighbor
      not yet claimed by a found plane" in progressive sampling). Neighbor
    slots are drawn without replacement via Gumbel top-(cluster-1),
    preferring slots with nbr_ok=1 but falling back gracefully when too
    few remain (soft -20 penalty instead of -inf keeps the draw
    well-defined).

    cluster: points per cluster (seed + cluster-1 neighbors; requires
    cluster-1 <= k). 4 for homography quads; 6 for the fundamental
    model's 12-point two-cluster samples.
    """
    n, k = nbr_idx.shape
    assert cluster - 1 <= k, (cluster, k)
    n_valid = jnp.sum(valid_mask.astype(jnp.int32))
    order = jnp.argsort(jnp.logical_not(valid_mask), stable=True)
    k_seed, k_nbr = jax.random.split(key)
    seed_rank = jax.random.randint(k_seed, (n_samples,), 0, jnp.maximum(n_valid, 1))
    seeds = order[seed_rank]  # (S,)
    # Gumbel top-(cluster-1) over the k neighbor slots, penalizing
    # masked-out slots
    g = jax.random.gumbel(k_nbr, (n_samples, k))
    if nbr_ok is not None:
        g = g + 20.0 * (nbr_ok[seeds] - 1.0)
    _, slots = jax.lax.top_k(g, cluster - 1)  # (S, c-1) distinct slots
    picked = jnp.take_along_axis(nbr_idx[seeds], slots, axis=1)
    return jnp.concatenate([seeds[:, None], picked], axis=1)


def _window_roll(a: jax.Array, block: int) -> jax.Array:
    """(N, C) -> (nb, 3B, C): each row's 3-block Morton window, same roll
    layout as labeling.knn_graph_windowed (left third = previous block,
    wrapped at the edges; the wrap thirds are neutralized by the zeroed
    availability channel, never by branching)."""
    n, c = a.shape
    nb = n // block
    ab = a.reshape(nb, block, c)
    return jnp.concatenate(
        [jnp.roll(ab, 1, axis=0), ab, jnp.roll(ab, -1, axis=0)], axis=1
    )


def windowed_quadruples(
    key: jax.Array,
    x1: jax.Array,
    x2: jax.Array,
    avail: jax.Array,
    nbr_idx: jax.Array,
    n_samples: int,
    block: int,
    use_kernel: bool = False,
    interpret: bool = False,
    window_range=None,
) -> jax.Array:
    """Window-stratified minimal samples, gathered on the MXU: returns the
    (32, S) coordinate-major rows `pipeline._solve_minimal` builds (row
    8q+c = channel c of quadruple point q; channels x1x,x1y,x2x,x2y,avail).

    Replaces the 4S-index XLA row gather (4.4 ms at stress shape,
    docs/PERF.md) with per-window one-hot contractions
    (ops/kernels/gather_kernel.py). Each sample is assigned a static
    Morton window (S/nb samples per window); within its window, half the
    samples draw 4 distinct points uniformly among AVAILABLE rows
    (rank-mode selection — never lands on claimed/padded points), half
    draw an available seed in the window's middle block plus 3 of its
    k-NN neighbors (the windowed graph guarantees the neighbors lie in
    the same window). Stratification differences vs the global sampler:

    - seeds/uniform points are uniform per-window, not per-point: blocks
      with fewer available points get proportionally denser sampling —
      stratified coverage, A/B'd for accuracy at the stress shape
      (docs/PERF.md);
    - neighbor draws don't pre-filter by availability (that lookup is
      the gather being eliminated); quadruples touching a claimed
      neighbor are discarded by the solve's avail check exactly as the
      global path discards them, and claims are spatially coherent, so
      an available seed's neighbors are mostly available;
    - windows with no available points yield all-zero columns ->
      degenerate quads -> ok=0: exhausted regions waste their slots
      instead of producing wrong samples.

    Columns come out window-major — window v owns the contiguous slot
    range [v*S/nb, (v+1)*S/nb) — so a hypothesis-sharded fit can give
    each shard a contiguous window subset. `window_range=(w0, nw)` (nw
    static, w0 may be traced) computes ONLY those nw windows' columns:
    all RNG draws are replicated counter math over the full window set
    (cheap), so shard results concatenate bit-identically to the
    unsharded call — the same replicated-draws/sharded-solves contract
    as `generate_hypotheses`'s sharded mode.

    Requires N % block == 0, n_samples % (N//block) == 0, and a
    window-constrained nbr_idx (labeling.knn_graph_windowed with the same
    block). Callers gate on all three.
    """
    from multih_tpu.ops.kernels import gather_kernel

    n, k = nbr_idx.shape
    nb = n // block
    assert n % block == 0 and n_samples % nb == 0, (n, block, n_samples)
    sg = n_samples // nb
    sg_l = sg // 2
    sg_u = sg - sg_l
    f32 = jnp.float32

    # windowed source: [x1x x1y x2x x2y avail cum pos nbr_0..k-1], padded
    # to a multiple of 8 channels
    base = jnp.concatenate(
        [x1.astype(f32), x2.astype(f32), avail.astype(f32)[:, None],
         nbr_idx.astype(f32)], axis=1
    )  # (N, 5 + k)
    win = _window_roll(base, block)  # (nb, 3B, 5+k)
    a_w = win[:, :, 4]
    # wrap thirds are not part of the window: their rows must never be
    # rank-selected
    a_w = a_w.at[0, :block].set(0.0).at[nb - 1, 2 * block:].set(0.0)
    cum = jnp.cumsum(a_w, axis=1)
    pos = jnp.broadcast_to(
        jnp.arange(3 * block, dtype=f32)[None, :], a_w.shape
    )
    c_tot = 5 + k + 3
    pad_c = (-c_tot) % 8
    win_all = jnp.concatenate(
        [win[:, :, :4], a_w[:, :, None], cum[:, :, None], pos[:, :, None],
         win[:, :, 5:]]
        + ([jnp.zeros((*a_w.shape, pad_c), f32)] if pad_c else []),
        axis=2,
    )  # (nb, 3B, C) with avail_ch=4, cum_ch=5, pos_ch=6, nbr at 7..7+k

    m = cum[:, -1].astype(jnp.int32)  # (nb,) available rows per window
    k_u, k_s, k_n = jax.random.split(key, 3)

    # uniform half: 4 distinct ranks among the window's available rows
    keys_u = jax.random.split(k_u, nb * sg_u)
    m_rep = jnp.repeat(m, sg_u)
    ranks_u = jax.vmap(_draw_without_replacement)(keys_u, m_rep)
    ranks_u = ranks_u.reshape(nb, sg_u * MINIMAL_SAMPLE)

    # localized half: seed rank confined to the middle block's available
    # rows [cum[B-1], cum[2B-1]); exhausted middles fall back to the
    # whole window (branch-free blend)
    c_lo = cum[:, block - 1].astype(jnp.int32)
    c_hi = cum[:, 2 * block - 1].astype(jnp.int32)
    has_mid = c_hi > c_lo
    lo = jnp.where(has_mid, c_lo, 0)[:, None]
    hi = jnp.where(has_mid, c_hi, jnp.maximum(m, 1))[:, None]
    ranks_s = jax.random.randint(k_s, (nb, sg_l), lo, jnp.maximum(hi, lo + 1))
    g = jax.random.gumbel(k_n, (nb, sg_l, k))

    # shard subset: draws above are full-window-set counter math on every
    # shard; only the gathers/solves below run on this shard's windows
    if window_range is not None:
        w0, nw = window_range
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, w0, nw, axis=0)
        win_all, ranks_u, ranks_s, g = map(sl, (win_all, ranks_u, ranks_s, g))
        w_ids = w0 + jnp.arange(nw, dtype=f32)
    else:
        nw = nb
        w_ids = jnp.arange(nb, dtype=f32)

    gather = (
        (lambda w, s, mode: gather_kernel.window_gather(
            w, s, mode, interpret=interpret))
        if use_kernel else gather_kernel.window_gather_reference
    )

    def pad_t(sel):
        t = sel.shape[1]
        pad = (-t) % 512
        if pad:
            sel = jnp.concatenate(
                [sel, jnp.full((nw, pad), -1, sel.dtype)], axis=1
            )
        return sel, t

    sel_rank, t_r = pad_t(
        jnp.concatenate([ranks_u, ranks_s], axis=1).astype(jnp.int32)
    )
    out_r = gather(win_all, sel_rank, "rank")[:, :, :t_r]
    u_part = out_r[:, :8, : sg_u * MINIMAL_SAMPLE]
    s_part = out_r[:, :, sg_u * MINIMAL_SAMPLE:]

    seed_loc = s_part[:, 6, :]                     # (nw, Sg_l) local pos
    nbr_rows = jnp.swapaxes(s_part[:, 7:7 + k, :], 1, 2)  # (nw, Sg_l, k)
    _, slots = jax.lax.top_k(g, 3)                 # (nw, Sg_l, 3)
    ohk = (slots[..., None] == jnp.arange(k)[None, None, None, :]).astype(f32)
    picked = jnp.sum(nbr_rows[:, :, None, :] * ohk, axis=-1)  # (nw,Sg_l,3)
    v_off = ((w_ids - 1.0) * block)[:, None, None]
    loc = picked - v_off                           # window-local neighbor
    quad_loc = jnp.concatenate(
        [seed_loc[:, :, None], loc], axis=2
    ).reshape(nw, sg_l * MINIMAL_SAMPLE)

    sel_idx, t_i = pad_t(quad_loc.astype(jnp.int32))
    out_i = gather(win_all[:, :, :8], sel_idx, "index")[:, :8, :t_i]

    def to_rows(part, s_count):  # (nw, 8, s*4) -> (32, nw, s)
        return part.reshape(nw, 8, s_count, MINIMAL_SAMPLE).transpose(
            3, 1, 0, 2
        ).reshape(32, nw, s_count)

    # window-major columns: window v owns slots [v*sg, (v+1)*sg), its
    # uniform samples first — a shard's window subset is a contiguous
    # global slot range
    return jnp.concatenate(
        [to_rows(u_part, sg_u), to_rows(out_i, sg_l)], axis=2
    ).reshape(32, nw * sg)
