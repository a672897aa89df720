"""Counter-based minimal sampling for hypothesis generation.

The reference draws its hypotheses sequentially — one per correspondence via
the affine+F one-point method and/or random 4-point samples (SURVEY.md §2 C5;
reference mount empty, see SURVEY.md §0). On TPU the sampler must be a pure
function of (key, sample_index) so the whole hypothesis pool is generated in
one launch with no sequential state: JAX's threefry counter RNG gives exactly
that (BASELINE.json:5 "counter-based threefry RNG with fully vmapped
hypothesis generation").

Sampling without replacement per 4-tuple uses the classic "draw from a
shrinking range, then shift past earlier picks" scheme (Floyd-style),
unrolled to the fixed minimal-sample size 4 — branch-free and vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MINIMAL_SAMPLE = 4


def _draw_without_replacement(key: jax.Array, n_valid: jax.Array) -> jax.Array:
    """Four distinct indices uniform over [0, n_valid). n_valid is traced.

    Draw r_j in [0, n_valid - j), then map into the set of not-yet-taken
    values by shifting past earlier picks in sorted order (unrolled, 4 picks).
    """
    keys = jax.random.split(key, MINIMAL_SAMPLE)
    raw = jnp.stack(
        [
            jax.random.randint(keys[j], (), 0, jnp.maximum(n_valid - j, 1))
            for j in range(MINIMAL_SAMPLE)
        ]
    )
    return _fix_collisions(raw)


def _fix_collisions(raw: jax.Array) -> jax.Array:
    """Map raw draws r_j in [0, n-j) to distinct values in [0, n).

    Iteratively: for pick j, repeatedly increment past any earlier pick with
    value <= current. With earlier picks sorted, 3 sequential comparisons per
    pick are exact; we sort the (<=3) earlier picks with an unrolled network.
    """
    out = [raw[0]]
    for j in range(1, MINIMAL_SAMPLE):
        prev = jnp.sort(jnp.stack(out))
        r = raw[j]
        for i in range(j):
            r = r + (prev[i] <= r).astype(r.dtype)
        out.append(r)
    return jnp.stack(out)


def sample_indices(
    key: jax.Array, n_samples: int, valid_mask: jax.Array
) -> jax.Array:
    """(S, 4) index quadruples into the padded point array, each quadruple
    distinct and drawn only from valid (unpadded) points.

    valid_mask: (N,) bool. Invalid points are excluded by sampling ranks in
    [0, n_valid) and mapping through the rank->position table (argsort puts
    valid positions first, in index order).
    """
    n = valid_mask.shape[0]
    n_valid = jnp.sum(valid_mask.astype(jnp.int32))
    # positions of valid points first (stable: ~mask ascending)
    order = jnp.argsort(jnp.logical_not(valid_mask), stable=True)
    keys = jax.random.split(key, n_samples)
    ranks = jax.vmap(_draw_without_replacement, in_axes=(0, None))(
        keys, n_valid
    )  # (S, 4) in [0, n_valid)
    ranks = jnp.clip(ranks, 0, n - 1)
    return order[ranks]


def localized_sample_indices(
    key: jax.Array,
    n_samples: int,
    valid_mask: jax.Array,
    nbr_idx: jax.Array,
    nbr_ok: jax.Array | None = None,
) -> jax.Array:
    """Locality-biased sampling: pick a seed point, then 3 of its spatial
    neighbors. Planes are spatially coherent (the premise of Multi-H's
    smoothness term), so local samples are far more likely to be all-inlier
    — the TPU analog of the reference's per-point affine hypothesis locality
    (SURVEY.md §3.2).

    nbr_idx: (N, k) spatial k-NN indices (from the labeling graph, C8).
    nbr_ok: optional (N, k) {0,1} per-edge preference mask (e.g. "neighbor
      not yet claimed by a found plane" in progressive sampling). Neighbor
    slots are drawn without replacement via Gumbel top-3, preferring
    slots with nbr_ok=1 but falling back gracefully when fewer than 3
    remain (soft -20 penalty instead of -inf keeps the draw well-defined).
    """
    n, k = nbr_idx.shape
    n_valid = jnp.sum(valid_mask.astype(jnp.int32))
    order = jnp.argsort(jnp.logical_not(valid_mask), stable=True)
    k_seed, k_nbr = jax.random.split(key)
    seed_rank = jax.random.randint(k_seed, (n_samples,), 0, jnp.maximum(n_valid, 1))
    seeds = order[seed_rank]  # (S,)
    # Gumbel top-3 over the k neighbor slots, penalizing masked-out slots
    g = jax.random.gumbel(k_nbr, (n_samples, k))
    if nbr_ok is not None:
        g = g + 20.0 * (nbr_ok[seeds] - 1.0)
    _, slots = jax.lax.top_k(g, 3)  # (S, 3) distinct slots
    picked = jnp.take_along_axis(nbr_idx[seeds], slots, axis=1)  # (S, 3)
    return jnp.concatenate([seeds[:, None], picked], axis=1)
