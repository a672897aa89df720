"""Hypothesis verification and candidate selection.

Replaces the reference's mode-seeking step (SURVEY.md §2 C7: median/mean-shift
clustering of the per-point hypothesis cloud, Multi-H paper §3.2) with a
TPU-friendly equivalent of the same role — collapse thousands of hypotheses
into <= K initial plane candidates:

1. verify every hypothesis: inlier count from the residual matrix
   (one contraction, BASELINE.json:5);
2. keep the top-M by count (jax.lax.top_k);
3. greedy non-maximum suppression on inlier-set IoU, where the pairwise
   intersection matrix is a single M x M matmul of the binary inlier masks
   (MXU work, no loops over pairs).

Everything is static-shape: selection returns exactly K candidates plus an
active mask (weak candidates are masked, never dropped by shape).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inlier_mask(
    residuals: jax.Array, threshold_sq: jax.Array, valid: jax.Array
) -> jax.Array:
    """(S, N) squared residuals -> (S, N) float {0,1} inlier mask, zeroed on
    padded points."""
    return (residuals < threshold_sq).astype(residuals.dtype) * valid[None, :]


def select_candidates(
    residuals: jax.Array,
    valid: jax.Array,
    threshold_sq: jax.Array,
    hypothesis_ok: jax.Array,
    n_candidates: int,
    max_labels: int,
    nms_iou: float,
):
    """Top-M + IoU-NMS selection of K plane candidates.

    Args:
      residuals: (S, N) squared residuals of all hypotheses.
      valid: (N,) float {0,1} mask of real (unpadded) points.
      threshold_sq: squared inlier threshold.
      hypothesis_ok: (S,) float {0,1} — degenerate-sample mask from C5.
      n_candidates: M, hypotheses surviving the count cut.
      max_labels: K, candidates returned.
      nms_iou: suppression threshold on inlier-set IoU.

    Returns:
      (cand_idx (K,), cand_active (K,) float): indices into the hypothesis
      pool and which of the K slots hold a real (non-suppressed, non-empty)
      candidate.
    """
    masks = inlier_mask(residuals, threshold_sq, valid)  # (S, N)
    counts = jnp.sum(masks, axis=1) * hypothesis_ok  # (S,)

    top_counts, top_idx = jax.lax.top_k(counts, n_candidates)  # (M,)
    top_masks = masks[top_idx]  # (M, N)

    # pairwise intersection via one matmul; union from the counts.
    inter = jnp.dot(
        top_masks, top_masks.T, preferred_element_type=jnp.float32
    )  # (M, M)
    union = top_counts[:, None] + top_counts[None, :] - inter
    iou = inter / jnp.maximum(union, 1.0)

    # Greedy NMS, K rounds: pick the best-count unsuppressed hypothesis,
    # suppress everything overlapping it. Fixed trip count -> fori_loop.
    m = n_candidates

    def body(k, state):
        alive, picked, picked_ok = state
        score = top_counts * alive
        best = jnp.argmax(score)
        ok = score[best] > 0.0
        picked = picked.at[k].set(best)
        picked_ok = picked_ok.at[k].set(ok.astype(jnp.float32))
        # suppress overlapping + self
        suppress = (iou[best] >= nms_iou) | (
            jnp.arange(m) == best
        )
        alive = jnp.where(ok, alive * (1.0 - suppress.astype(alive.dtype)), alive)
        return alive, picked, picked_ok

    alive0 = jnp.ones((m,), residuals.dtype)
    picked0 = jnp.zeros((max_labels,), jnp.int32)
    ok0 = jnp.zeros((max_labels,), jnp.float32)
    _, picked, picked_ok = jax.lax.fori_loop(
        0, max_labels, body, (alive0, picked0, ok0)
    )
    return top_idx[picked], picked_ok


def select_candidates_coverage(
    residuals: jax.Array,
    valid: jax.Array,
    threshold_sq: jax.Array,
    hypothesis_ok: jax.Array,
    n_candidates: int,
    max_labels: int,
    min_gain: float = 4.0,
):
    """Greedy MARGINAL-COVERAGE selection of K candidates (facility-
    location greedy): each round picks the hypothesis covering the most
    still-uncovered points, then marks its inliers covered.

    Why it exists (multi-model extension): epipolar constraints are weak
    enough that a single F often 'bridges' two motions — such bridging
    hypotheses outcount every pure single-motion model, and count-ranked
    NMS fills all K slots with distinct bridges while pure models of the
    smaller motions never enter the roster (measured: a 4-motion scene
    whose top-16 covered only 2 motions). Marginal gain fixes the roster
    composition structurally: once a bridge is taken its points stop
    counting, so the next pick is a pure model of an uncovered motion.
    Bridges that survive into PEARL lose their members to the
    tighter-fitting pure models and die to the min-support/label-cost
    prunes. The homography path keeps the count+NMS rule (its candidates
    do not bridge — a plane's homography has zero freedom left; changing
    its selection would disturb golden parity for no benefit).

    A duplicate of an already-picked candidate has ~zero marginal gain by
    construction, so no explicit IoU suppression is needed; slots whose
    best marginal gain falls below `min_gain` (in points) are masked
    inactive.
    """
    masks = inlier_mask(residuals, threshold_sq, valid)  # (S, N)
    counts = jnp.sum(masks, axis=1) * hypothesis_ok  # (S,)
    top_counts, top_idx = jax.lax.top_k(counts, n_candidates)
    top_masks = masks[top_idx] * (top_counts > 0)[:, None]  # (M, N)

    def body(k, state):
        uncovered, picked, picked_ok = state
        gain = jnp.dot(top_masks, uncovered,
                       preferred_element_type=jnp.float32)  # (M,)
        best = jnp.argmax(gain)
        ok = gain[best] >= min_gain
        picked = picked.at[k].set(best)
        picked_ok = picked_ok.at[k].set(ok.astype(jnp.float32))
        uncovered = jnp.where(ok, uncovered * (1.0 - top_masks[best]),
                              uncovered)
        return uncovered, picked, picked_ok

    uncovered0 = valid.astype(residuals.dtype)
    picked0 = jnp.zeros((max_labels,), jnp.int32)
    ok0 = jnp.zeros((max_labels,), jnp.float32)
    _, picked, picked_ok = jax.lax.fori_loop(
        0, max_labels, body, (uncovered0, picked0, ok0)
    )
    return top_idx[picked], picked_ok
