"""Evaluation: misclassification error vs. ground truth (reference C14).

The reference prints the AdelaideRMF misclassification percentage — the
fraction of points whose computed label disagrees with ground truth under the
best label permutation (SURVEY.md §2 C14, §3.5; BASELINE.json:2). Computed
labels and GT labels are both arbitrary integer namings of the same planes,
so the match must be solved as an assignment problem (Hungarian); the outlier
label (GT 0 in AdelaideRMF convention) is matched to the pipeline's outlier
label, consistent with the standard protocol for this benchmark.

Host-side (NumPy/SciPy): runs once per fit on a few hundred points — not a
device workload.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment


def misclassification_error(
    pred: np.ndarray,
    gt: np.ndarray,
    pred_outlier: int,
    gt_outlier: int = 0,
) -> float:
    """Misclassification % under optimal plane-label matching.

    Args:
      pred: (N,) predicted labels; `pred_outlier` marks outliers.
      gt: (N,) ground-truth labels; `gt_outlier` marks outliers. Entries < 0
        are ignored (padding).
      pred_outlier: the pipeline's outlier label id (cfg.max_labels).
      gt_outlier: AdelaideRMF uses 0 for outliers.

    Returns:
      Error in percent, [0, 100].
    """
    pred = np.asarray(pred)
    gt = np.asarray(gt)
    keep = gt >= 0
    pred, gt = pred[keep], gt[keep]
    n = pred.size
    if n == 0:
        return 0.0

    pred_ids = np.unique(pred[pred != pred_outlier])
    gt_ids = np.unique(gt[gt != gt_outlier])

    # confusion matrix between predicted planes and GT planes
    conf = np.zeros((pred_ids.size, gt_ids.size), np.int64)
    for i, p in enumerate(pred_ids):
        for j, g in enumerate(gt_ids):
            conf[i, j] = np.sum((pred == p) & (gt == g))

    correct = np.sum((pred == pred_outlier) & (gt == gt_outlier))
    if conf.size:
        ri, ci = linear_sum_assignment(-conf)
        correct += conf[ri, ci].sum()
    return 100.0 * (1.0 - correct / n)


def match_labels(
    pred: np.ndarray, gt: np.ndarray, pred_outlier: int, gt_outlier: int = 0
) -> dict:
    """The optimal pred-plane -> gt-plane mapping used by the metric (for
    diagnostics / visualization)."""
    pred = np.asarray(pred)
    gt = np.asarray(gt)
    keep = gt >= 0
    pred, gt = pred[keep], gt[keep]
    pred_ids = np.unique(pred[pred != pred_outlier])
    gt_ids = np.unique(gt[gt != gt_outlier])
    conf = np.zeros((pred_ids.size, gt_ids.size), np.int64)
    for i, p in enumerate(pred_ids):
        for j, g in enumerate(gt_ids):
            conf[i, j] = np.sum((pred == p) & (gt == g))
    mapping = {int(pred_outlier): int(gt_outlier)}
    if conf.size:
        ri, ci = linear_sum_assignment(-conf)
        for i, j in zip(ri, ci):
            mapping[int(pred_ids[i])] = int(gt_ids[j])
    return mapping
