"""Misclassification metric (reference C14) unit tests."""

import numpy as np

from multih_tpu.utils import evaluation


OUT = 16  # pipeline outlier label


class TestMisclassification:
    def test_perfect(self):
        gt = np.array([1, 1, 2, 2, 0, 0])
        pred = np.array([3, 3, 7, 7, OUT, OUT])
        assert evaluation.misclassification_error(pred, gt, OUT) == 0.0

    def test_label_permutation_invariance(self):
        gt = np.array([1, 1, 1, 2, 2, 2])
        for a, b in [(0, 1), (5, 2), (2, 5)]:
            pred = np.array([a] * 3 + [b] * 3)
            assert evaluation.misclassification_error(pred, gt, OUT) == 0.0

    def test_counts_errors(self):
        gt = np.array([1, 1, 1, 1, 0])
        pred = np.array([2, 2, 2, OUT, OUT])  # one plane point marked outlier
        err = evaluation.misclassification_error(pred, gt, OUT)
        assert abs(err - 20.0) < 1e-9

    def test_outliers_not_matched_to_planes(self):
        # predicted outlier label never counts as a plane match
        gt = np.array([0, 0, 0, 1, 1, 1])
        pred = np.array([OUT, OUT, OUT, OUT, OUT, OUT])
        err = evaluation.misclassification_error(pred, gt, OUT)
        assert abs(err - 50.0) < 1e-9

    def test_split_plane_matches_bigger_half(self):
        gt = np.array([1] * 10)
        pred = np.array([2] * 7 + [3] * 3)  # plane split 7/3
        err = evaluation.misclassification_error(pred, gt, OUT)
        assert abs(err - 30.0) < 1e-9

    def test_padding_ignored(self):
        gt = np.array([1, 1, -1, -1])
        pred = np.array([4, 4, 9, 9])
        assert evaluation.misclassification_error(pred, gt, OUT) == 0.0

    def test_more_planes_than_gt(self):
        gt = np.array([1, 1, 1, 1, 2, 2, 2, 2])
        pred = np.array([0, 0, 0, 1, 2, 2, 3, 3])
        # best matching: 0->1 (3 right), 2->2 (2) or {2,3}... hungarian picks
        # max total = 3 + 2 = 5 -> 3 errors
        err = evaluation.misclassification_error(pred, gt, OUT)
        assert abs(err - 37.5) < 1e-9

    def test_match_labels_mapping(self):
        gt = np.array([1, 1, 2, 2, 0])
        pred = np.array([5, 5, 3, 3, OUT])
        m = evaluation.match_labels(pred, gt, OUT)
        assert m[5] == 1 and m[3] == 2 and m[OUT] == 0
