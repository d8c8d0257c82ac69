"""Golden tests for the evaluation metrics against hand-checked tiny masks and a
torch-free reimplementation of the reference semantics."""

import numpy as np
import pytest

from unseenobjectswithmeanshift_tpu.utils.evaluation import (
    seg2bmap, boundary_overlap, multilabel_metrics, disk, aggregate_metrics,
)


def test_disk_matches_skimage_definition():
    d1 = disk(1)
    assert d1.tolist() == [[0, 1, 0], [1, 1, 1], [0, 1, 0]]
    d3 = disk(3)
    assert d3.shape == (7, 7)
    assert d3[3, 0] == 1 and d3[0, 0] == 0


def test_seg2bmap_square():
    seg = np.zeros((8, 8), dtype=np.uint8)
    seg[2:6, 2:6] = 1
    b = seg2bmap(seg)
    # boundary offset 1/2 px toward origin: rows/cols 1..5 edges
    assert b.sum() > 0
    # interior pixels are not boundary
    assert not b[4, 4]
    # pixel just outside top-left corner of the segment is boundary (offset toward origin)
    assert b[1, 1]


def test_perfect_prediction_scores_one():
    gt = np.zeros((32, 32), dtype=np.int32)
    gt[4:12, 4:12] = 2
    gt[20:28, 18:30] = 3
    m = multilabel_metrics(gt.copy(), gt)
    assert m["Objects F-measure"] == pytest.approx(1.0)
    assert m["Boundary F-measure"] == pytest.approx(1.0, abs=1e-9)
    assert m["obj_detected_075_percentage"] == pytest.approx(1.0)


def test_empty_prediction_edge_case():
    gt = np.zeros((16, 16), dtype=np.int32)
    gt[2:6, 2:6] = 2
    pred = np.zeros_like(gt)
    m = multilabel_metrics(pred, gt)
    assert m["Objects F-measure"] == 0.0
    assert m["Objects Precision"] == 1.0
    assert m["Objects Recall"] == 0.0

    m2 = multilabel_metrics(gt, pred)  # all false positives
    assert m2["Objects Precision"] == 0.0
    assert m2["Objects Recall"] == 1.0

    m3 = multilabel_metrics(pred, pred)  # both empty
    assert m3["Objects F-measure"] == 1.0


def test_hungarian_matching_picks_best_pairs():
    gt = np.zeros((32, 32), dtype=np.int32)
    gt[0:10, 0:10] = 2
    gt[20:30, 20:30] = 3
    # prediction labels swapped + slightly shifted
    pred = np.zeros_like(gt)
    pred[0:10, 1:11] = 7
    pred[21:31, 20:30] = 5
    m = multilabel_metrics(pred, gt)
    # 9/10 row or column overlap -> IoU-ish F should be high
    assert m["Objects F-measure"] > 0.85
    assert m["obj_detected_075"] == 2


def test_half_overlap_metrics_value():
    # One GT object 10x10=100 px; prediction covers exactly half (50 px TP, 0 FP)
    gt = np.zeros((32, 32), dtype=np.int32)
    gt[0:10, 0:10] = 2
    pred = np.zeros_like(gt)
    pred[0:5, 0:10] = 2
    m = multilabel_metrics(pred, gt)
    assert m["Objects Precision"] == pytest.approx(1.0)
    assert m["Objects Recall"] == pytest.approx(0.5)
    assert m["Objects F-measure"] == pytest.approx(2 * 1.0 * 0.5 / 1.5, rel=1e-6)


def test_boundary_overlap_symmetric_for_equal_masks():
    mask = np.zeros((32, 32), dtype=np.uint8)
    mask[8:24, 8:24] = 1
    p, r = boundary_overlap(mask, mask)
    assert p == r == seg2bmap(mask).sum()


def test_aggregate():
    a = {"x": 1.0}
    b = {"x": 3.0}
    assert aggregate_metrics([a, b])["x"] == 2.0
