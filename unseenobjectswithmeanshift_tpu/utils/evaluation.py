"""Instance-segmentation evaluation: Objects / Boundary Precision-Recall-F.

Host-side numpy implementation with identical semantics to the reference
(ref: lib/utils/evaluation.py). Differences in mechanism only:
- the Hungarian assignment uses scipy.optimize.linear_sum_assignment instead of the
  vendored pure-Python munkres (lib/utils/munkres.py); both minimize the same cost
  (F.max() - F) and yield assignments of equal total score,
- the disk structuring element (skimage.morphology.disk) is generated inline.
"""

from __future__ import annotations

import numpy as np
import cv2
from scipy.optimize import linear_sum_assignment

BACKGROUND_LABEL = 0
OBJECTS_LABEL = 1


def disk(radius: int) -> np.ndarray:
    """Boolean disk structuring element, identical to skimage.morphology.disk."""
    L = np.arange(-radius, radius + 1)
    x, y = np.meshgrid(L, L)
    return ((x ** 2 + y ** 2) <= radius ** 2).astype(np.uint8)


def seg2bmap(seg: np.ndarray) -> np.ndarray:
    """1-pixel-wide binary boundary map of a binary segmentation.

    Boundary pixels are offset 1/2 px towards the origin from the true segment
    boundary (ref: lib/utils/evaluation.py:15-72, David Martin's bmap).
    """
    seg = seg.astype(bool)

    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)

    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]

    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = False
    return b


def boundary_overlap(predicted_mask: np.ndarray, gt_mask: np.ndarray, bound_th: float = 0.003):
    """True positives of dilated boundaries: (precision_tps, recall_tps).

    Ref: lib/utils/evaluation.py:75-106.
    """
    bound_pix = bound_th if bound_th >= 1 else int(np.ceil(bound_th * np.linalg.norm(predicted_mask.shape)))

    fg_boundary = seg2bmap(predicted_mask)
    gt_boundary = seg2bmap(gt_mask)

    kernel = disk(int(bound_pix))
    gt_dil = cv2.dilate(gt_boundary.astype(np.uint8), kernel, iterations=1)
    fg_dil = cv2.dilate(fg_boundary.astype(np.uint8), kernel, iterations=1)

    fg_match = np.logical_and(fg_boundary, gt_dil)
    gt_match = np.logical_and(gt_boundary, fg_dil)
    return int(np.sum(fg_match)), int(np.sum(gt_match))


def multilabel_metrics(prediction: np.ndarray, gt: np.ndarray, obj_detect_threshold: float = 0.75) -> dict:
    """Overlap and Boundary P/R/F over object labels (>=2; 0=bg, 1=table ignored in
    the object sense but any nonzero pred/gt label participates - matching the
    reference, which only excludes BACKGROUND_LABEL==0).

    Ref: lib/utils/evaluation.py:109-258.
    """
    labels_gt = np.unique(gt)
    labels_gt = labels_gt[~np.isin(labels_gt, [BACKGROUND_LABEL])]
    num_labels_gt = labels_gt.shape[0]

    labels_pred = np.unique(prediction)
    labels_pred = labels_pred[~np.isin(labels_pred, [BACKGROUND_LABEL])]
    num_labels_pred = labels_pred.shape[0]

    # Edge cases (identical constants to the reference)
    if num_labels_pred == 0 and num_labels_gt > 0:  # all false negatives
        return {
            "Objects F-measure": 0.0, "Objects Precision": 1.0, "Objects Recall": 0.0,
            "Boundary F-measure": 0.0, "Boundary Precision": 1.0, "Boundary Recall": 0.0,
            "obj_detected": num_labels_pred, "obj_detected_075": 0.0,
            "obj_gt": num_labels_gt, "obj_detected_075_percentage": 0.0,
        }
    if num_labels_pred > 0 and num_labels_gt == 0:  # all false positives
        return {
            "Objects F-measure": 0.0, "Objects Precision": 0.0, "Objects Recall": 1.0,
            "Boundary F-measure": 0.0, "Boundary Precision": 0.0, "Boundary Recall": 1.0,
            "obj_detected": num_labels_pred, "obj_detected_075": 0.0,
            "obj_gt": num_labels_gt, "obj_detected_075_percentage": 0.0,
        }
    if num_labels_pred == 0 and num_labels_gt == 0:  # correctly predicted nothing
        return {
            "Objects F-measure": 1.0, "Objects Precision": 1.0, "Objects Recall": 1.0,
            "Boundary F-measure": 1.0, "Boundary Precision": 1.0, "Boundary Recall": 1.0,
            "obj_detected": num_labels_pred, "obj_detected_075": 0.0,
            "obj_gt": num_labels_gt, "obj_detected_075_percentage": 1.0,
        }

    F = np.zeros((num_labels_gt, num_labels_pred))
    true_positives = np.zeros((num_labels_gt, num_labels_pred))
    boundary_stuff = np.zeros((num_labels_gt, num_labels_pred, 2))

    for i, gt_i in enumerate(labels_gt):
        gt_i_mask = gt == gt_i
        gt_count = np.count_nonzero(gt_i_mask)
        for j, pred_j in enumerate(labels_pred):
            pred_j_mask = prediction == pred_j
            tp = np.int64(np.count_nonzero(np.logical_and(pred_j_mask, gt_i_mask)))
            true_positives[i, j] = tp
            prec = tp / np.count_nonzero(pred_j_mask)
            rec = tp / gt_count
            if prec + rec > 0:
                F[i, j] = (2 * prec * rec) / (prec + rec)
            boundary_stuff[i, j] = boundary_overlap(pred_j_mask, gt_i_mask)

    boundary_prec_denom = sum(np.sum(seg2bmap(prediction == pj)) for pj in labels_pred)
    boundary_rec_denom = sum(np.sum(seg2bmap(gt == gi)) for gi in labels_gt)

    F[np.isnan(F)] = 0
    row, col = linear_sum_assignment(F.max() - F)
    idx = (row, col)

    num_obj_detected = int(np.sum(F[idx] > obj_detect_threshold))

    precision = np.sum(true_positives[idx]) / np.sum(prediction.clip(0, 1) == OBJECTS_LABEL)
    recall = np.sum(true_positives[idx]) / np.sum(gt.clip(0, 1) == OBJECTS_LABEL)
    F_measure = (2 * precision * recall) / (precision + recall + 1e-10)
    if np.isnan(F_measure):
        F_measure = 0.0

    boundary_precision = np.sum(boundary_stuff[idx][:, 0]) / boundary_prec_denom
    boundary_recall = np.sum(boundary_stuff[idx][:, 1]) / boundary_rec_denom
    boundary_F_measure = (2 * boundary_precision * boundary_recall) / (
        boundary_precision + boundary_recall + 1e-10
    )
    if np.isnan(boundary_F_measure):
        boundary_F_measure = 0.0

    return {
        "Objects F-measure": float(F_measure),
        "Objects Precision": float(precision),
        "Objects Recall": float(recall),
        "Boundary F-measure": float(boundary_F_measure),
        "Boundary Precision": float(boundary_precision),
        "Boundary Recall": float(boundary_recall),
        "obj_detected": int(num_labels_pred),
        "obj_detected_075": num_obj_detected,
        "obj_gt": int(num_labels_gt),
        "obj_detected_075_percentage": num_obj_detected / num_labels_gt,
    }


METRIC_PRINT_ORDER = [
    "Objects Precision", "Objects Recall", "Objects F-measure",
    "Boundary Precision", "Boundary Recall", "Boundary F-measure",
    "obj_detected_075_percentage",
]


def aggregate_metrics(metrics_list) -> dict:
    """Average a list of per-image metric dicts (ref: test_utils.py:439-457)."""
    result = {}
    n = len(metrics_list)
    for metrics in metrics_list:
        for k, v in metrics.items():
            result[k] = result.get(k, 0) + v
    return {k: v / n for k, v in result.items()}


def print_metrics(result: dict) -> str:
    lines = []
    for k in sorted(result.keys()):
        lines.append("%s: %f" % (k, result[k]))
    for k in METRIC_PRINT_ORDER:
        if k in result:
            lines.append("%.6f" % result[k])
    out = "\n".join(lines)
    print(out)
    return out


def save_result_mat(path: str, labels, labels_refined, filename: str):
    """Persist per-image results as .mat (ref: test_segnet,
    lib/fcn/test_dataset.py:337-340)."""
    import scipy.io

    scipy.io.savemat(path, {"labels": labels, "labels_refined": labels_refined,
                            "filename": filename}, do_compression=True)
