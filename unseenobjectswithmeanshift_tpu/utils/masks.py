"""Mask utilities: greedy NMS, host-side combine, tight boxes, visualization.

- nms: greedy IoU suppression over instance bitmaps (ref: lib/fcn/nms.py),
  used when USE_NMS=True for real-world images (test_utils.py:30)
- combine_masks_np / combine_masks_with_nms: host-side versions of
  test_utils.py:55-112 returning (label image, score image, bboxes)
- mask_to_tight_box: ref lib/utils/mask.py
"""

from __future__ import annotations

import numpy as np


def nms(masks: np.ndarray, scores: np.ndarray, thresh: float = 0.7) -> np.ndarray:
    """Greedy mask-IoU NMS (ref: lib/fcn/nms.py). masks: [N, H, W] binary;
    scores: [N]. Returns indices kept, in descending score order."""
    order = np.argsort(-scores)
    areas = masks.reshape(masks.shape[0], -1).sum(1).astype(np.float64)
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            inter = np.logical_and(masks[i], masks[j]).sum()
            iou = inter / (areas[i] + areas[j] - inter + 1e-10)
            if iou > thresh:
                suppressed[j] = True
    return np.asarray(keep, np.int64)


def combine_masks_np(masks, valid=None):
    """[N, H, W] binary -> [H, W] label image with labels from 2
    (ref: combine_masks, test_utils.py:93-112)."""
    n, h, w = masks.shape
    out = np.zeros((h, w), np.int32)
    for i in range(n):
        if valid is None or valid[i]:
            out[masks[i] > 0] = i + 2
    return out


def combine_masks_with_nms(masks, scores, thresh: float = 0.7):
    """(ref: combine_masks_with_NMS, test_utils.py:55-91). Returns
    (label image from 2, score image (int percent), bboxes [N, 5])."""
    keep = nms(masks, scores, thresh)
    masks = masks[keep]
    scores = scores[keep]
    n, h, w = masks.shape
    bin_mask = np.zeros((h, w), np.int32)
    score_mask = np.zeros((h, w), np.int32)
    bbox = np.zeros((n, 5), np.float32)
    for i in range(n):
        pos = np.nonzero(masks[i])
        if len(pos[0]) == 0:
            continue
        bin_mask[pos] = i + 2
        score_mask[pos] = int(scores[i] * 100)
        bbox[i] = [pos[1].min(), pos[0].min(), pos[1].max(), pos[0].max(), scores[i]]
    return bin_mask, score_mask, bbox


def mask_to_tight_box_np(mask):
    ys, xs = np.nonzero(mask)
    return int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())
