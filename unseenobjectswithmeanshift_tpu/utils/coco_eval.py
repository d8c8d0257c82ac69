"""COCO-style instance segmentation AP evaluator (no pycocotools dependency).

Equivalent of the reference's relaxed InstanceSegEvaluator
(ref: MSMFormer/meanshiftformer/evaluation/instance_evaluation.py, used when
TEST.EVAL_PERIOD > 0): mask AP at IoU 0.50:0.95 (101-point interpolation),
AP50, AP75, single foreground category.
"""

from __future__ import annotations

from typing import List

import numpy as np


def mask_iou_matrix(dets: np.ndarray, gts: np.ndarray) -> np.ndarray:
    """dets [D, H, W], gts [G, H, W] binary -> [D, G] IoU."""
    D = dets.reshape(dets.shape[0], -1).astype(np.float64)
    G = gts.reshape(gts.shape[0], -1).astype(np.float64)
    inter = D @ G.T
    union = D.sum(1)[:, None] + G.sum(1)[None, :] - inter
    return inter / np.maximum(union, 1e-9)


class InstanceSegEvaluator:
    """Accumulate per-image detections; compute COCO mask AP."""

    IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)

    def __init__(self):
        self.records = []   # per image: (scores [D], iou [D, G])

    def add_image(self, det_masks, det_scores, gt_masks):
        det_masks = np.asarray(det_masks, bool)
        gt_masks = np.asarray(gt_masks, bool)
        if det_masks.size == 0:
            iou = np.zeros((0, len(gt_masks)))
            det_scores = np.zeros((0,))
        elif gt_masks.size == 0:
            iou = np.zeros((len(det_masks), 0))
        else:
            iou = mask_iou_matrix(det_masks, gt_masks)
        self.records.append((np.asarray(det_scores, np.float64), iou))

    def _ap_at(self, thr: float) -> float:
        matches = []   # (score, is_tp)
        total_gt = 0
        for scores, iou in self.records:
            G = iou.shape[1]
            total_gt += G
            order = np.argsort(-scores)
            taken = np.zeros(G, bool)
            for d in order:
                best, best_g = thr, -1
                for g in range(G):
                    if not taken[g] and iou[d, g] >= best:
                        best, best_g = iou[d, g], g
                if best_g >= 0:
                    taken[best_g] = True
                    matches.append((scores[d], 1))
                else:
                    matches.append((scores[d], 0))
        if total_gt == 0 or not matches:
            return float("nan")
        matches.sort(key=lambda x: -x[0])
        tp = np.cumsum([m[1] for m in matches])
        fp = np.cumsum([1 - m[1] for m in matches])
        recall = tp / total_gt
        precision = tp / np.maximum(tp + fp, 1e-9)
        # 101-point interpolation
        ap = 0.0
        for r in np.linspace(0, 1, 101):
            p = precision[recall >= r]
            ap += (p.max() if len(p) else 0.0) / 101
        return float(ap)

    def summarize(self) -> dict:
        aps = {f"AP{int(t * 100)}": self._ap_at(t) for t in self.IOU_THRS}
        ap = float(np.nanmean(list(aps.values())))
        return {"AP": ap, "AP50": aps["AP50"], "AP75": aps["AP75"], **aps}
