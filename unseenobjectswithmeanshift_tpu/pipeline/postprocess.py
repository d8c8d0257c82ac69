"""Fixed-shape, on-device instance post-processing.

The reference's host loops over ``torch.unique`` / Instances objects become
masked fixed-size ops (max_instances slots), so the whole pipeline stays inside
one jit graph:

- instance_inference: top-k over query x class scores, mask-probability scoring
  (ref: pretrained_meanshiftformer_model.py:461-497)
- get_confident_instances: score thresholds
  (ref: lib/fcn/test_utils.py:35-52)
- combine_masks: instance bitmaps -> single label image, labels from 2, later
  instances overwrite earlier ones (ref: test_utils.py:93-112)
- filter_labels_depth: drop masks with too few valid-depth pixels
  (ref: lib/fcn/test_dataset.py:183-198)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Instances(NamedTuple):
    """Fixed-size instance set (T = max detections)."""

    masks: jax.Array      # [T, H, W] bool (mask logits > 0)
    mask_logits: jax.Array  # [T, H, W] float
    scores: jax.Array     # [T] float (class score * mean mask prob)
    classes: jax.Array    # [T] int32
    valid: jax.Array      # [T] bool


def instance_inference(pred_logits, pred_masks, num_classes: int, topk: int,
                       mask_embed=None, mask_features=None,
                       out_hw=None) -> Instances:
    """Per-image instance extraction (ref: instance_inference, :461-497).

    pred_logits: [Q, K+1]; pred_masks: [Q, H, W] logits at output resolution,
    OR None with (mask_embed [Q, C], mask_features [H, W, C]) instead - the
    top-k query selection depends only on class scores, so the mask einsum is
    computed for just the selected queries (exactly the reference result; the
    einsum is linear per query and selection/resize commute with it).
    Returns topk instances in descending class-score order (torch.topk order).
    """
    Q = pred_logits.shape[0]
    scores = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)[:, :-1]  # [Q, K]
    flat = scores.reshape(-1)                                 # [Q*K]
    scores_per_image, topk_idx = jax.lax.top_k(flat, topk)    # sorted descending
    labels_per_image = (topk_idx % num_classes).astype(jnp.int32)
    query_idx = topk_idx // num_classes
    # keep the gathered masks in the model dtype (bf16 halves HBM traffic on the
    # big [T, H, W] maps); only the tiny reductions accumulate in fp32
    if pred_masks is None:
        me_sel = mask_embed[query_idx]                        # [T, C]
        mask_logits = jnp.einsum("tc,hwc->thw", me_sel, mask_features)
        if out_hw is not None and mask_logits.shape[-2:] != tuple(out_hw):
            from ..ops.resize import resize_bilinear
            mask_logits = resize_bilinear(mask_logits[..., None], out_hw,
                                          align_corners=False)[..., 0]
    else:
        mask_logits = pred_masks[query_idx]                   # [T, H, W]
    masks = mask_logits > 0
    # average mask probability over the binarized mask (:494)
    probs = jax.nn.sigmoid(mask_logits)
    mask_scores = (probs * masks).astype(jnp.float32).sum((-1, -2)) / (
        masks.astype(jnp.float32).sum((-1, -2)) + 1e-6)
    final_scores = scores_per_image * mask_scores
    return Instances(masks=masks, mask_logits=mask_logits, scores=final_scores,
                     classes=labels_per_image,
                     valid=jnp.ones_like(final_scores, dtype=bool))


def get_confident_instances(inst: Instances, topk: bool = True, score: float = 0.7,
                            num_classes: int = 2, low_threshold: float = 0.4) -> Instances:
    """Score filtering (ref: get_confident_instances, test_utils.py:35-52).

    topk=True (the eval default): keep class==1 with score > low_threshold.
    topk=False: keep score > score.
    """
    if topk and num_classes >= 2:
        valid = (inst.classes == 1) & (inst.scores > low_threshold)
    elif topk:
        valid = inst.valid
    else:
        valid = inst.scores > score
    return inst._replace(valid=valid & inst.valid)


def combine_masks(inst: Instances) -> jax.Array:
    """[H, W] int32 label image. The reference filters to confident instances
    FIRST and then assigns labels contiguously 2..N+1 in instance order, with
    LATER instances overwriting earlier ones on overlap (test_utils.py:107-109).
    Labels start at 2 because 1 stands for table. The fixed-shape equivalent of
    the filtering is a cumsum rank over the valid slots, so valid instance #k
    (in slot order) gets label k+2 with no gaps - bitwise-identical to the
    reference's renumbering."""
    ranks = jnp.cumsum(inst.valid.astype(jnp.int32))   # [T] 1-based among valid
    ids = (ranks + 1) * inst.valid.astype(jnp.int32)   # k-th valid -> k+1+1 = 2..N+1
    stamped = inst.masks * ids[:, None, None]          # [T, H, W]
    return jnp.max(stamped, axis=0).astype(jnp.int32)  # ids increase in slot order,
    # so max == last-pasted (the reference's overwrite semantics)


def filter_labels_depth(label, xyz_z, threshold: float, max_label: int):
    """Zero out labels whose fraction of valid-depth (z > 0) pixels is below the
    threshold (ref: filter_labels_depth, test_dataset.py:183-198).

    label: [H, W] int32 with values in [0, max_label); xyz_z: [H, W] z channel.
    """
    V = max_label
    HW = label.shape[0] * label.shape[1]
    oh = jax.nn.one_hot(label.reshape(HW), V, dtype=jnp.float32, axis=0)  # [V, HW]
    # per-label pixel count and valid-depth count in ONE matmul
    rhs = jnp.stack([jnp.ones(HW, jnp.float32),
                     (xyz_z.reshape(HW) > 0).astype(jnp.float32)], axis=-1)
    stats = oh @ rhs                                                    # [V, 2]
    sizes, valid_depth = stats[:, 0], stats[:, 1]
    frac = valid_depth / jnp.maximum(sizes, 1.0)
    keep = (frac >= threshold) | (jnp.arange(V) == 0)                   # 0 = background
    # keep[label] as a matvec through the one-hot (per-pixel table gathers are
    # TPU-hostile; this was 13.6 ms/batch as a gather, < 1 ms as a matvec)
    keep_pix = (keep.astype(jnp.float32) @ oh).reshape(label.shape) > 0.5
    return jnp.where(keep_pix, label, 0)


def renumber_labels_by_size(label, max_label: int):
    """Renumber nonzero labels to 1..K ordered by DESCENDING pixel count
    (background 0 unchanged). Returns (renumbered label, num_clusters).

    Used by the UCN pipeline before refinement: mean_shift_smart_init can emit
    up to num_seeds (100) clusters but only max_instances crop slots exist, so
    the slots must go to the LARGEST clusters - the reference crops every
    unique label with no cap (ref: lib/fcn/test_dataset.py:314-321); with the
    static bound, size ordering + an explicit dropped-cluster count is the
    fixed-shape equivalent. Ties keep the original label order (stable sort).
    """
    V = max_label
    HW = label.shape[0] * label.shape[1]
    oh = jax.nn.one_hot(label.reshape(HW), V, dtype=jnp.float32, axis=0)  # [V, HW]
    sizes = oh.sum(-1)
    sizes = sizes.at[0].set(0.0)               # background takes no rank
    order = jnp.argsort(-sizes, stable=True)   # labels by size desc
    new_id = jnp.zeros(V, jnp.int32).at[order].set(
        jnp.arange(1, V + 1, dtype=jnp.int32))
    new_id = jnp.where(sizes > 0, new_id, 0).at[0].set(0)
    # remap pixels via the one-hot matvec (gathers are TPU-hostile)
    renumbered = (new_id.astype(jnp.float32) @ oh).reshape(label.shape)
    num_clusters = (sizes > 0).sum().astype(jnp.int32)
    return renumbered.astype(jnp.int32), num_clusters


def mask_to_tight_box(mask):
    """(x_min, y_min, x_max, y_max) of a [H, W] boolean mask
    (ref: lib/utils/mask.py mask_to_tight_box). Returns zeros for empty masks."""
    H, W = mask.shape
    any_row = jnp.any(mask, axis=1)
    any_col = jnp.any(mask, axis=0)
    ridx = jnp.arange(H)
    cidx = jnp.arange(W)
    y_min = jnp.min(jnp.where(any_row, ridx, H)).astype(jnp.int32)
    y_max = jnp.max(jnp.where(any_row, ridx, -1)).astype(jnp.int32)
    x_min = jnp.min(jnp.where(any_col, cidx, W)).astype(jnp.int32)
    x_max = jnp.max(jnp.where(any_col, cidx, -1)).astype(jnp.int32)
    empty = ~jnp.any(mask)
    zero = jnp.int32(0)
    return (jnp.where(empty, zero, x_min), jnp.where(empty, zero, y_min),
            jnp.where(empty, zero, x_max), jnp.where(empty, zero, y_max))


def filter_labels_bbox(label, bboxes, num_boxes_valid, max_label: int,
                       threshold: float = 0.8):
    """Zero out labels that lie mostly INSIDE the given boxes (ref:
    filter_labels, test_dataset.py:202-228 - used to suppress detections on
    known objects in the robot-pushing setting).

    label: [H, W] int32; bboxes: [N, 4] (x1, y1, x2, y2) int32;
    num_boxes_valid: scalar; labels with > threshold of their area inside the
    union of boxes are removed.
    """
    H, W = label.shape
    Y = jnp.arange(H)[:, None]
    X = jnp.arange(W)[None, :]

    def one_box(i, m):
        x1, y1, x2, y2 = bboxes[i, 0], bboxes[i, 1], bboxes[i, 2], bboxes[i, 3]
        x1 = jnp.maximum(x1, 0)
        y1 = jnp.maximum(y1, 0)
        x2 = jnp.minimum(x2, W - 1)
        y2 = jnp.minimum(y2, H - 1)
        inside = (Y >= y1) & (Y < y2) & (X >= x1) & (X < x2)
        return m | (inside & (i < num_boxes_valid))

    bbox_mask = jax.lax.fori_loop(0, bboxes.shape[0], one_box,
                                  jnp.zeros((H, W), bool))

    V = max_label
    HW = H * W
    oh = jax.nn.one_hot(label.reshape(HW), V, dtype=jnp.float32, axis=0)  # [V, HW]
    rhs = jnp.stack([jnp.ones(HW, jnp.float32),
                     bbox_mask.reshape(HW).astype(jnp.float32)], axis=-1)
    stats = oh @ rhs                                                      # [V, 2]
    sizes, inside_counts = stats[:, 0], stats[:, 1]
    pct = inside_counts / jnp.maximum(sizes, 1.0)
    drop = (pct > threshold) & (jnp.arange(V) != 0)
    drop_pix = (drop.astype(jnp.float32) @ oh).reshape(label.shape) > 0.5
    return jnp.where(drop_pix, 0, label)
