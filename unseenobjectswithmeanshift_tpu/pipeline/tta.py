"""Test-time augmentation: horizontal-flip averaging for semantic segmentation.

Equivalent of SemanticSegmentorWithTTA
(ref: MSMFormer/meanshiftformer/test_time_augmentation.py): run the model on the
image and its horizontal flip, un-flip the second prediction, average the
semantic probabilities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def semantic_inference(pred_logits, pred_masks):
    """Per-pixel class probabilities (ref: semantic_inference,
    pretrained_meanshiftformer_model.py:397-401): softmax classes (no bg) x
    sigmoid masks -> [K, H, W]."""
    probs = jax.nn.softmax(pred_logits.astype(jnp.float32), -1)[..., :-1]  # [Q,K]
    masks = jax.nn.sigmoid(pred_masks.astype(jnp.float32))                  # [Q,H,W]
    return jnp.einsum("qk,qhw->khw", probs, masks)


def tta_flip_semantic(apply_fn, variables, image, xyz=None):
    """Average semantic predictions over identity + horizontal flip.

    apply_fn(variables, image, xyz) -> dict(pred_logits [B,Q,K+1],
    pred_masks [B,Q,H,W]).
    """
    out = apply_fn(variables, image, xyz)
    sem = jax.vmap(semantic_inference)(out["pred_logits"], out["pred_masks"])

    flipped = image[:, :, ::-1]
    fxyz = None
    if xyz is not None:
        fxyz = xyz[:, :, ::-1]
        # flipping inverts the x axis of the point cloud
        fxyz = fxyz.at[..., 0].multiply(-1.0)
    out_f = apply_fn(variables, flipped, fxyz)
    sem_f = jax.vmap(semantic_inference)(out_f["pred_logits"], out_f["pred_masks"])
    sem_f = sem_f[:, :, :, ::-1]
    return 0.5 * (sem + sem_f)
