"""Hungarian matcher, entirely on device.

Ref: MSMFormer/meanshiftformer/modeling/matcher.py. The reference hops to the CPU
for scipy.linear_sum_assignment (:149-151); here the cost matrix (point-sampled
sigmoid-CE + dice + class costs, :96-148) is computed batched on the TPU and the
tiny [Q, G] assignment is solved by the device-side Jonker-Volgenant solver in
lsap.py (the axon TPU runtime has no host-callback support, and staying on device
keeps the whole train step one jit graph).

Fixed shapes: ground truth is padded to max_gt slots with a CONTIGUOUS validity
mask (valid slots first); the solver assigns the valid slice and returns, for
every gt slot, the index of its matched query (-1 for invalid slots).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .point_sample import point_sample, point_sample_factored
from .lsap import solve_lsap


def batch_dice_cost(inputs, targets):
    """inputs [Q, P] logits, targets [G, P] binary -> [Q, G]
    (ref: batch_dice_loss, matcher.py:15-30)."""
    probs = jax.nn.sigmoid(inputs)
    numerator = 2 * jnp.einsum("qp,gp->qg", probs, targets, precision=jax.lax.Precision.HIGHEST)
    denominator = probs.sum(-1)[:, None] + targets.sum(-1)[None, :]
    return 1 - (numerator + 1) / (denominator + 1)


def batch_sigmoid_ce_cost(inputs, targets):
    """[Q, P] x [G, P] -> [Q, G] mean-BCE cost (ref: batch_sigmoid_ce_loss,
    matcher.py:38-62): pos/neg decomposition of BCE-with-logits."""
    P = inputs.shape[1]
    pos = jax.nn.softplus(-inputs)          # BCE(x, 1)
    neg = jax.nn.softplus(inputs)           # BCE(x, 0)
    loss = jnp.einsum("qp,gp->qg", pos, targets,
                      precision=jax.lax.Precision.HIGHEST) \
        + jnp.einsum("qp,gp->qg", neg, 1 - targets,
                     precision=jax.lax.Precision.HIGHEST)
    return loss / P


def hungarian_cost_matrix(rng, pred_logits, pred_masks, gt_labels, gt_masks,
                          gt_valid, num_points: int, cost_class: float = 2.0,
                          cost_mask: float = 5.0, cost_dice: float = 5.0,
                          mask_embed=None, mask_features=None):
    """Batched matching cost matrices [B, Q, G] (solve separately - the
    criterion batches the LSAP solves of ALL deep-supervision heads into one
    lockstep vmapped call; the sequential while-loop solver was 0.57 s/step
    run per head)."""
    B, Q = pred_logits.shape[:2]
    G = gt_labels.shape[1]
    factored = pred_masks is None

    def per_image(key, logits, masks_or_embed, mfeat, labels, gmasks, valid):
        out_prob = jax.nn.softmax(logits.astype(jnp.float32), -1)     # [Q, K+1]
        cost_cls = -jnp.take(out_prob, labels, axis=1)                # [Q, G]

        points = jax.random.uniform(key, (1, num_points, 2))
        if factored:
            out_pts = point_sample_factored(masks_or_embed, mfeat, points)
        else:
            pts_q = jnp.broadcast_to(points, (Q, num_points, 2))
            out_pts = point_sample(masks_or_embed.astype(jnp.float32), pts_q)
        pts_g = jnp.broadcast_to(points, (G, num_points, 2))
        tgt_pts = point_sample(gmasks.astype(jnp.float32), pts_g)     # [G, P]

        cm = batch_sigmoid_ce_cost(out_pts, tgt_pts)
        cd = batch_dice_cost(out_pts, tgt_pts)
        C = cost_mask * cm + cost_class * cost_cls + cost_dice * cd   # [Q, G]
        return jnp.nan_to_num(C, nan=1e8, posinf=1e8, neginf=-1e8)

    keys = jax.random.split(rng, B)
    if factored:
        return jax.vmap(per_image)(keys, pred_logits, mask_embed, mask_features,
                                   gt_labels, gt_masks, gt_valid)
    return jax.vmap(lambda k, l, m, la, gm, v: per_image(k, l, m, None, la, gm, v))(
        keys, pred_logits, pred_masks, gt_labels, gt_masks, gt_valid)


def solve_matches(C, gt_valid):
    """C: [..., Q, G] cost matrices; gt_valid [..., G]. Vmapped device LSAP
    over every leading dim; returns matched query per gt slot [..., G]."""
    flat_C = C.reshape((-1,) + C.shape[-2:])
    flat_n = gt_valid.reshape(-1, gt_valid.shape[-1]).sum(-1).astype(jnp.int32)
    out = jax.vmap(lambda c, n: solve_lsap(c.T, n))(flat_C, flat_n)
    return out.reshape(C.shape[:-2] + (C.shape[-1],))


def hungarian_match(rng, pred_logits, pred_masks, gt_labels, gt_masks, gt_valid,
                    num_points: int, cost_class: float = 2.0, cost_mask: float = 5.0,
                    cost_dice: float = 5.0, mask_embed=None, mask_features=None):
    """Batched matching.

    pred_logits [B, Q, K+1]; gt_labels [B, G] int32; gt_masks [B, G, H, W]
    float binary; gt_valid [B, G] bool. Predicted masks come either
    materialized (pred_masks [B, Q, H, W]) or FACTORED (mask_embed [B, Q, C] +
    mask_features [B, H, W, C]) - the factored form samples the shared feature
    map once per image and applies mask_embed afterwards (linear, identical
    results; per-query map gathers were 76 ms/call on the TPU).
    Returns matched_query [B, G] int32 (-1 where invalid).

    All masks share one random point set per image (matcher.py:119-126).
    """
    C = hungarian_cost_matrix(rng, pred_logits, pred_masks, gt_labels, gt_masks,
                              gt_valid, num_points, cost_class, cost_mask,
                              cost_dice, mask_embed, mask_features)
    return solve_matches(C, gt_valid)
