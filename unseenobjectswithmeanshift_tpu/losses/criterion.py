"""DETR-style set criterion: Hungarian-matched class CE + point-sampled mask losses.

Ref: MSMFormer/meanshiftformer/modeling/criterion.py. Semantics preserved:
- loss_labels (:122-138): weighted CE over all queries; unmatched queries get the
  no-object class (weight eos_coef=0.1); torch F.cross_entropy's weighted MEAN
  (normalized by the sum of per-sample weights).
- loss_masks (:140-190): importance-sampled points (oversample 3.0, top 75%
  uncertain + 25% random), sigmoid-CE averaged per point then summed over masks,
  dice with +1 smoothing, both divided by num_masks.
- num_masks is the total valid gts all-reduced over data-parallel devices
  (jax.lax.psum replaces torch.distributed.all_reduce, :224-231), clamped to >= 1.
- deep supervision: every aux output is matched and scored identically (:239-245).

Fixed shapes: gt padded to [B, G] slots with a contiguous validity mask; matched
pairs are processed in G slots per image with zero contribution from invalid slots.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .matcher import hungarian_cost_matrix, solve_matches
from .point_sample import (
    point_sample, build_sample_window,
    get_uncertain_point_coords_with_randomness,
)


def loss_labels(pred_logits, gt_labels, gt_valid, matched_query, num_classes: int,
                eos_coef: float):
    """Weighted cross entropy over ALL queries (ref: criterion.py:122-138)."""
    B, Q, _ = pred_logits.shape
    target = jnp.full((B, Q), num_classes, jnp.int32)

    # scatter matched gt labels into target classes
    def scatter_one(tgt, mq, labels, valid):
        q = jnp.where(valid, mq, Q)  # invalid -> out-of-range (dropped)
        return tgt.at[q].set(jnp.where(valid, labels, num_classes), mode="drop")

    target = jax.vmap(scatter_one)(target, matched_query, gt_labels, gt_valid)

    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]  # [B, Q]
    weights = jnp.where(target == num_classes, eos_coef, 1.0)
    return (nll * weights).sum() / weights.sum()


def sigmoid_ce_loss(point_logits, point_labels, pair_valid, num_masks):
    """[M, P] -> scalar: per-mask mean BCE summed over masks / num_masks
    (ref: criterion.py:48-70)."""
    bce = jax.nn.softplus(point_logits) - point_logits * point_labels  # BCE w/ logits
    per_mask = bce.mean(axis=-1) * pair_valid
    return per_mask.sum() / num_masks


def dice_loss(point_logits, point_labels, pair_valid, num_masks):
    """(ref: criterion.py:21-45)"""
    probs = jax.nn.sigmoid(point_logits)
    numerator = 2 * (probs * point_labels).sum(-1)
    denominator = probs.sum(-1) + point_labels.sum(-1)
    loss = (1 - (numerator + 1) / (denominator + 1)) * pair_valid
    return loss.sum() / num_masks


def loss_masks(rng, pred_masks, gt_masks, gt_valid, matched_query, num_masks,
               num_points: int, oversample_ratio: float,
               importance_sample_ratio: float, mask_embed=None,
               mask_features=None, pair_idx=None, tgt_win=None,
               pair_valid_c=None, sample_dtype=None):
    """Point-sampled mask losses over matched pairs (ref: criterion.py:140-190).

    Predicted masks either materialized (pred_masks [B, Q, H, W]) or FACTORED
    (mask_embed [B, Q, C] + mask_features [B, H, W, C]); gt_masks [B, G, Hg, Wg];
    matched_query [B, G]. The factored form samples mask_features rows and
    applies the matched mask_embed afterwards (linear => identical results;
    per-pair map gathers dominated the train step on the TPU).

    pair_idx (optional, [P] int32): PAIR COMPACTION - sample only these
    flattened (b*G+g) pair slots (valid slots first; P a static budget >= the
    valid count). Padded gt slots contribute exactly zero to the losses either
    way, so compaction is loss-preserving while the point-sampling gathers -
    the train step's dominant cost - scale with the REAL instance count
    instead of B*max_gt. tgt_win/pair_valid_c: the compacted gt sample window
    and validity, prebuilt once in SetCriterion and shared by all heads.
    sample_dtype: map storage dtype for sampling (bf16 = the reference's AMP
    autocast behavior; exact for the 0/1 targets either way).
    """
    factored = pred_masks is None
    B, Q = (mask_embed.shape[:2] if factored else pred_masks.shape[:2])
    G = gt_masks.shape[1]
    Hg, Wg = gt_masks.shape[2], gt_masks.shape[3]

    mq = jnp.clip(matched_query, 0, Q - 1)
    if factored:
        # materialize only the G MATCHED pair maps (me_g @ mask_features,
        # [B, G, H, W] ~ 59 MB) instead of the full-Q per-layer maps; per-pair
        # coords then sample exactly like the dense path. (Sampling feature
        # ROWS per pair instead would build [B, G, S, C] fp32 temporaries -
        # 1.9 GB per head, OOM.)
        me_g = jnp.take_along_axis(mask_embed, mq[:, :, None], axis=1)  # [B,G,C]
        src = jnp.einsum("bgc,bhwc->bghw", me_g.astype(jnp.float32),
                         mask_features.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
        src = src.reshape(B * G, *src.shape[2:])
    else:
        src = jnp.take_along_axis(pred_masks, mq[:, :, None, None], axis=1)
        src = src.reshape(B * G, *src.shape[2:]).astype(jnp.float32)

    if pair_idx is not None:
        # whole-map rows (~1.2 MB each) - a cheap contiguous gather; the
        # expensive per-point gathers below then run on P pairs, not B*G
        src = src[pair_idx]
        pair_valid = pair_valid_c
    else:
        pair_valid = gt_valid.reshape(B * G).astype(jnp.float32)

    if sample_dtype is not None:
        src = src.astype(sample_dtype)
    coords = jax.lax.stop_gradient(get_uncertain_point_coords_with_randomness(
        rng, jax.lax.stop_gradient(src), num_points, oversample_ratio,
        importance_sample_ratio, row_idx=pair_idx,
        total_rows=(B * G if pair_idx is not None else None)))
    if tgt_win is None:
        tgt = gt_masks.reshape(B * G, Hg, Wg)
        if pair_idx is not None:
            tgt = tgt[pair_idx]
        tgt_win = build_sample_window(tgt.astype(sample_dtype or jnp.float32))
    point_labels = jax.lax.stop_gradient(
        point_sample(None, coords, win=tgt_win, hw=(Hg, Wg)))
    point_logits = point_sample(src, coords)

    return {
        "loss_mask": sigmoid_ce_loss(point_logits, point_labels, pair_valid, num_masks),
        "loss_dice": dice_loss(point_logits, point_labels, pair_valid, num_masks),
    }


class SetCriterion:
    """Functional criterion; call with model outputs and padded targets."""

    def __init__(self, num_classes: int = 2, class_weight: float = 2.0,
                 mask_weight: float = 5.0, dice_weight: float = 5.0,
                 eos_coef: float = 0.1, num_points: int = 12544,
                 oversample_ratio: float = 3.0,
                 importance_sample_ratio: float = 0.75,
                 deep_supervision: bool = True,
                 dp_axis: Optional[str] = None,
                 sample_dtype=None):
        self.num_classes = num_classes
        self.class_weight = class_weight
        self.mask_weight = mask_weight
        self.dice_weight = dice_weight
        self.eos_coef = eos_coef
        self.num_points = num_points
        self.oversample_ratio = oversample_ratio
        self.importance_sample_ratio = importance_sample_ratio
        self.deep_supervision = deep_supervision
        self.dp_axis = dp_axis  # mesh axis name for the num_masks all-reduce
        # map storage dtype for point sampling: bf16 mirrors the reference's
        # AMP autocast around the criterion (tabletop_train_net_pretrained.py:
        # 231-234) and halves the gather traffic; None = exact fp32
        self.sample_dtype = sample_dtype

    def weight_dict(self):
        return {"loss_ce": self.class_weight, "loss_mask": self.mask_weight,
                "loss_dice": self.dice_weight}

    def __call__(self, rng, outputs: Dict, gt_labels, gt_masks, gt_valid,
                 pair_budget: Optional[int] = None):
        """outputs: dict(pred_logits [B,Q,K+1], pred_masks [B,Q,H,W], aux_outputs);
        gt_labels [B, G] int32; gt_masks [B, G, H, W]; gt_valid [B, G] bool with
        valid slots contiguous from 0. Returns (total_loss, dict of raw losses).

        pair_budget: static pair-compaction budget (see loss_masks). Point-
        sample only that many matched pairs instead of all B*G slots; the
        caller must guarantee budget >= the batch's true instance count (the
        trainer buckets the host-known count), otherwise valid pairs are
        silently dropped from the mask losses. Bit-identical to the
        uncompacted loss when the guarantee holds (shared uniform draws)."""
        num_masks = gt_valid.sum().astype(jnp.float32)
        if self.dp_axis is not None:
            num_masks = jax.lax.psum(num_masks, self.dp_axis)
            world = jax.lax.psum(1, self.dp_axis)
        else:
            world = 1
        num_masks = jnp.maximum(num_masks / world, 1.0)

        heads = [outputs]
        if self.deep_supervision and "aux_outputs" in outputs:
            heads = heads + list(outputs["aux_outputs"])

        # pair compaction + the shared gt sample window, built ONCE (the gt
        # maps are head-independent; every deep-supervision head previously
        # re-padded/stacked the same [B*G, H+1, W+1, 4] window)
        B, G = gt_valid.shape
        Hg, Wg = gt_masks.shape[2], gt_masks.shape[3]
        valid_flat = gt_valid.reshape(B * G)
        tgt = gt_masks.reshape(B * G, Hg, Wg)
        if pair_budget is not None and pair_budget < B * G:
            # stable argsort puts valid slots first, in original order
            order = jnp.argsort(jnp.logical_not(valid_flat), stable=True)
            pair_idx = order[:pair_budget].astype(jnp.int32)
            pair_valid_c = valid_flat[pair_idx].astype(jnp.float32)
            tgt = tgt[pair_idx]
        else:
            pair_idx = None
            pair_valid_c = None
        tgt_win = build_sample_window(tgt, dtype=self.sample_dtype)

        # factored scoring: heads carrying mask_embed are scored against the
        # shared mask_features without materializing/sampling per-query maps
        mask_features = outputs.get("mask_features")

        # pass 1: matching cost matrices for every head; the LSAP solves then
        # run as ONE lockstep vmapped call over heads x batch (the sequential
        # while-loop solver per head was 0.57 s/step)
        head_keys, Cs = [], []
        for head in heads:
            rng, k_match, k_pts = jax.random.split(rng, 3)
            head_keys.append(k_pts)
            factored = mask_features is not None and "mask_embed" in head
            pm = None if factored else head["pred_masks"]
            me = head.get("mask_embed") if factored else None
            Cs.append(hungarian_cost_matrix(
                k_match, head["pred_logits"], pm, gt_labels,
                gt_masks, gt_valid, num_points=self.num_points,
                cost_class=self.class_weight, cost_mask=self.mask_weight,
                cost_dice=self.dice_weight, mask_embed=me,
                mask_features=mask_features if factored else None))
        matched_all = solve_matches(
            jnp.stack(Cs), jnp.broadcast_to(gt_valid, (len(heads),) + gt_valid.shape))

        losses = {}
        total = 0.0
        for i, head in enumerate(heads):
            matched = matched_all[i]
            factored = mask_features is not None and "mask_embed" in head
            pm = None if factored else head["pred_masks"]
            me = head.get("mask_embed") if factored else None
            l_ce = loss_labels(head["pred_logits"], gt_labels, gt_valid, matched,
                               self.num_classes, self.eos_coef)
            lm = loss_masks(head_keys[i], pm, gt_masks, gt_valid, matched,
                            num_masks, self.num_points, self.oversample_ratio,
                            self.importance_sample_ratio, mask_embed=me,
                            mask_features=mask_features if factored else None,
                            pair_idx=pair_idx, tgt_win=tgt_win,
                            pair_valid_c=pair_valid_c,
                            sample_dtype=self.sample_dtype)
            suffix = "" if i == 0 else f"_{i - 1}"
            losses[f"loss_ce{suffix}"] = l_ce
            losses[f"loss_mask{suffix}"] = lm["loss_mask"]
            losses[f"loss_dice{suffix}"] = lm["loss_dice"]
            total = total + self.class_weight * l_ce \
                + self.mask_weight * lm["loss_mask"] \
                + self.dice_weight * lm["loss_dice"]
        return total, losses
