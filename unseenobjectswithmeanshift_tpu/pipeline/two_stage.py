"""Two-stage (whole image + zoom-in crops) MSMFormer inference - one jit graph.

Mirrors test_sample_crop / test_sample_crop_nolabel (ref: lib/fcn/test_utils.py:
245-421) but with zero host round-trips: stage 1 predicts instances, the RoI
crops are extracted on device, the crop network runs ONCE over the whole batch of
max_instances crops, and the refined labels are pasted back - all inside jit.

Stage outputs:
  label       [H, W] int32  - stage-1 labels (values 0 and 2..T+1)
  label_refined [H, W] int32 - refined labels (values from 1), or stage-1 labels
                               when no crop survives
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.meta_arch import MSMFormer
from .postprocess import (
    instance_inference, get_confident_instances, combine_masks, filter_labels_depth,
)
from .refine import crop_rois, match_label_crop


def stage1_labels(cfg: Config, outputs, xyz, image_hw, osd: bool = False):
    """instance extraction -> confident filter -> label image -> depth filter,
    for ONE image. outputs: dict with pred_logits [Q,K+1] and either
    pred_masks [Q,H,W] or (mask_embed, mask_features) from the light path."""
    t = cfg.test
    inst = instance_inference(outputs["pred_logits"], outputs.get("pred_masks"),
                              num_classes=cfg.decoder.num_classes,
                              topk=t.max_instances,
                              mask_embed=outputs.get("mask_embed"),
                              mask_features=outputs.get("mask_features"),
                              out_hw=image_hw)
    inst = get_confident_instances(inst, topk=t.topk, score=t.confident_score,
                                   num_classes=cfg.decoder.num_classes,
                                   low_threshold=t.low_threshold)
    label = combine_masks(inst)
    if xyz is not None:
        thr = t.depth_filter_threshold_osd if osd else t.depth_filter_threshold_ocid
        label = filter_labels_depth(label, xyz[..., 2], thr,
                                    max_label=t.max_instances + 2)
    return label, inst


class TwoStagePredictor:
    """Builds and jits the fused two-stage inference function.

    model/model_crop: MSMFormer modules (whole-image and crop configs).
    Call with variables trees and [B, H, W, 3] inputs (B images processed via vmap
    of the per-image post-processing; both network forwards are batched).
    """

    def __init__(self, cfg: Config, cfg_crop: Optional[Config] = None,
                 dtype=jnp.float32):
        self.cfg = cfg
        self.cfg_crop = cfg_crop or cfg
        self.model = MSMFormer(cfg=cfg, dtype=dtype)
        self.model_crop = MSMFormer(cfg=self.cfg_crop, dtype=dtype)
        self._fn = None

    def init(self, rng, image_shape, crop_size: int = 224):
        """Initialize both stage param trees (for tests / training-from-scratch)."""
        H, W = image_shape
        img = jnp.zeros((1, H, W, 3))
        xyz = jnp.zeros((1, H, W, 3)) if self.cfg.use_depth else None
        v1 = self.model.init(rng, img, xyz)
        imgc = jnp.zeros((1, crop_size, crop_size, 3))
        xyzc = jnp.zeros((1, crop_size, crop_size, 3)) if self.cfg.use_depth else None
        v2 = self.model_crop.init(rng, imgc, xyzc)
        return v1, v2

    def __call__(self, variables, variables_crop, image, xyz=None, osd: bool = False,
                 refine: bool = True):
        if self._fn is None:
            self._fn = jax.jit(partial(self._forward), static_argnames=("osd", "refine"))
        return self._fn(variables, variables_crop, image, xyz, osd=osd, refine=refine)

    def _forward(self, variables, variables_crop, image, xyz, osd: bool,
                 refine: bool):
        """image: [B, H, W, 3]; xyz: [B, H, W, 3] or None (already padded /32)."""
        cfg = self.cfg
        t = cfg.test
        B, H, W = image.shape[0], image.shape[1], image.shape[2]
        T, S = t.max_instances, t.crop_size

        has_depth = xyz is not None
        outputs = self.model.apply(variables, image, xyz, light=True)

        light = "pred_masks" not in outputs
        if light:
            per_img = {"pred_logits": outputs["pred_logits"],
                       "mask_embed": outputs["mask_embed"],
                       "mask_features": outputs["mask_features"]}
        else:
            per_img = {"pred_logits": outputs["pred_logits"],
                       "pred_masks": outputs["pred_masks"]}
        if has_depth:
            labels, _ = jax.vmap(
                lambda o, d: stage1_labels(cfg, o, d, (H, W), osd=osd))(per_img, xyz)
        else:
            labels, _ = jax.vmap(
                lambda o: stage1_labels(cfg, o, None, (H, W), osd=osd))(per_img)

        if not refine:
            return labels, labels

        # ---- stage 2: batched crops ----
        def per_image_crops(img_i, lab_i, xyz_i=None):
            return crop_rois(img_i, lab_i, xyz_i, max_instances=T, crop_size=S,
                             padding=t.crop_padding)

        if has_depth:
            crops = jax.vmap(per_image_crops)(image, labels, xyz)
        else:
            crops = jax.vmap(per_image_crops)(image, labels)

        # one batched forward over all B*T crops
        rgb = crops.rgb.reshape(B * T, S, S, 3)
        dep = crops.xyz.reshape(B * T, S, S, 3) if crops.xyz is not None else None
        crop_out = self.model_crop.apply(variables_crop, rgb, dep, light=True,
                                         present=crops.present.reshape(B * T))

        tc = self.cfg_crop.test
        crop_light = "pred_masks" not in crop_out
        if crop_light:
            crop_per = {"pred_logits": crop_out["pred_logits"],
                        "mask_embed": crop_out["mask_embed"],
                        "mask_features": crop_out["mask_features"]}
        else:
            crop_per = {"pred_logits": crop_out["pred_logits"],
                        "pred_masks": crop_out["pred_masks"]}

        def per_crop_labels(o):
            inst = instance_inference(o["pred_logits"], o.get("pred_masks"),
                                      num_classes=self.cfg_crop.decoder.num_classes,
                                      topk=tc.max_instances,
                                      mask_embed=o.get("mask_embed"),
                                      mask_features=o.get("mask_features"),
                                      out_hw=(S, S))
            inst = get_confident_instances(inst, topk=tc.topk,
                                           score=tc.confident_score,
                                           num_classes=self.cfg_crop.decoder.num_classes,
                                           low_threshold=tc.low_threshold)
            return combine_masks(inst)

        labels_crop = jax.vmap(per_crop_labels)(crop_per)
        labels_crop = labels_crop.reshape(B, T, S, S)

        def per_image_refine(lab_i, crops_i, labels_crop_i):
            return match_label_crop(
                labels_crop_i, crops_i.mask, crops_i.rois,
                crops_i.xyz[..., 2] if crops_i.xyz is not None else None,
                crops_i.present, (H, W),
                overlap_threshold=t.overlap_match_threshold)

        refined = jax.vmap(per_image_refine)(labels, crops, labels_crop)
        # no surviving crops -> keep stage-1 labels (ref: test_utils.py:324-330)
        any_crop = jnp.any(crops.present, axis=-1)
        refined = jnp.where(any_crop[:, None, None], refined, labels)
        return labels, refined
