"""UCN legacy inference: embedding features -> vMF mean-shift clustering ->
zoom-in refinement. One jit graph.

Mirrors test_sample / test_segnet (ref: lib/fcn/test_dataset.py:232-321):
  features = SEGNET(image, xyz)                      [stride-8 FCN, 64-d unit vecs]
  labels   = mean-shift clustering (kappa=20, 100 seeds, 10 iters)
  labels   = filter_labels_depth(0.8 single-sample / 0.5 ocid / 0.8 osd)
  crops    = crop_rois(image, labels, xyz)           [batched - the reference's UCN
                                                      path batches too, :319]
  crop features -> clustering -> match_label_crop paste-back

UCN cluster labels use 0 = largest cluster (background) and objects 1..K-1; the
crop/refine machinery indexes instance slots by label value v = t + 2, so stage-1
labels are shifted by +1 before refinement (background stays 0) - equivalent to
the MSMFormer combine_masks convention.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.segnet import build_segnet
from ..ops.mean_shift import mean_shift_smart_init
from .postprocess import filter_labels_depth
from .refine import crop_rois, match_label_crop


class UCNPredictor:
    """Two-stage UCN predictor (whole network + crop network)."""

    def __init__(self, cfg: Config, cfg_crop: Optional[Config] = None,
                 dtype=jnp.float32):
        self.cfg = cfg
        self.cfg_crop = cfg_crop or cfg
        self.network = build_segnet(cfg, dtype=dtype)
        self.network_crop = build_segnet(self.cfg_crop, dtype=dtype)
        self._fn = None

    def init(self, rng, image_shape, crop_size: int = 224):
        H, W = image_shape
        img = jnp.zeros((1, H, W, 3))
        xyz = jnp.zeros((1, H, W, 3)) if self.cfg.use_depth else None
        v1 = self.network.init(rng, img, xyz)
        imgc = jnp.zeros((1, crop_size, crop_size, 3))
        xyzc = jnp.zeros((1, crop_size, crop_size, 3)) if self.cfg.use_depth else None
        v2 = self.network_crop.init(rng, imgc, xyzc)
        return v1, v2

    def __call__(self, variables, variables_crop, image, xyz=None,
                 depth_threshold: float = 0.8, refine: bool = True,
                 first_seed_idx: int = 0):
        if self._fn is None:
            self._fn = jax.jit(self._forward,
                               static_argnames=("refine", "depth_threshold"))
        return self._fn(variables, variables_crop, image, xyz,
                        depth_threshold=depth_threshold, refine=refine,
                        first_seed_idx=first_seed_idx)

    def _forward(self, variables, variables_crop, image, xyz,
                 depth_threshold: float, refine: bool, first_seed_idx):
        cfg = self.cfg
        ms = cfg.mean_shift
        t = cfg.test
        B, H, W = image.shape[:3]
        T, S = t.max_instances, t.crop_size

        features = self.network.apply(variables, image, xyz)       # [B, H, W, C]

        def cluster_one(feat):
            X = feat.reshape(-1, feat.shape[-1]).astype(jnp.float32)
            labels, _ = mean_shift_smart_init(
                X, kappa=ms.kappa, num_seeds=ms.num_seeds, max_iters=ms.max_iters,
                epsilon=ms.epsilon, first_seed_idx=first_seed_idx)
            return labels.reshape(feat.shape[0], feat.shape[1])

        labels = jax.vmap(cluster_one)(features)                    # [B, H, W]

        if xyz is not None:
            labels = jax.vmap(lambda l, d: filter_labels_depth(
                l, d[..., 2], depth_threshold,
                max_label=ms.num_seeds))(labels, xyz)

        if not refine:
            return labels, labels

        # shift labels so object k (1..T) sits in crop slot value k+1 == t+2
        shifted = jnp.where(labels > 0, labels + 1, 0)

        def per_image_crops(img_i, lab_i, xyz_i=None):
            return crop_rois(img_i, lab_i, xyz_i, max_instances=T, crop_size=S,
                             padding=t.crop_padding)

        if xyz is not None:
            crops = jax.vmap(per_image_crops)(image, shifted, xyz)
        else:
            crops = jax.vmap(per_image_crops)(image, shifted)

        rgb = crops.rgb.reshape(B * T, S, S, 3)
        dep = crops.xyz.reshape(B * T, S, S, 3) if crops.xyz is not None else None
        feat_crop = self.network_crop.apply(variables_crop, rgb, dep)

        def cluster_crop(feat):
            X = feat.reshape(-1, feat.shape[-1]).astype(jnp.float32)
            lab, _ = mean_shift_smart_init(
                X, kappa=ms.kappa, num_seeds=ms.num_seeds, max_iters=ms.max_iters,
                epsilon=ms.epsilon, first_seed_idx=first_seed_idx)
            return lab.reshape(S, S)

        labels_crop = jax.vmap(cluster_crop)(feat_crop).reshape(B, T, S, S)
        # UCN crop labels: 0 = background cluster, objects 1..; match_label_crop's
        # candidate values span 0..T+1, so shift crop labels by +1 too (background
        # stays 0, giving the same keep/paste semantics as the reference, which
        # iterates ALL unique crop labels including 0)
        labels_crop = jnp.where(labels_crop > 0, labels_crop + 1, 0)

        def per_image_refine(crops_i, labels_crop_i):
            return match_label_crop(
                labels_crop_i, crops_i.mask, crops_i.rois,
                crops_i.xyz[..., 2] if crops_i.xyz is not None else None,
                crops_i.present, (H, W),
                overlap_threshold=t.overlap_match_threshold)

        refined = jax.vmap(per_image_refine)(crops, labels_crop)
        any_crop = jnp.any(crops.present, axis=-1)
        refined = jnp.where(any_crop[:, None, None], refined, labels)
        return labels, refined
