"""Two-stage (whole image + zoom-in crops) MSMFormer inference.

Mirrors test_sample_crop / test_sample_crop_nolabel (ref: lib/fcn/test_utils.py:
245-421) with no per-RoI host loop: stage 1 predicts instances, the RoI crops
are extracted on device, the crop network runs batched over compacted crop
slots, and the refined labels are pasted back.

Two execution modes (identical outputs, CPU-tested bitwise-equal):
- bucketed (default): two jit graphs. Graph 1 = stage 1 + crop extraction +
  present-first compaction; ONE scalar (the crop count) syncs to host; graph 2
  (compiled per budget bucket) runs the crop network on just the present slots.
  Absent RoI slots never reach the crop backbone.
- single-graph (bucketed=False / refine=False): everything in one jit, the
  crop network runs over all B*T slots (used by tests and as the conservative
  fallback).

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
from ..models.meta_arch import build_model
from .postprocess import (
    instance_inference, get_confident_instances, combine_masks, filter_labels_depth,
)
from .refine import (
    crop_rois, match_label_crop, crop_budget_buckets, pick_crop_budget,
    compact_present, gather_compacted, scatter_crop_labels,
)


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
                 dtype=jnp.float32, bucketed: bool = True):
        self.cfg = cfg
        self.cfg_crop = cfg_crop or cfg
        # the meta-arch factory honors use_other_backbone / backbone.kind /
        # pixel_decoder.name (ref: lib/fcn/test_demo.py:48-72 builds either
        # arch from config), so the predictor drives the UCN, ResNet50 and
        # Swin families alike
        self.model = build_model(cfg, dtype=dtype)
        self.model_crop = build_model(self.cfg_crop, dtype=dtype)
        self.bucketed = bucketed
        self._fn = None
        self._s1_fn = None
        self._s2_fn = None

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

    def _buckets(self, BT: int):
        return crop_budget_buckets(BT)

    def __call__(self, variables, variables_crop, image, xyz=None, osd: bool = False,
                 refine: bool = True):
        if not self.bucketed or not refine:
            if self._fn is None:
                self._fn = jax.jit(partial(self._forward),
                                   static_argnames=("osd", "refine"))
            return self._fn(variables, variables_crop, image, xyz, osd=osd,
                            refine=refine)
        # Bucketed two-graph path: stage 1 (+ crop extraction + compaction) runs,
        # ONE scalar (the crop count) syncs to host, and the crop network runs at
        # the smallest compiled budget that fits - absent RoI slots never reach
        # the crop backbone (the fused decoder kernel already skipped them; the
        # XLA convs could not).
        self._ensure_bucketed_jits()
        s1_out = self._s1_fn(variables, image, xyz, osd=osd)
        return self._finish_bucketed(variables_crop, s1_out)

    def _ensure_bucketed_jits(self):
        if self._s1_fn is None:
            self._s1_fn = jax.jit(self._stage1_and_crops, static_argnames=("osd",))
            # donate the crop tensors (the largest stage-2 input, ~100s of MB
            # at B=8): graph 2 reuses their HBM for its own intermediates,
            # lowering peak pressure when the stream keeps 2 batches in
            # flight. Callers never touch crops after refinement; labels ARE
            # returned to the user, so they are not donated.
            self._s2_fn = jax.jit(self._stage2_refine, static_argnames=("P",),
                                  donate_argnums=(2,))

    def _finish_bucketed(self, variables_crop, s1_out):
        """Sync the crop count (the one host round-trip), pick the budget
        bucket, run graph 2."""
        labels, crops, perm, count = s1_out
        n = int(count)
        if n == 0:
            return labels, labels
        P = pick_crop_budget(perm.shape[0], n)
        refined = self._s2_fn(variables_crop, labels, crops, perm, P=P)
        return labels, refined

    def stream(self, variables, variables_crop, batches, osd: bool = False,
               depth: int = 2):
        """Software-pipelined batched inference over an iterable of
        (image, xyz) batches: stage 1 of the next `depth` batches is enqueued
        BEFORE batch i's crop-count sync, so the per-sync host round-trip
        overlaps ~depth batches of buffered device work (the recipe bench.py
        measures with; ref workload lib/fcn/test_utils.py:339-421 runs one
        synchronous image at a time). depth=1 suffices on a local chip;
        depth=2 keeps the device saturated when the host link is slow/jittery
        (the dev tunnel's sync latency varies 28-45+ ms run to run).
        Yields (labels, refined) per input batch, in order, `depth` behind."""
        from collections import deque

        self._ensure_bucketed_jits()
        pending = deque()
        for (image, xyz) in batches:
            pending.append(self._s1_fn(variables, image, xyz, osd=osd))
            if len(pending) > depth:
                yield self._finish_bucketed(variables_crop, pending.popleft())
        while pending:
            yield self._finish_bucketed(variables_crop, pending.popleft())

    def jit_sharded(self, mesh, osd: bool = False, refine: bool = True):
        """Data-parallel serving step over a device mesh: the batch dimension is
        sharded on the mesh's 'dp' axis, parameters replicated (the reference's
        multi-GPU eval parallelism, detectron2 launch + DDP). Uses the
        single-graph path - per-device crop work stays device-local, so no
        cross-chip resharding of the RoI tensors is ever needed.

        Returns fn(variables, variables_crop, image, xyz) -> (labels, refined);
        batch size must be divisible by the mesh size."""
        from ..parallel.mesh import batch_sharding, replicated

        bs = batch_sharding(mesh)
        rep = replicated(mesh)
        fn = partial(self._forward, osd=osd, refine=refine)
        return jax.jit(fn, in_shardings=(rep, rep, bs, bs),
                       out_shardings=(bs, bs))

    def jit_sharded_sp(self, mesh, osd: bool = False, refine: bool = True):
        """Spatially-sharded serving step: the image HEIGHT axis is sharded on
        the mesh's 'sp' axis and parameters are replicated, so N chips cut the
        latency of ONE image - the orthogonal regime to `jit_sharded`'s
        batch-throughput scaling. GSPMD does the heavy lifting the TPU way:
        convolutions get automatic halo exchanges, the decoder's key/value
        contractions and the per-label reductions in the postprocess become
        psums over 'sp' (no NCCL-style hand-written communication; the
        reference has no single-image parallelism at all). Outputs are returned
        with the same height sharding.

        Batch stays unsharded (use B=1 for pure latency scaling, or a 2-D
        dp x sp mesh via jit_sharded for mixed regimes)."""
        from ..parallel.mesh import replicated, spatial_sharding

        sp = spatial_sharding(mesh)
        rep = replicated(mesh)
        fn = partial(self._forward, osd=osd, refine=refine)
        return jax.jit(fn, in_shardings=(rep, rep, sp, sp),
                       out_shardings=(sp, sp))

    def _stage1_labels_batch(self, variables, image, xyz, osd: bool):
        """Stage-1 network + per-image postprocess -> [B, H, W] labels."""
        cfg = self.cfg
        H, W = image.shape[1], image.shape[2]
        outputs = self.model.apply(variables, image, xyz, light=True)
        light = "pred_masks" not in outputs
        if light:
            per_img = {"pred_logits": outputs["pred_logits"],
                       "mask_embed": outputs["mask_embed"],
                       "mask_features": outputs["mask_features"]}
        else:
            per_img = {"pred_logits": outputs["pred_logits"],
                       "pred_masks": outputs["pred_masks"]}
        if xyz is not None:
            labels, _ = jax.vmap(
                lambda o, d: stage1_labels(cfg, o, d, (H, W), osd=osd))(per_img, xyz)
        else:
            labels, _ = jax.vmap(
                lambda o: stage1_labels(cfg, o, None, (H, W), osd=osd))(per_img)
        return labels

    def _extract_crops(self, image, labels, xyz):
        t = self.cfg.test
        T, S = t.max_instances, t.crop_size

        def per_image_crops(img_i, lab_i, xyz_i=None):
            return crop_rois(img_i, lab_i, xyz_i, max_instances=T, crop_size=S,
                             padding=t.crop_padding)

        if xyz is not None:
            return jax.vmap(per_image_crops)(image, labels, xyz)
        return jax.vmap(per_image_crops)(image, labels)

    def _crop_labels(self, variables_crop, rgb, dep, present):
        """Crop-network forward + per-crop label images for [P, S, S] crops."""
        S = self.cfg.test.crop_size
        tc = self.cfg_crop.test
        crop_out = self.model_crop.apply(variables_crop, rgb, dep, light=True,
                                         present=present)
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

        return jax.vmap(per_crop_labels)(crop_per)

    def _paste_back(self, labels, crops, labels_crop):
        """match_label_crop over the batch + the no-crop fallback."""
        t = self.cfg.test
        H, W = labels.shape[1], labels.shape[2]

        def per_image_refine(lab_i, crops_i, labels_crop_i):
            return match_label_crop(
                labels_crop_i, crops_i.mask, crops_i.rois,
                crops_i.xyz[..., 2] if crops_i.xyz is not None else None,
                crops_i.present, (H, W),
                overlap_threshold=t.overlap_match_threshold)

        refined = jax.vmap(per_image_refine)(labels, crops, labels_crop)
        # no surviving crops -> keep stage-1 labels (ref: test_utils.py:324-330)
        any_crop = jnp.any(crops.present, axis=-1)
        return jnp.where(any_crop[:, None, None], refined, labels)

    def _stage1_and_crops(self, variables, image, xyz, osd: bool):
        """Graph 1 of the bucketed path: labels + crops + compaction order.

        perm: [B*T] int32 putting present crop slots first (stable), so
        perm[:P] covers every present crop whenever P >= count.
        """
        labels = self._stage1_labels_batch(variables, image, xyz, osd)
        crops = self._extract_crops(image, labels, xyz)
        perm, count = compact_present(crops.present)
        return labels, crops, perm, count

    def _stage2_refine(self, variables_crop, labels, crops, perm, P: int):
        """Graph 2 (compiled per budget P): crop network on the P compacted
        slots, per-crop labels scattered back to the [B, T] slot layout, then
        the paste-back. Identical outputs to the single-graph path: per-crop
        compute is independent, and absent slots' label images are ignored by
        match_label_crop's present gating."""
        B, T = crops.present.shape
        idx = perm[:P]
        rgb, dep, present = gather_compacted(crops, idx)
        labels_crop_p = self._crop_labels(variables_crop, rgb, dep, present)
        labels_crop = scatter_crop_labels(labels_crop_p, idx, B, T)
        return self._paste_back(labels, crops, labels_crop)

    def _forward(self, variables, variables_crop, image, xyz, osd: bool,
                 refine: bool):
        """Single-graph path: image [B, H, W, 3]; xyz [B, H, W, 3] or None
        (already padded /32). The crop network runs over ALL B*T slots."""
        B = image.shape[0]
        T, S = self.cfg.test.max_instances, self.cfg.test.crop_size

        labels = self._stage1_labels_batch(variables, image, xyz, osd)
        if not refine:
            return labels, labels

        # ---- stage 2: batched crops ----
        crops = self._extract_crops(image, labels, xyz)
        rgb = crops.rgb.reshape(B * T, S, S, 3)
        dep = crops.xyz.reshape(B * T, S, S, 3) if crops.xyz is not None else None
        labels_crop = self._crop_labels(variables_crop, rgb, dep,
                                        crops.present.reshape(B * T))
        labels_crop = labels_crop.reshape(B, T, S, S)
        refined = self._paste_back(labels, crops, labels_crop)
        return labels, refined
