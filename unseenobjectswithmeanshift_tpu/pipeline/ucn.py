"""UCN legacy inference: embedding features -> vMF mean-shift clustering ->
zoom-in refinement, on-device with bucketed crop compaction (see UCNPredictor).

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
from ..ops.pallas_mean_shift import (mean_shift_smart_init_fps,
                                     mean_shift_smart_init_pallas)
from .postprocess import filter_labels_depth, renumber_labels_by_size
from .refine import (
    crop_rois, match_label_crop, crop_budget_buckets, pick_crop_budget,
    compact_present, gather_compacted, scatter_crop_labels,
)


# VMEM budget for the resident [d, N] fp32 embedding matrix (v5e: 128 MB VMEM,
# minus distance scratch + temporaries)
_PALLAS_MS_VMEM_BYTES = 90 * 1024 * 1024


def _cluster_batched(X, ms, first_seed_idx):
    """[B, N, C] -> [B, N] labels. Routes the seeding phase to the
    VMEM-resident FPS kernel (ops/pallas_mean_shift.py, ~7.5x on the chip,
    scripts/profile_fps_seeding.py) when on TPU and the matrix fits; the
    full legacy kernel stays behind use_pallas (measured rejection). The
    kernel's fp32 MXU matvec rounds differently from XLA's, so on REAL
    hardware the discrete seed chain can diverge on fp32 near-ties - the
    final labels are clustering-equivalent (same modes after hill climbing
    + connected components; agreement measured in scripts/profile_ucn.py).
    Interpret-mode (CPU tests) matches the XLA scans exactly."""
    B, N, C = X.shape
    on_tpu = jax.default_backend() == "tpu"
    fits = N * C * 4 <= _PALLAS_MS_VMEM_BYTES
    if getattr(ms, "use_pallas", False) and on_tpu and fits:
        labels, _ = mean_shift_smart_init_pallas(
            X, kappa=ms.kappa, num_seeds=ms.num_seeds, max_iters=ms.max_iters,
            epsilon=ms.epsilon, first_seed_idx=first_seed_idx)
        return labels
    if getattr(ms, "use_pallas_seeding", True) and on_tpu and fits:
        labels, _ = mean_shift_smart_init_fps(
            X, kappa=ms.kappa, num_seeds=ms.num_seeds, max_iters=ms.max_iters,
            epsilon=ms.epsilon, first_seed_idx=first_seed_idx)
        return labels

    def one(x):
        lab, _ = mean_shift_smart_init(
            x, kappa=ms.kappa, num_seeds=ms.num_seeds, max_iters=ms.max_iters,
            epsilon=ms.epsilon, first_seed_idx=first_seed_idx)
        return lab

    return jax.vmap(one)(X)


class UCNPredictor:
    """Two-stage UCN predictor (whole network + crop network).

    Like TwoStagePredictor, the default execution is bucketed: present crop
    slots are compacted to the front, one scalar (the crop count) syncs to
    host, and the crop network + per-crop mean-shift clustering run at the
    smallest compiled budget bucket that fits (empty slots are skipped
    entirely). bucketed=False keeps everything in one jit graph over all
    B*T slots; outputs are identical."""

    def __init__(self, cfg: Config, cfg_crop: Optional[Config] = None,
                 dtype=jnp.float32, bucketed: bool = True):
        self.cfg = cfg
        self.cfg_crop = cfg_crop or cfg
        self.network = build_segnet(cfg, dtype=dtype)
        self.network_crop = build_segnet(self.cfg_crop, dtype=dtype)
        self.bucketed = bucketed
        self._fn = None
        self._s1_fn = None
        self._s2_fn = None

    def init(self, rng, image_shape, crop_size: int = 224):
        H, W = image_shape
        img = jnp.zeros((1, H, W, 3))
        xyz = jnp.zeros((1, H, W, 3)) if self.cfg.use_depth else None
        v1 = self.network.init(rng, img, xyz)
        imgc = jnp.zeros((1, crop_size, crop_size, 3))
        xyzc = jnp.zeros((1, crop_size, crop_size, 3)) if self.cfg.use_depth else None
        v2 = self.network_crop.init(rng, imgc, xyzc)
        return v1, v2

    def _buckets(self, BT: int):
        return crop_budget_buckets(BT)

    def __call__(self, variables, variables_crop, image, xyz=None,
                 depth_threshold: float = 0.8, refine: bool = True,
                 first_seed_idx: int = 0):
        if not self.bucketed or not refine:
            if self._fn is None:
                self._fn = jax.jit(self._forward,
                                   static_argnames=("refine", "depth_threshold"))
            return self._fn(variables, variables_crop, image, xyz,
                            depth_threshold=depth_threshold, refine=refine,
                            first_seed_idx=first_seed_idx)
        self._ensure_bucketed_jits()
        s1_out = self._s1_fn(variables, image, xyz,
                             depth_threshold=depth_threshold,
                             first_seed_idx=first_seed_idx)
        return self._finish_bucketed(variables_crop, s1_out, first_seed_idx)

    def _ensure_bucketed_jits(self):
        if self._s1_fn is None:
            self._s1_fn = jax.jit(self._stage1_and_crops,
                                  static_argnames=("depth_threshold",))
            self._s2_fn = jax.jit(self._stage2_refine, static_argnames=("P",))

    def jit_sharded(self, mesh, depth_threshold: float = 0.8,
                    refine: bool = True):
        """Data-parallel UCN serving over a 'dp' mesh: batch sharded, params
        replicated, single-graph path (crop work stays device-local) - same
        contract as TwoStagePredictor.jit_sharded."""
        from functools import partial

        from ..parallel.mesh import batch_sharding, replicated

        bs = batch_sharding(mesh)
        rep = replicated(mesh)
        fn = partial(self._forward, depth_threshold=depth_threshold,
                     refine=refine, first_seed_idx=0)
        return jax.jit(fn, in_shardings=(rep, rep, bs, bs),
                       out_shardings=(bs, bs))

    def _finish_bucketed(self, variables_crop, s1_out, first_seed_idx=0):
        import numpy as np

        labels, crops, perm, counts = s1_out
        counts = np.asarray(counts)            # ONE scalar-pair sync
        n, dropped = int(counts[0]), int(counts[1])
        if dropped > 0:
            print(f"WARNING: {dropped} cluster(s) beyond the "
                  f"{self.cfg.test.max_instances} crop slots were not refined "
                  "(smallest by pixel count; raise test.max_instances to "
                  "refine them)")
        if n == 0:
            return labels, labels
        P = pick_crop_budget(perm.shape[0], n)
        refined = self._s2_fn(variables_crop, labels, crops, perm,
                              first_seed_idx, P=P)
        return labels, refined

    def stream(self, variables, variables_crop, batches,
               depth_threshold: float = 0.8, first_seed_idx: int = 0,
               depth: int = 2):
        """Software-pipelined batched inference over (image, xyz) batches -
        same contract as TwoStagePredictor.stream: `depth` batches of stage-1
        work are enqueued BEFORE each crop-count sync so the host link's
        per-sync round-trip overlaps buffered device work."""
        from collections import deque

        self._ensure_bucketed_jits()
        pending = deque()
        for (image, xyz) in batches:
            pending.append(self._s1_fn(variables, image, xyz,
                                       depth_threshold=depth_threshold,
                                       first_seed_idx=first_seed_idx))
            if len(pending) > depth:
                yield self._finish_bucketed(variables_crop, pending.popleft(),
                                            first_seed_idx)
        while pending:
            yield self._finish_bucketed(variables_crop, pending.popleft(),
                                        first_seed_idx)

    def _stage1_and_crops(self, variables, image, xyz, depth_threshold: float,
                          first_seed_idx):
        labels, n_clusters = self._stage1_labels(variables, image, xyz,
                                                 depth_threshold, first_seed_idx)
        crops = self._extract_crops(image, labels, xyz)
        perm, count = compact_present(crops.present)
        # pack (crop count, clusters dropped from refinement) into one scalar
        # transfer: clusters ranked beyond max_instances got no crop slot
        T = self.cfg.test.max_instances
        dropped = jnp.sum(jnp.maximum(n_clusters - T, 0))
        return labels, crops, perm, jnp.stack([count, dropped])

    def _stage2_refine(self, variables_crop, labels, crops, perm,
                       first_seed_idx, P: int):
        B, T = crops.present.shape
        idx = perm[:P]
        rgb, dep, _present = gather_compacted(crops, idx)
        labels_crop_p = self._crop_labels(variables_crop, rgb, dep,
                                          first_seed_idx)
        labels_crop = scatter_crop_labels(labels_crop_p, idx, B, T)
        return self._paste_back(labels, crops, labels_crop)

    def _stage1_labels(self, variables, image, xyz, depth_threshold: float,
                       first_seed_idx):
        """Embedding features -> clustering -> depth filter -> SHIFTED labels
        (object k in crop slot value k+1 == t+2)."""
        ms = self.cfg.mean_shift
        features = self.network.apply(variables, image, xyz)       # [B, H, W, C]

        B, Hh, Ww, C = features.shape
        X = features.reshape(B, Hh * Ww, C).astype(jnp.float32)
        labels = _cluster_batched(X, ms, first_seed_idx).reshape(B, Hh, Ww)

        if xyz is not None:
            labels = jax.vmap(lambda l, d: filter_labels_depth(
                l, d[..., 2], depth_threshold,
                max_label=ms.num_seeds))(labels, xyz)
        # size-ordered renumbering: the largest clusters take the refinement
        # slots; clusters ranked beyond max_instances keep labels > T (they
        # survive the stage-1 output and are counted as dropped from stage 2 -
        # see the bucketed path's dropped-cluster warning)
        labels, n_clusters = jax.vmap(
            lambda l: renumber_labels_by_size(l, ms.num_seeds))(labels)
        return labels, n_clusters

    def _extract_crops(self, image, labels, xyz):
        t = self.cfg.test
        T, S = t.max_instances, t.crop_size
        # shift labels so object k (1..T) sits in crop slot value k+1 == t+2
        shifted = jnp.where(labels > 0, labels + 1, 0)

        def per_image_crops(img_i, lab_i, xyz_i=None):
            return crop_rois(img_i, lab_i, xyz_i, max_instances=T, crop_size=S,
                             padding=t.crop_padding)

        if xyz is not None:
            return jax.vmap(per_image_crops)(image, shifted, xyz)
        return jax.vmap(per_image_crops)(image, shifted)

    def _crop_labels(self, variables_crop, rgb, dep, first_seed_idx):
        """Crop-network features -> per-crop clustering -> +1-shifted labels."""
        ms = self.cfg.mean_shift
        S = rgb.shape[1]
        feat_crop = self.network_crop.apply(variables_crop, rgb, dep)

        P, C = feat_crop.shape[0], feat_crop.shape[-1]
        Xc = feat_crop.reshape(P, S * S, C).astype(jnp.float32)
        labels_crop = _cluster_batched(Xc, ms, first_seed_idx).reshape(P, S, S)
        # UCN crop labels: 0 = background cluster, objects 1..; match_label_crop's
        # candidate values span 0..T+1, so shift crop labels by +1 too (background
        # stays 0, giving the same keep/paste semantics as the reference, which
        # iterates ALL unique crop labels including 0)
        return jnp.where(labels_crop > 0, labels_crop + 1, 0)

    def _paste_back(self, labels, crops, labels_crop):
        t = self.cfg.test
        H, W = labels.shape[1], labels.shape[2]

        def per_image_refine(crops_i, labels_crop_i):
            return match_label_crop(
                labels_crop_i, crops_i.mask, crops_i.rois,
                crops_i.xyz[..., 2] if crops_i.xyz is not None else None,
                crops_i.present, (H, W),
                overlap_threshold=t.overlap_match_threshold)

        refined = jax.vmap(per_image_refine)(crops, labels_crop)
        any_crop = jnp.any(crops.present, axis=-1)
        return jnp.where(any_crop[:, None, None], refined, labels)

    def _forward(self, variables, variables_crop, image, xyz,
                 depth_threshold: float, refine: bool, first_seed_idx):
        B = image.shape[0]
        T, S = self.cfg.test.max_instances, self.cfg.test.crop_size

        labels, _n_clusters = self._stage1_labels(variables, image, xyz,
                                                  depth_threshold, first_seed_idx)
        if not refine:
            return labels, labels

        crops = self._extract_crops(image, labels, xyz)
        rgb = crops.rgb.reshape(B * T, S, S, 3)
        dep = crops.xyz.reshape(B * T, S, S, 3) if crops.xyz is not None else None
        labels_crop = self._crop_labels(variables_crop, rgb, dep,
                                        first_seed_idx).reshape(B, T, S, S)
        refined = self._paste_back(labels, crops, labels_crop)
        return labels, refined
