"""COMPOSED end-to-end parity: the FULL two-stage pipeline against a torch oracle
on shared random weights.

Per-module parity tests can all pass while a composition bug (wrong normalize
order, mask threshold, label convention) breaks the end result. This test builds
a torch oracle of the whole PretrainedMeanShiftMaskFormer forward
(ref: MSMFormer/meanshiftformer/pretrained_meanshiftformer_model.py:244-497:
UCN two-tower backbone -> double L2-normalize -> SimpleBasePixelDecoder 3x3
mask-features conv -> mean-shift decoder -> instance_inference) plus the
test_sample_crop host pipeline (ref: lib/fcn/test_utils.py:245-421:
get_confident_instances -> combine_masks -> filter_labels_depth -> crop_rois ->
crop-network forward per crop -> match_label_crop), exports the weights with
detectron2-style keys through the converter, and asserts the final stage-1 AND
refined label images match EXACTLY (including the contiguous 2..N+1 renumbering,
test_utils.py:107-109).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

from unseenobjectswithmeanshift_tpu.config import get_config
from unseenobjectswithmeanshift_tpu.pipeline.two_stage import TwoStagePredictor
from unseenobjectswithmeanshift_tpu.utils.checkpoint import convert_msmformer_checkpoint

from test_resnet_segnet import TorchResnetFCN
from test_decoder_parity import TorchDecoderOracle
from test_postprocess import (
    np_instance_inference, np_combine_masks, np_filter_labels_depth,
    torch_crop_rois,
)
from test_postprocess import torch_match_label_crop


# ---------------------------------------------------------------------------
# torch meta-arch oracle (keys match the published checkpoint layout)
# ---------------------------------------------------------------------------

class TorchMetaArch(tnn.Module):
    """PretrainedMeanShiftMaskFormer semantics end-to-end (eval mode)."""

    def __init__(self, E, nheads, Q, layers, mask_dim, ffn, num_classes,
                 num_units=64):
        super().__init__()
        bb = tnn.Module()
        fcn = tnn.Module()
        fcn.resnet34_8s = TorchResnetFCN((3, 4, 6, 3), num_units, 8)
        fcn_depth = tnn.Module()
        fcn_depth.resnet34_8s = TorchResnetFCN((3, 4, 6, 3), num_units, 8)
        bb.fcn, bb.fcn_depth = fcn, fcn_depth
        self.pretrained_backbone = bb
        head = tnn.Module()
        pixel_decoder = tnn.Module()
        pixel_decoder.mask_features = tnn.Conv2d(num_units, mask_dim, 3, padding=1)
        head.pixel_decoder = pixel_decoder
        head.predictor = TorchDecoderOracle(E, nheads, Q, layers, mask_dim,
                                            num_units, ffn, num_classes)
        self.sem_seg_head = head

    def forward(self, img_chw, xyz_chw):
        # SEG.forward: two towers, 'add' fusion, L2-normalize (SEG.py:105-114)
        f = self.pretrained_backbone.fcn.resnet34_8s(img_chw)
        fd = self.pretrained_backbone.fcn_depth.resnet34_8s(xyz_chw)
        feat = TF.normalize(f + fd, p=2, dim=1)
        # meta-arch re-normalizes (pretrained_meanshiftformer_model.py:298)
        feat = TF.normalize(feat, p=2, dim=1)
        mask_features = self.sem_seg_head.pixel_decoder.mask_features(feat)
        out_cls, out_masks = self.sem_seg_head.predictor(feat, mask_features)
        return out_cls[-1], out_masks[-1]


def torch_stage1_labels(logits, masks, num_classes, topk, low_threshold, z, thr):
    """instance_inference -> confident filter -> combine -> depth filter
    (ref: pretrained_meanshiftformer_model.py:461-497 + test_utils.py:35-112 +
    test_dataset.py:183-198)."""
    pred, scores, labels = np_instance_inference(logits, masks, num_classes, topk)
    valid = (labels == 1) & (scores > low_threshold)
    label = np_combine_masks(pred, valid)
    return np_filter_labels_depth(label, z, thr)


def test_full_two_stage_matches_composed_torch_oracle(rng):
    H = W = 64
    # E != num_units(64): the reference only applies input_proj when
    # in_channels != hidden_dim (meanshiftformer_transformer_decoder.py:498-502),
    # and the oracle decoder always projects - keep the projected configuration,
    # which is also the flagship one (64 -> 256).
    E, NH, Q, L, MD, FF, NC = 96, 4, 16, 3, 48, 96, 2
    T, S = 5, 32
    LOW = 0.05   # random weights give near-uniform class scores; keep filter live

    cfg = get_config("tabletop_pretrained")
    cfg.decoder.hidden_dim = E
    cfg.decoder.nheads = NH
    cfg.decoder.num_queries = Q
    cfg.decoder.dec_layers = L
    cfg.decoder.dim_feedforward = FF
    cfg.decoder.mask_dim = MD
    cfg.pixel_decoder.mask_dim = MD
    cfg.test.max_instances = T
    cfg.test.crop_size = S
    cfg.test.low_threshold = LOW
    import copy
    cfg_crop = copy.deepcopy(cfg)

    torch.manual_seed(10)  # chosen so the oracle yields several instances
    # of varied size (labels 2, 5, 6 with ~60/~40/~3900 px)
    with torch.no_grad():
        oracle = TorchMetaArch(E, NH, Q, L, MD, FF, NC).eval()
        oracle_crop = TorchMetaArch(E, NH, Q, L, MD, FF, NC).eval()
        # With random weights the mask logits hover around 0 and the decoder's
        # <0-threshold attention-mask feedback amplifies fp noise into discrete
        # divergence (a trained model has decisive masks). Scale the mask head
        # so binarizations are far from the threshold and the comparison is
        # deterministic.
        for m in (oracle, oracle_crop):
            lin = m.sem_seg_head.predictor.mask_embed.layers[2]
            lin.weight *= 30.0
            lin.bias *= 30.0

    img = rng.rand(H, W, 3).astype(np.float32) - 0.4
    xyz = (rng.rand(H, W, 3) * 1.5).astype(np.float32)
    xyz[..., 2] = np.where(rng.rand(H, W) < 0.15, 0.0, xyz[..., 2])  # depth holes

    # ---- torch oracle pipeline -------------------------------------------
    t_img = torch.from_numpy(img.transpose(2, 0, 1))[None]
    t_xyz = torch.from_numpy(xyz.transpose(2, 0, 1))[None]
    with torch.no_grad():
        logits, masks = oracle(t_img, t_xyz)
    thr = cfg.test.depth_filter_threshold_ocid
    ref_label = torch_stage1_labels(logits[0].numpy(), masks[0].numpy(), NC, T,
                                    LOW, xyz[..., 2], thr)

    # stage 2 (ref: test_utils.py test_sample_crop: per-crop forward ->
    # confident -> combine; then match_label_crop)
    ref_crops = torch_crop_rois(img, ref_label, xyz, crop_size=S)
    labels_crop = np.zeros((T, S, S), np.int32)
    stage1_crop = np.zeros((T, S, S), np.float32)
    rois = np.zeros((T, 4), np.int32)
    depth_crop = np.zeros((T, S, S), np.float32)
    present = np.zeros(T, bool)
    for mid, rgb_c, m_c, d_c, roi in ref_crops:
        t = mid - 2
        present[t] = True
        stage1_crop[t] = m_c
        rois[t] = roi
        depth_crop[t] = d_c[2]
        with torch.no_grad():
            lc, mc = oracle_crop(torch.from_numpy(rgb_c)[None],
                                 torch.from_numpy(d_c)[None])
        pred, scores, labels = np_instance_inference(lc[0].numpy(), mc[0].numpy(),
                                                     NC, T)
        valid = (labels == 1) & (scores > LOW)
        labels_crop[t] = np_combine_masks(pred, valid)
    if present.any():
        ref_refined = torch_match_label_crop(labels_crop, stage1_crop, rois,
                                             depth_crop, present, (H, W))
    else:
        ref_refined = ref_label

    # ---- converted JAX pipeline ------------------------------------------
    sd = oracle.state_dict()
    variables = convert_msmformer_checkpoint(sd)
    variables_crop = convert_msmformer_checkpoint(oracle_crop.state_dict())

    pred = TwoStagePredictor(cfg, cfg_crop)
    jl, jr = pred._forward(
        jax.tree.map(jnp.asarray, variables),
        jax.tree.map(jnp.asarray, variables_crop),
        jnp.asarray(img[None]), jnp.asarray(xyz[None]), osd=False, refine=True)
    jax_label = np.asarray(jl[0])
    jax_refined = np.asarray(jr[0])

    # sanity: the test must exercise real instances, not an all-zero image
    assert ref_label.max() >= 2, "oracle produced no confident instances"

    np.testing.assert_array_equal(jax_label, ref_label)
    np.testing.assert_array_equal(jax_refined, ref_refined)

    # the production (bucketed-compaction) path must match the oracle too
    bl, br = pred(jax.tree.map(jnp.asarray, variables),
                  jax.tree.map(jnp.asarray, variables_crop),
                  jnp.asarray(img[None]), jnp.asarray(xyz[None]))
    np.testing.assert_array_equal(np.asarray(bl[0]), ref_label)
    np.testing.assert_array_equal(np.asarray(br[0]), ref_refined)
