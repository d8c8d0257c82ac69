"""MSMFormer meta-architecture: backbone -> pixel decoder -> mean-shift decoder.

Re-design of PretrainedMeanShiftMaskFormer
(ref: MSMFormer/meanshiftformer/pretrained_meanshiftformer_model.py:50-497):
- UCN SEGNET backbone produces a full-resolution 64-d embedding map (SEG.py),
  L2-normalized twice (SEG.py:112-114 and the meta-arch's own F.normalize, :298)
- SimpleBasePixelDecoder passes that map through; when MASK_DIM != 64 a single
  3x3 conv projects 64 -> mask_dim for the mask features
  (ref: modeling/pixel_decoder/fpn.py:161-290, the mask_features conv :240-247)
- the decoder predicts per-query class logits and mask logits at feature
  resolution; inference upsamples masks to the padded input size
  (pretrained_meanshiftformer_model.py:338-343 - identity here because the UCN
  features already live at input resolution).

Everything fixed-shape; the model is one flax module whose apply() is jitted by
the inference/training pipelines.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .segnet import SEGNET, l2_normalize
from .decoder import MeanShiftDecoder
from .resnet import default_precision
from ..ops.resize import resize_bilinear
from ..config import Config


class SimplePixelDecoder(nn.Module):
    """Pass-through pixel decoder (ref: fpn.py SimpleBasePixelDecoder:161-290).

    Returns (mask_features, multi_scale_features). The only learnable piece is a
    3x3 conv conv_dim -> mask_dim when mask_dim != conv_dim (fpn.py:240-252,281-284).
    """

    conv_dim: int = 64
    mask_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features):
        y = features
        if self.mask_dim != self.conv_dim:
            mask_features = nn.Conv(self.mask_dim, (3, 3), padding=1,
                                    dtype=self.dtype,
                                    precision=default_precision(self.dtype),
                                    name="mask_features")(y)
        else:
            mask_features = y
        return mask_features, [y]


class MSMFormer(nn.Module):
    """End-to-end stage network (whole-image or crop) for the UCN-backbone config."""

    cfg: Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, xyz=None, train: bool = False, light: bool = False,
                 present=None):
        """image: [B, H, W, 3] normalized BGR; xyz: [B, H, W, 3] or None.
        present: optional [B] bool - absent batch entries (empty RoI-crop
        slots) skip the decoder's attention compute; their outputs are
        discarded downstream.

        H, W must already be padded to the size divisibility (32).
        Returns dict(pred_logits [B,Q,K+1], pred_masks [B,Q,H,W], aux_outputs).
        light=True (inference pipelines): when the fused decoder path is active,
        skip materializing the [B, Q, H, W] masks and return mask_embed +
        mask_features instead - instance_inference builds masks for only the
        top-k selected queries (identical results; the mask einsum is linear
        per query).
        """
        c = self.cfg
        b = c.backbone
        backbone = SEGNET(network=b.network, input_type=b.input_type,
                          fusion_type=b.fusion_type, num_units=b.num_units,
                          normalize=b.normalize, dtype=self.dtype,
                          name="pretrained_backbone")
        features = backbone(image, xyz, train=train)
        # the meta-arch re-normalizes (pretrained_meanshiftformer_model.py:298)
        features = l2_normalize(features, axis=-1)

        if c.pixel_decoder.name != "simple":
            raise ValueError(
                f"pixel_decoder.name {c.pixel_decoder.name!r} requires the "
                "standard-backbone arch (backbone.kind resnet50|swin); the UCN "
                "arch's full-res 64-d embedding map has no res2..res5 pyramid "
                "(ref: fpn.py SimpleBasePixelDecoder:161-290)")
        pixel_decoder = SimplePixelDecoder(conv_dim=c.pixel_decoder.conv_dim,
                                           mask_dim=c.pixel_decoder.mask_dim,
                                           dtype=self.dtype, name="pixel_decoder")
        mask_features, multi_scale = pixel_decoder(features)

        d = c.decoder
        use_pallas = (d.use_pallas_attention and not train
                      and jax.default_backend() == "tpu")
        decoder = MeanShiftDecoder(
            num_classes=d.num_classes, hidden_dim=d.hidden_dim,
            num_queries=d.num_queries, nheads=d.nheads,
            dim_feedforward=d.dim_feedforward, dec_layers=d.dec_layers,
            mask_dim=d.mask_dim, in_channels=d.conv_dim,
            num_feature_levels=d.num_feature_levels,
            enforce_input_project=d.enforce_input_project,
            use_meanshift_cross_attention=d.use_meanshift_cross_attention,
            use_meanshift_self_attention=d.use_meanshift_self_attention,
            disable_attention_mask=d.disable_attention_mask,
            decoder_block_norm=d.decoder_block_norm, kappa=d.kappa,
            use_pallas=use_pallas, materialize_masks=not light,
            key_stride=1 if train else d.key_stride,
            tile_skip=(not train) and d.tile_skip,
            tile_skip_force_all=d.tile_skip_force_all,
            remat=train and c.train_remat_attention,
            dtype=self.dtype, name="predictor")
        outputs = decoder(multi_scale, mask_features, present=present)

        if light and "mask_embed" in outputs and "pred_masks" not in outputs:
            outputs["mask_features"] = mask_features
            return outputs
        if train:
            # the criterion scores masks in factored form (mask_embed x
            # mask_features); the materialized per-layer masks then survive
            # only as the detached attention masks
            outputs["mask_features"] = mask_features
            # normalized backbone embedding map for the optional metric-learning
            # embedding loss (ref: pretrained_meanshiftformer_model.py:316-325
            # F.normalize(features) before EmbeddingLoss)
            outputs["backbone_features"] = features

        if not train:
            # upsample masks to the padded input size (identity for the UCN config,
            # ref: pretrained_meanshiftformer_model.py:338-343)
            hw = (image.shape[1], image.shape[2])
            if outputs["pred_masks"].shape[-2:] != hw:
                outputs["pred_masks"] = resize_bilinear(
                    outputs["pred_masks"][..., None], hw, align_corners=False)[..., 0]
        return outputs


class StandardMaskFormer(nn.Module):
    """Standard-backbone meta-arch: {ResNet50 | Swin} -> {FPN | transformer-enc |
    MSDeformAttn} pixel decoder -> 3-level mean-shift decoder (ref:
    meanshiftformer/meanshiftformer_model.py + configs/UOAIS_ResNet50.yaml;
    backbone/pixel-decoder selection mirrors the reference registries
    META_ARCH/SEM_SEG_HEADS, meanshift_former_head.py:21-33, fpn.py:37,161,333,
    swin.py:770). COCO mean/std normalization happens inside forward like the
    reference (:240-247). Input convention: whatever the reference feeds its
    d2 model, which on the shipped eval path is the UCN dataset's
    normalized-BGR tensor - Network_RGBD bypasses detectron2's input mapper
    and passes sample['image_color'] (= BGR/255 - BGR means,
    lib/datasets/ocid_object.py:80-86) straight into the model normalizer
    (lib/fcn/test_utils.py:150-181). Our CLIs reproduce exactly that, so
    converted reference checkpoints see bit-matching inputs; synthetic
    rand*255 inputs in tests/profilers exercise shapes/perf only. The
    reference's standard arch consumes only the image tensor
    (meanshiftformer_model.py backbone(images.tensor)); xyz is accepted for
    call-signature parity with MSMFormer and ignored.

    light=True / present mirror MSMFormer's inference-path contract so the
    two-stage predictor can drive either architecture."""

    cfg: Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, xyz=None, train: bool = False, light: bool = False,
                 present=None):
        from .backbone_resnet import ResNetBackbone
        from .swin import SwinTransformer
        from .pixel_decoders import (
            BasePixelDecoder, TransformerEncoderPixelDecoder,
            MSDeformAttnPixelDecoder,
        )
        from ..config import COCO_PIXEL_MEAN_RGB, COCO_PIXEL_STD_RGB

        c = self.cfg
        mean = jnp.asarray(COCO_PIXEL_MEAN_RGB, jnp.float32)
        std = jnp.asarray(COCO_PIXEL_STD_RGB, jnp.float32)
        x = ((image - mean) / std).astype(self.dtype)

        kind = c.backbone.kind
        if kind == "swin":
            features = SwinTransformer(dtype=self.dtype, name="backbone")(
                x, train=train)
            channels = (96, 192, 384, 768)
        else:  # resnet50 (default for use_other_backbone configs)
            features = ResNetBackbone(dtype=self.dtype, name="backbone")(
                x, train=train)
            channels = (256, 512, 1024, 2048)

        pd = c.pixel_decoder
        if pd.name == "fpn":
            mask_features, _, multi_scale = BasePixelDecoder(
                feature_channels=channels, conv_dim=pd.conv_dim,
                mask_dim=pd.mask_dim, dtype=self.dtype,
                name="pixel_decoder")(features)
        elif pd.name == "transformer_enc":
            mask_features, _, multi_scale = TransformerEncoderPixelDecoder(
                feature_channels=channels, conv_dim=pd.conv_dim,
                mask_dim=pd.mask_dim, enc_layers=pd.transformer_enc_layers,
                dtype=self.dtype, name="pixel_decoder")(features)
        elif pd.name == "msdeformattn":
            mask_features, _, multi_scale = MSDeformAttnPixelDecoder(
                feature_channels=channels, conv_dim=pd.conv_dim,
                mask_dim=pd.mask_dim, enc_layers=pd.transformer_enc_layers,
                dtype=self.dtype,
                compute_dtype=jnp.float32 if pd.fp32 else self.dtype,
                name="pixel_decoder")(features)
        else:
            raise ValueError(f"unknown pixel_decoder.name {pd.name!r} for the "
                             "standard-backbone arch (fpn | transformer_enc | "
                             "msdeformattn)")

        d = c.decoder
        use_pallas = (d.use_pallas_attention and not train
                      and jax.default_backend() == "tpu")
        decoder = MeanShiftDecoder(
            num_classes=d.num_classes, hidden_dim=d.hidden_dim,
            num_queries=d.num_queries, nheads=d.nheads,
            dim_feedforward=d.dim_feedforward, dec_layers=d.dec_layers,
            mask_dim=d.mask_dim, in_channels=pd.conv_dim,
            num_feature_levels=d.num_feature_levels,
            enforce_input_project=d.enforce_input_project,
            use_meanshift_cross_attention=d.use_meanshift_cross_attention,
            use_meanshift_self_attention=d.use_meanshift_self_attention,
            disable_attention_mask=d.disable_attention_mask,
            decoder_block_norm=d.decoder_block_norm, kappa=d.kappa,
            use_pallas=use_pallas, materialize_masks=not light,
            key_stride=1 if train else d.key_stride,
            tile_skip=(not train) and d.tile_skip,
            tile_skip_force_all=d.tile_skip_force_all,
            remat=train and c.train_remat_attention,
            dtype=self.dtype,
            name="predictor")
        outputs = decoder(multi_scale, mask_features, present=present)

        if light and "mask_embed" in outputs and "pred_masks" not in outputs:
            # the [Q, C] embeddings + stride-4 mask features; instance_inference
            # materializes (and upsamples) only the selected queries' masks
            outputs["mask_features"] = mask_features
            return outputs
        if train:
            outputs["mask_features"] = mask_features
        if not train:
            hw = (image.shape[1], image.shape[2])
            if outputs["pred_masks"].shape[-2:] != hw:
                outputs["pred_masks"] = resize_bilinear(
                    outputs["pred_masks"][..., None], hw, align_corners=False)[..., 0]
        return outputs


# legacy name used by round-1 tests/converters
MeanShiftMaskFormerR50 = StandardMaskFormer


def build_model(cfg: Config, dtype=None):
    """Meta-architecture factory (ref: META_ARCH_REGISTRY + build_model,
    lib/fcn/test_demo.py:48-72): the UCN-backbone arch unless the config selects
    a standard backbone (use_other_backbone / backbone.kind). dtype overrides
    cfg.dtype when given."""
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    if cfg.use_other_backbone or cfg.backbone.kind != "ucn":
        return StandardMaskFormer(cfg=cfg, dtype=dtype)
    return MSMFormer(cfg=cfg, dtype=dtype)
