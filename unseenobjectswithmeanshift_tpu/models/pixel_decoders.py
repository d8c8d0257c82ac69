"""Pixel decoder family for the standard-backbone (ResNet50/Swin) configurations.

- BasePixelDecoder: classic top-down FPN over res2..res5 -> 3 multi-scale maps +
  3x3 mask-features conv (ref: modeling/pixel_decoder/fpn.py:37-159)
- TransformerEncoderPixelDecoder: FPN + 6-layer standard transformer encoder on
  res5 (ref: fpn.py:333-441)
- MSDeformAttnPixelDecoder: 6-layer deformable-attention encoder over res3-5 +
  extra FPN level(s) down to stride 4, 1x1 mask-features conv
  (ref: modeling/pixel_decoder/msdeformattn.py:164-358)

All are flax modules over NHWC feature dicts {'res2': [B,H,W,C], ...} and return
(mask_features, transformer_encoder_features, multi_scale_features) like the
reference's forward_features.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import resize_bilinear, resize_nearest
from ..ops.ms_deform_attn import MSDeformAttn
from .position_encoding import position_embedding_sine
from .resnet import default_precision

xavier = nn.initializers.xavier_uniform()


class BasePixelDecoder(nn.Module):
    """Top-down FPN (ref: fpn.py:37-159). in_features ordered res2..res5."""

    feature_channels: tuple = (256, 512, 1024, 2048)
    conv_dim: int = 256
    mask_dim: int = 256
    num_outputs: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array]):
        prec = default_precision(self.dtype)
        names = [f"res{i + 2}" for i in range(len(self.feature_channels))]
        gn = lambda n: nn.GroupNorm(num_groups=32, dtype=self.dtype, name=n)

        multi_scale = []
        y = None
        # top-down: res5 -> res2 (idx 0 = res5, matching layer_{N} naming)
        for idx, f in enumerate(names[::-1]):
            x = features[f]
            if idx == 0:
                y = nn.relu(gn(f"output_norm_{idx}")(nn.Conv(
                    self.conv_dim, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, precision=prec, name=f"output_conv_{idx}")(x)))
            else:
                lat = gn(f"lateral_norm_{idx}")(nn.Conv(
                    self.conv_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    precision=prec, name=f"lateral_conv_{idx}")(x))
                y = lat + resize_nearest(y, (x.shape[1], x.shape[2]))
                y = nn.relu(gn(f"output_norm_{idx}")(nn.Conv(
                    self.conv_dim, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, precision=prec, name=f"output_conv_{idx}")(y)))
            if len(multi_scale) < self.num_outputs:
                multi_scale.append(y)

        mask_features = nn.Conv(self.mask_dim, (3, 3), padding=1,
                                dtype=self.dtype, precision=prec,
                                name="mask_features")(y)
        return mask_features, None, multi_scale


class MSDeformAttnEncoderLayer(nn.Module):
    """(ref: msdeformattn.py:94-131; dropout 0 in shipped configs)"""

    d_model: int = 256
    d_ffn: int = 1024
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        prec = default_precision(self.dtype)
        src2 = MSDeformAttn(d_model=self.d_model, n_levels=self.n_levels,
                            n_heads=self.n_heads, n_points=self.n_points,
                            dtype=self.dtype, name="self_attn")(
            src + pos, reference_points, src, spatial_shapes)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + src2)
        src2 = nn.Dense(self.d_ffn, dtype=self.dtype, precision=prec,
                        kernel_init=xavier, name="linear1")(src)
        src2 = nn.Dense(self.d_model, dtype=self.dtype, precision=prec,
                        kernel_init=xavier, name="linear2")(nn.relu(src2))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src + src2)


def encoder_reference_points(spatial_shapes, n_levels: int, dtype=jnp.float32):
    """Per-position normalized center points, tiled per level
    (ref: msdeformattn.py get_reference_points; valid_ratios are all ones since
    inference never pads)."""
    pts = []
    for (h, w) in spatial_shapes:
        ry = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        rx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        yy = jnp.broadcast_to(ry[:, None], (h, w)).reshape(-1)
        xx = jnp.broadcast_to(rx[None, :], (h, w)).reshape(-1)
        pts.append(jnp.stack([xx, yy], -1))
    ref = jnp.concatenate(pts, 0)                        # [Len, 2]
    return jnp.broadcast_to(ref[:, None, :], (ref.shape[0], n_levels, 2)).astype(dtype)


class MSDeformAttnPixelDecoder(nn.Module):
    """(ref: msdeformattn.py:164-358). transformer runs over res3-5; an extra FPN
    step fuses res2 down to common stride 4; mask_features is a 1x1 conv."""

    feature_channels: tuple = (256, 512, 1024, 2048)   # res2..res5
    transformer_in_features: tuple = ("res3", "res4", "res5")
    conv_dim: int = 256
    mask_dim: int = 256
    nheads: int = 8
    dim_feedforward: int = 1024
    enc_layers: int = 6
    n_points: int = 4
    num_outputs: int = 3
    dtype: jnp.dtype = jnp.float32
    # fp32 compute is the PARITY setting (the reference wraps the whole
    # forward in autocast(enabled=False), msdeformattn.py:314); compute_dtype
    # may be set to bf16 as an opt-in fast path (config.pixel_decoder.fp32)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array]):
        L = len(self.transformer_in_features)
        dt = self.dtype
        cdt = self.compute_dtype
        cprec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
                 else default_precision(cdt))

        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (L, self.conv_dim))

        # flatten res5 -> res3 (input_proj index 0 = lowest resolution)
        srcs, poss, shapes = [], [], []
        for idx, f in enumerate(self.transformer_in_features[::-1]):
            x = features[f].astype(cdt)  # fp32 = parity (ref msdeformattn.py
            # :314 @autocast(enabled=False)); bf16 = opt-in fast path
            x = nn.Conv(self.conv_dim, (1, 1), dtype=cdt,
                        precision=cprec,
                        name=f"input_proj_{idx}")(x)
            x = nn.GroupNorm(num_groups=32, name=f"input_norm_{idx}")(x)
            b, h, w, _ = x.shape
            shapes.append((h, w))
            pe = position_embedding_sine(h, w, self.conv_dim // 2).astype(cdt)
            poss.append(jnp.broadcast_to(pe.reshape(1, h * w, -1),
                                         (b, h * w, self.conv_dim))
                        + level_embed[L - 1 - idx].astype(cdt))
            srcs.append(x.reshape(b, h * w, self.conv_dim))

        src = jnp.concatenate(srcs, 1)
        pos = jnp.concatenate(poss, 1)
        ref = encoder_reference_points(shapes, L)[None]

        for i in range(self.enc_layers):
            src = MSDeformAttnEncoderLayer(
                d_model=self.conv_dim, d_ffn=self.dim_feedforward, n_levels=L,
                n_heads=self.nheads, n_points=self.n_points,
                dtype=cdt, name=f"encoder_layer_{i}")(src, pos, ref, shapes)

        # split back to maps (res5, res4, res3 order)
        out = []
        start = 0
        for (h, w) in shapes:
            out.append(src[:, start:start + h * w].reshape(-1, h, w, self.conv_dim))
            start += h * w

        # extra FPN level(s): fuse res2 down to common stride 4
        # (num_fpn_levels = log2(8) - log2(4) = 1 for the shipped config)
        fpn_features = ["res2"]
        for idx, f in enumerate(fpn_features[::-1]):
            x = features[f].astype(cdt)
            lat = nn.GroupNorm(num_groups=32, dtype=cdt,
                               name=f"adapter_norm_{idx}")(
                nn.Conv(self.conv_dim, (1, 1), use_bias=False, dtype=cdt,
                        precision=cprec,
                        name=f"adapter_{idx}")(x))
            y = lat + resize_bilinear(out[-1], (x.shape[1], x.shape[2]),
                                      align_corners=False)
            y = nn.relu(nn.GroupNorm(num_groups=32, dtype=cdt,
                                     name=f"layer_norm_{idx}")(
                nn.Conv(self.conv_dim, (3, 3), padding=1, use_bias=False,
                        dtype=cdt, precision=cprec,
                        name=f"layer_{idx}")(y)))
            out.append(y)

        multi_scale = out[:self.num_outputs]
        mask_features = nn.Conv(self.mask_dim, (1, 1), dtype=cdt,
                                precision=cprec,
                                name="mask_features")(out[-1])
        return mask_features.astype(dt), out[0].astype(dt), \
            [m.astype(dt) for m in multi_scale]


class TransformerEncoderLayer(nn.Module):
    """Standard post-norm encoder layer (ref: transformer.py TransformerEncoderLayer
    as used by TransformerEncoderPixelDecoder; dropout 0)."""

    d_model: int = 256
    nheads: int = 8
    dim_feedforward: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos):
        from .decoder import MultiheadAttention

        prec = default_precision(self.dtype)
        qk = src + pos
        src2 = MultiheadAttention(embed_dim=self.d_model, num_heads=self.nheads,
                                  meanshift=False, dtype=self.dtype,
                                  name="self_attn")(qk, qk, src)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + src2)
        src2 = nn.Dense(self.dim_feedforward, dtype=self.dtype, precision=prec,
                        kernel_init=xavier, name="linear1")(src)
        src2 = nn.Dense(self.d_model, dtype=self.dtype, precision=prec,
                        kernel_init=xavier, name="linear2")(nn.relu(src2))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src + src2)


class TransformerEncoderPixelDecoder(nn.Module):
    """FPN + transformer encoder on res5 (ref: fpn.py TransformerEncoderPixelDecoder
    :333-441): res5 is projected to conv_dim, run through a 6-layer standard
    transformer encoder with sine PE, then used as the FPN top; returns
    (mask_features, transformer_encoder_features, multi_scale_features)."""

    feature_channels: tuple = (256, 512, 1024, 2048)
    conv_dim: int = 256
    mask_dim: int = 256
    enc_layers: int = 6
    nheads: int = 8
    dim_feedforward: int = 2048
    num_outputs: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array]):
        prec = default_precision(self.dtype)
        names = [f"res{i + 2}" for i in range(len(self.feature_channels))]
        gn = lambda n: nn.GroupNorm(num_groups=32, dtype=self.dtype, name=n)

        # transformer encoder on res5
        x5 = features[names[-1]]
        B, h, w, _ = x5.shape
        x = nn.Conv(self.conv_dim, (1, 1), dtype=self.dtype, precision=prec,
                    name="input_proj")(x5)
        pos = position_embedding_sine(h, w, self.conv_dim // 2, dtype=self.dtype)
        pos = jnp.broadcast_to(pos.reshape(1, h * w, -1), (B, h * w, self.conv_dim))
        src = x.reshape(B, h * w, self.conv_dim)
        for i in range(self.enc_layers):
            src = TransformerEncoderLayer(d_model=self.conv_dim, nheads=self.nheads,
                                          dim_feedforward=self.dim_feedforward,
                                          dtype=self.dtype,
                                          name=f"encoder_layer_{i}")(src, pos)
        transformer_features = src.reshape(B, h, w, self.conv_dim)

        # FPN top-down with the encoded res5 as the top
        multi_scale = []
        y = nn.relu(gn("output_norm_0")(nn.Conv(
            self.conv_dim, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            precision=prec, name="output_conv_0")(transformer_features)))
        multi_scale.append(y)
        for idx, f in enumerate(names[:-1][::-1], start=1):
            xf = features[f]
            lat = gn(f"lateral_norm_{idx}")(nn.Conv(
                self.conv_dim, (1, 1), use_bias=False, dtype=self.dtype,
                precision=prec, name=f"lateral_conv_{idx}")(xf))
            y = lat + resize_nearest(y, (xf.shape[1], xf.shape[2]))
            y = nn.relu(gn(f"output_norm_{idx}")(nn.Conv(
                self.conv_dim, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                precision=prec, name=f"output_conv_{idx}")(y)))
            if len(multi_scale) < self.num_outputs:
                multi_scale.append(y)

        mask_features = nn.Conv(self.mask_dim, (3, 3), padding=1, dtype=self.dtype,
                                precision=prec, name="mask_features")(y)
        return mask_features, transformer_features, multi_scale
