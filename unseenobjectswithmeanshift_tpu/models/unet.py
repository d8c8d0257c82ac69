"""UNet and VGG embedding networks - the SEGNET model-zoo variants beyond the
ResNet FCNs (ref: lib/networks/unets.py; factories seg_unet_embedding /
seg_vgg_embedding in lib/networks/SEG.py:163-171).

- UNetEncoder/UNetDecoder: GroupNorm conv blocks, 4 maxpool stages, multi-branch
  skip concatenation, channel-halving upsample (bilinear scale 2)
- VGGEmbedding: the 'vgg16-based-16' encoder (SEG.py:21-23) + the
  'd16-embedding' transpose-conv decoder (SEG.py:47-50), LeakyReLU(0.2)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .resnet import default_precision
from ..ops.resize import resize_bilinear


class ConvGNReLU(nn.Module):
    out_channels: int
    num_groups: int
    ksize: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = 0 if self.ksize < 2 else self.ksize // 2
        x = nn.Conv(self.out_channels, (self.ksize, self.ksize), padding=pad,
                    use_bias=False, dtype=self.dtype,
                    precision=default_precision(self.dtype), name="conv")(x)
        x = nn.GroupNorm(num_groups=self.num_groups, dtype=self.dtype, name="gn")(x)
        return nn.relu(x)


class ConvGNReLUx2(nn.Module):
    out_channels: int
    num_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvGNReLU(self.out_channels, self.num_groups, dtype=self.dtype,
                       name="layer1")(x)
        return ConvGNReLU(self.out_channels, self.num_groups, dtype=self.dtype,
                          name="layer2")(x)


class UNetEncoder(nn.Module):
    """(ref: unets.py UNet_Encoder:141-175)"""

    feature_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fd = self.feature_dim
        skips = []
        x = ConvGNReLUx2(fd, fd, dtype=self.dtype, name="layer1")(x)
        skips.append(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvGNReLUx2(fd * 2, fd, dtype=self.dtype, name="layer2")(x)
        skips.append(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvGNReLUx2(fd * 4, fd, dtype=self.dtype, name="layer3")(x)
        skips.append(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvGNReLUx2(fd * 8, fd, dtype=self.dtype, name="layer4")(x)
        skips.append(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvGNReLU(fd * 16, fd, dtype=self.dtype, name="last_layer")(x)
        return x, skips


class UpsampleConcatConv(nn.Module):
    """(ref: unets.py Upsample_Concat_Conv2d_GN_ReLU_Multi_Branch:54-83)"""

    in_channels: int
    out_channels: int
    num_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips):
        x = ConvGNReLU(self.in_channels // 2, self.num_groups, dtype=self.dtype,
                       name="channel_reduction")(x)
        h, w = x.shape[1] * 2, x.shape[2] * 2
        # torch nn.Upsample(scale_factor=2, bilinear) has align_corners=False
        x = resize_bilinear(x, (h, w), align_corners=False)
        x = jnp.concatenate([x] + skips, axis=-1)
        return ConvGNReLU(self.out_channels, self.num_groups, dtype=self.dtype,
                          name="conv_gn_relu")(x)


class UNetDecoder(nn.Module):
    """(ref: unets.py UNet_Decoder:177-241; single encoder, no coordconv in the
    shipped configs)"""

    feature_dim: int = 64
    num_encoders: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, encoder_out, skips):
        fd = self.feature_dim
        x = ConvGNReLU(fd * 16, fd, ksize=1, dtype=self.dtype, name="fuse")(encoder_out)
        x = UpsampleConcatConv(fd * 16, fd * 8, fd, dtype=self.dtype,
                               name="up1")(x, [skips[3]])
        x = UpsampleConcatConv(fd * 8, fd * 4, fd, dtype=self.dtype,
                               name="up2")(x, [skips[2]])
        x = UpsampleConcatConv(fd * 4, fd * 2, fd, dtype=self.dtype,
                               name="up3")(x, [skips[1]])
        x = UpsampleConcatConv(fd * 2, fd, fd, dtype=self.dtype,
                               name="up4")(x, [skips[0]])
        x = ConvGNReLU(fd, fd, dtype=self.dtype, name="layer5")(x)
        return nn.Conv(fd, (3, 3), padding=1, dtype=self.dtype,
                       precision=default_precision(self.dtype), name="last_conv")(x)


class UNetEmbedding(nn.Module):
    """seg_unet_embedding equivalent: encoder + decoder producing feature_dim
    channels at input resolution."""

    feature_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc, skips = UNetEncoder(self.feature_dim, dtype=self.dtype,
                                 name="encoder")(x)
        return UNetDecoder(self.feature_dim, dtype=self.dtype,
                           name="decoder")(enc, skips)


VGG16_ENCODER = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                 512, 512, 512, "M", 512, 512, 512, "M", 1024, 1024)
VGG16_DECODER = (1024, "d512", 512, 512, "d512", 512, 512, "d256", 256, 256,
                 "d128", 128, 128, "d64", 64)  # + final num_units conv


class VGGEmbedding(nn.Module):
    """seg_vgg_embedding equivalent (ref: SEG.py encoder_archs/decoder_archs +
    unets.py make_encoder_layers/make_decoder_layers): LeakyReLU(0.2) conv
    stacks with 5 maxpools down and 4 transpose-conv (k4 s2) ups; the final
    embedding conv has no activation."""

    num_units: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        prec = default_precision(self.dtype)
        i = 0
        for v in VGG16_ENCODER:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                            precision=prec, name=f"enc_{i}")(x)
                x = nn.leaky_relu(x, 0.2)
                i += 1
        for v in VGG16_DECODER:
            if isinstance(v, str):
                c = int(v[1:])
                # torch ConvTranspose2d(k=4, s=2, p=1) doubles the spatial size;
                # flax 'SAME' transpose matches that output geometry
                x = nn.ConvTranspose(c, (4, 4), strides=(2, 2), padding="SAME",
                                     dtype=self.dtype, precision=prec,
                                     name=f"dec_{i}")(x)
                x = nn.leaky_relu(x, 0.2)
            else:
                x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                            precision=prec, name=f"dec_{i}")(x)
                x = nn.leaky_relu(x, 0.2)
            i += 1
        # final embedding conv, no activation (make_decoder_layers last-layer rule)
        return nn.Conv(self.num_units, (3, 3), padding=1, dtype=self.dtype,
                       precision=prec, name="embedding")(x)
