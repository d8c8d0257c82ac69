"""Dilated ResNet FCN backbones (flax.linen, NHWC).

TPU-native re-design of the reference's dilated ResNet family
(ref: lib/networks/resnet.py:44-270 and lib/networks/resnet_dilated.py Resnet34_8s):
stride-2 stages are replaced by dilation once the target output stride is reached,
then a 1x1 conv head projects to the embedding dim and a bilinear (align_corners=True)
upsample restores the input resolution.

Semantics preserved:
- conv3x3 padding equals dilation (resnet.py:24-41: full padding of the dilated kernel)
- output-stride bookkeeping: current_stride starts at 4; a stage's stride-2 becomes
  dilation *= 2 once current_stride == output_stride (resnet.py:188-234). The dilation
  update happens only when a downsample projection is created (stride!=1 or channel
  change) - exactly as in the reference.
- BasicBlock applies (stride, dilation) to conv1 and dilation to conv2; Bottleneck
  carries stride+dilation on its 3x3 conv2 (resnet.py:44-113)
- the head conv ("fc") is 1x1 and the final upsample uses align_corners=True
  (resnet_dilated.py: nn.functional.upsample_bilinear)

BatchNorm uses running statistics (eps 1e-5), matching torch defaults.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import resize_bilinear


def default_precision(dtype) -> jax.lax.Precision:
    """fp32 runs at HIGHEST precision for parity with the reference (this JAX
    build's default conv/matmul precision is reduced even on CPU); bf16 uses the
    backend default (full MXU speed)."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    groups: int = 1       # independent towers stacked on the channel axis
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        residual = x
        out = nn.Conv(self.planes * self.groups, (3, 3), strides=self.stride,
                      padding=self.dilation, kernel_dilation=self.dilation,
                      use_bias=False, feature_group_count=self.groups,
                      dtype=self.dtype, name="conv1",
                      precision=default_precision(self.dtype))(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes * self.groups, (3, 3), padding=self.dilation,
                      kernel_dilation=self.dilation, use_bias=False,
                      feature_group_count=self.groups,
                      dtype=self.dtype, name="conv2",
                      precision=default_precision(self.dtype))(out)
        out = bn("bn2")(out)
        if self.has_downsample:
            residual = nn.Conv(self.planes * self.groups, (1, 1),
                               strides=self.stride, use_bias=False,
                               feature_group_count=self.groups,
                               dtype=self.dtype, name="downsample_conv",
                               precision=default_precision(self.dtype))(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    groups: int = 1
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        residual = x
        out = nn.Conv(self.planes * self.groups, (1, 1), use_bias=False,
                      feature_group_count=self.groups,
                      dtype=self.dtype, name="conv1",
                      precision=default_precision(self.dtype))(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes * self.groups, (3, 3), strides=self.stride,
                      padding=self.dilation, kernel_dilation=self.dilation,
                      use_bias=False, feature_group_count=self.groups,
                      dtype=self.dtype, name="conv2",
                      precision=default_precision(self.dtype))(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4 * self.groups, (1, 1), use_bias=False,
                      feature_group_count=self.groups,
                      dtype=self.dtype, name="conv3",
                      precision=default_precision(self.dtype))(out)
        out = bn("bn3")(out)
        if self.has_downsample:
            residual = nn.Conv(self.planes * 4 * self.groups, (1, 1),
                               strides=self.stride, use_bias=False,
                               feature_group_count=self.groups,
                               dtype=self.dtype, name="downsample_conv",
                               precision=default_precision(self.dtype))(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(out + residual)


def _plan_stages(layers: Sequence[int], block_expansion: int, output_stride: int):
    """Replicate the reference's _make_layer stride/dilation bookkeeping statically.

    Returns per-stage lists of (planes, stride, dilation, has_downsample) per block.
    """
    plan = []
    current_stride = 4
    current_dilation = 1
    inplanes = 64
    for stage_idx, (planes, nblocks, stage_stride) in enumerate(
        zip((64, 128, 256, 512), layers, (1, 2, 2, 2))
    ):
        blocks = []
        stride = stage_stride
        has_downsample = stride != 1 or inplanes != planes * block_expansion
        if has_downsample:
            if current_stride == output_stride:
                current_dilation *= stride
                stride = 1
            else:
                current_stride *= stride
        blocks.append((planes, stride, current_dilation, has_downsample))
        inplanes = planes * block_expansion
        for _ in range(1, nblocks):
            blocks.append((planes, 1, current_dilation, False))
        plan.append(blocks)
    return plan


def space_to_batch(x, d: int):
    """[B, H, W, C] -> [d*d*B, H/d, W/d, C] phase decomposition: a stride-1
    3x3 conv with kernel_dilation=d and padding=d on the original equals a
    dense 3x3 conv with padding=1 on every phase (XLA lowers dense convs onto
    the MXU far better than dilated ones - 5.6x at d=2 on v5e)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // d, d, W // d, d, C)
    x = x.transpose(2, 4, 0, 1, 3, 5)
    return x.reshape(d * d * B, H // d, W // d, C)


def batch_to_space(x, d: int, batch: int):
    """Inverse of space_to_batch."""
    _, Hs, Ws, C = x.shape
    x = x.reshape(d, d, batch, Hs, Ws, C)
    x = x.transpose(2, 3, 0, 4, 1, 5)
    return x.reshape(batch, Hs * d, Ws * d, C)


class DilatedResNetFCN(nn.Module):
    """ResNet-N s-FCN: conv stack at the given output stride + 1x1 head conv +
    bilinear (align_corners=True) upsample to input size.

    block: 'basic' or 'bottleneck'; layers e.g. (3,4,6,3) for ResNet34/50.
    num_units: output embedding channels (the reference's num_classes of the fc conv).

    Dilated stages (stride 1, uniform dilation d, spatial dims divisible by d)
    run under a space-to-batch transform: the pixel set, parameters and results
    are identical (phase reordering only), but every conv is dense. Batch-norm
    statistics are over the same pixel set, so training semantics are unchanged.
    """

    layers: Tuple[int, ...] = (3, 4, 6, 3)
    block: str = "basic"
    num_units: int = 64
    output_stride: int = 8
    upsample: bool = True
    use_space_to_batch: bool = True
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_hw = (x.shape[-3], x.shape[-2])
        batch = x.shape[0]
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4

        x = nn.Conv(64 * self.groups, (7, 7), strides=2, padding=3,
                    use_bias=False, feature_group_count=self.groups,
                    dtype=self.dtype, name="conv1",
                    precision=default_precision(self.dtype))(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        plan = _plan_stages(self.layers, expansion, self.output_stride)
        for stage_idx, blocks in enumerate(plan):
            d = blocks[0][2]
            s2b = (self.use_space_to_batch and d > 1
                   and all(b[2] == d and b[1] == 1 for b in blocks)
                   and x.shape[1] % d == 0 and x.shape[2] % d == 0)
            if s2b:
                x = space_to_batch(x, d)
            for block_idx, (planes, stride, dilation, has_ds) in enumerate(blocks):
                x = block_cls(planes=planes, stride=stride,
                              dilation=1 if s2b else dilation,
                              has_downsample=has_ds, groups=self.groups,
                              dtype=self.dtype,
                              name=f"layer{stage_idx + 1}_{block_idx}")(x, train=train)
            if s2b:
                x = batch_to_space(x, d, batch)

        # 1x1 scoring conv (the reference's resnetN_8s.fc replaced by Conv2d(.,.,1))
        x = nn.Conv(self.num_units * self.groups, (1, 1),
                    feature_group_count=self.groups,
                    dtype=self.dtype, name="fc",
                    precision=default_precision(self.dtype))(x)
        if self.upsample:
            x = resize_bilinear(x, in_hw, align_corners=True)
        return x


def resnet34_8s(num_units: int = 64, dtype=jnp.float32, upsample: bool = True):
    """ref: lib/networks/resnet_dilated.py Resnet34_8s."""
    return DilatedResNetFCN(layers=(3, 4, 6, 3), block="basic", num_units=num_units,
                            output_stride=8, dtype=dtype, upsample=upsample)


def resnet50_8s(num_units: int = 64, dtype=jnp.float32, upsample: bool = True):
    """ref: lib/networks/resnet_dilated.py Resnet50_8s."""
    return DilatedResNetFCN(layers=(3, 4, 6, 3), block="bottleneck", num_units=num_units,
                            output_stride=8, dtype=dtype, upsample=upsample)
