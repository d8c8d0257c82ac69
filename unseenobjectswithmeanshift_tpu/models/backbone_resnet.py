"""Multi-scale ResNet backbone (detectron2-style) for the standard-backbone
configurations (ref: configs/UOAIS_ResNet50.yaml uses detectron2's
build_resnet_backbone with res2..res5 outputs, Caffe-style stride-in-1x1
bottlenecks and frozen BatchNorm).

NHWC flax module returning {'res2': ..., 'res3': ..., 'res4': ..., 'res5': ...}.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .resnet import default_precision


class D2Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    stride_in_1x1: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        prec = default_precision(self.dtype)
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        residual = x
        out = nn.Conv(self.planes, (1, 1), strides=s1, use_bias=False,
                      dtype=self.dtype, precision=prec, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=s3, padding=1, use_bias=False,
                      dtype=self.dtype, precision=prec, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                      precision=prec, name="conv3")(out)
        out = bn("bn3")(out)
        if self.has_downsample:
            residual = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype, precision=prec,
                               name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNetBackbone(nn.Module):
    """Standard-stride ResNet with multi-scale outputs."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)   # ResNet50
    stride_in_1x1: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        prec = default_precision(self.dtype)
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, precision=prec, name="stem_conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = {}
        inplanes = 64
        for si, (planes, nblocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if si == 0 else 2
            for bi in range(nblocks):
                has_ds = bi == 0 and (stride != 1 or inplanes != planes * 4)
                x = D2Bottleneck(planes=planes, stride=stride if bi == 0 else 1,
                                 has_downsample=has_ds,
                                 stride_in_1x1=self.stride_in_1x1,
                                 dtype=self.dtype,
                                 name=f"res{si + 2}_{bi}")(x, train=train)
                inplanes = planes * 4
            outs[f"res{si + 2}"] = x
        return outs
