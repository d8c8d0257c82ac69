"""UCN embedding network (SEGNET): RGB / depth-XYZ / fused RGB-D towers producing
L2-normalized per-pixel embeddings.

Ref: lib/networks/SEG.py:26-126. Fusion modes (SEG.py:97-110):
- 'early': 6-channel concat input through one tower
- 'add':   two towers (rgb + xyz), features summed   <- the shipped RGBD checkpoints
- 'cat':   two towers, channel concat
Output is L2-normalized over channels when normalize=True (SEG.py:112-114).

Layout is NHWC (channel-last). Callers pass image and xyz as [B, H, W, 3].
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .resnet import resnet34_8s, resnet50_8s


def l2_normalize(x, axis=-1, eps=1e-12):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


class SEGNET(nn.Module):
    network: str = "resnet34_8s"      # resnet34_8s | resnet50_8s
    input_type: str = "RGBD"          # COLOR | DEPTH | RGBD
    fusion_type: str = "add"          # early | add | cat
    num_units: int = 64
    normalize: bool = True
    # grouped_towers: run the two RGBD towers as ONE conv stack with
    # feature_group_count=2 on channel-stacked inputs/weights. Numerically
    # identical to two towers (grouped channels never mix; BatchNorm is
    # per-channel; the bilinear upsample and the final add are linear) but
    # every conv contracts at twice the width, which fills the 128-wide MXU
    # where a single tower's 64/128-channel layers under-fill it. Weight
    # fusion: utils.checkpoint.fuse_tower_params.
    grouped_towers: bool = False
    dtype: jnp.dtype = jnp.float32

    def _make_fcn(self, name, groups: int = 1):
        from .resnet import DilatedResNetFCN

        if self.network == "unet":
            from .unet import UNetEmbedding

            return UNetEmbedding(feature_dim=self.num_units, dtype=self.dtype,
                                 name=name)
        if self.network == "vgg":
            from .unet import VGGEmbedding

            return VGGEmbedding(num_units=self.num_units, dtype=self.dtype,
                                name=name)
        block = {"resnet34_8s": "basic", "resnet50_8s": "bottleneck"}[self.network]
        return DilatedResNetFCN(layers=(3, 4, 6, 3), block=block,
                                num_units=self.num_units, output_stride=8,
                                groups=groups, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, img=None, xyz=None, train: bool = False):
        two_tower = self.input_type == "RGBD" and self.fusion_type != "early"
        if self.input_type == "DEPTH":
            features = self._make_fcn("fcn")(xyz, train=train)
        elif self.input_type == "COLOR":
            features = self._make_fcn("fcn")(img, train=train)
        elif self.input_type == "RGBD" and self.fusion_type == "early":
            features = self._make_fcn("fcn")(
                jnp.concatenate([img, xyz], axis=-1), train=train)
        elif two_tower and self.grouped_towers and self.network.startswith("resnet"):
            both = self._make_fcn("fcn", groups=2)(
                jnp.concatenate([img, xyz], axis=-1), train=train)
            if self.fusion_type == "add":
                features = both[..., :self.num_units] + both[..., self.num_units:]
            else:                     # 'cat': the halves already are [rgb|xyz]
                features = both
        else:
            features = self._make_fcn("fcn")(img, train=train)
            features_depth = self._make_fcn("fcn_depth")(xyz, train=train)
            if self.fusion_type == "add":
                features = features + features_depth
            else:
                features = jnp.concatenate([features, features_depth], axis=-1)

        if self.normalize:
            features = l2_normalize(features, axis=-1)
        return features


def build_segnet(cfg, dtype=jnp.float32):
    """Build from a Config (ref factory: lib/networks/SEG.py:173-186)."""
    b = cfg.backbone
    return SEGNET(network=b.network, input_type=b.input_type, fusion_type=b.fusion_type,
                  num_units=b.num_units, normalize=b.normalize,
                  grouped_towers=getattr(b, "grouped_towers", False),
                  dtype=dtype)
