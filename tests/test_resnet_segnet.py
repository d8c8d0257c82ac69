"""Backbone parity tests: an independently written torch oracle of the dilated
ResNet-8s FCN (same semantics as lib/networks/resnet.py + resnet_dilated.py) is
randomly initialized, its state_dict converted with the checkpoint converter, and
the flax model must reproduce its outputs exactly (eval mode, running stats)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

from unseenobjectswithmeanshift_tpu.models.resnet import (
    DilatedResNetFCN, _plan_stages, resnet34_8s,
)
from unseenobjectswithmeanshift_tpu.models.segnet import SEGNET
from unseenobjectswithmeanshift_tpu.utils.checkpoint import convert_ucn_checkpoint


# ---------------------------------------------------------------------------
# torch oracle (my own implementation of the documented semantics)
# ---------------------------------------------------------------------------

class TorchBasic(tnn.Module):
    def __init__(self, cin, planes, stride, dilation, has_ds):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 3, stride, dilation, dilation, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, dilation, dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = (
            tnn.Sequential(tnn.Conv2d(cin, planes, 1, stride, bias=False),
                           tnn.BatchNorm2d(planes))
            if has_ds else None
        )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + r)


class TorchResnetFCN(tnn.Module):
    """Mirrors DilatedResNetFCN using the same static stage plan."""

    def __init__(self, layers, num_units, output_stride, in_ch=3):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        plan = _plan_stages(layers, 1, output_stride)
        cin = 64
        for si, blocks in enumerate(plan):
            mods = []
            for (planes, stride, dil, has_ds) in blocks:
                mods.append(TorchBasic(cin, planes, stride, dil, has_ds))
                cin = planes
            setattr(self, f"layer{si + 1}", tnn.Sequential(*mods))
        self.fc = tnn.Conv2d(cin, num_units, 1)

    def forward(self, x):
        hw = x.shape[-2:]
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        x = self.fc(x)
        return TF.interpolate(x, size=hw, mode="bilinear", align_corners=True)


class TorchTower(tnn.Module):
    """Wraps the FCN under the UCN checkpoint key prefix fcn.resnet34_8s. ..."""

    def __init__(self, layers, num_units, output_stride, towers=("fcn",)):
        super().__init__()
        for t in towers:
            wrapper = tnn.Module()
            wrapper.resnet34_8s = TorchResnetFCN(layers, num_units, output_stride)
            setattr(self, t, wrapper)


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(rng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(1 + 0.5 * rng.rand(m.num_features).astype(np.float32)))
            m.weight.data.copy_(torch.from_numpy(1 + 0.2 * rng.randn(m.num_features).astype(np.float32)))
            m.bias.data.copy_(torch.from_numpy(0.1 * rng.randn(m.num_features).astype(np.float32)))


def test_plan_stages_resnet34_8s():
    plan = _plan_stages((3, 4, 6, 3), 1, 8)
    # layer1: stride1 no downsample no dilation
    assert plan[0][0] == (64, 1, 1, False)
    # layer2: downsamples to stride 8
    assert plan[1][0] == (128, 2, 1, True)
    # layer3: stride replaced by dilation 2
    assert plan[2][0] == (256, 1, 2, True)
    assert plan[2][1] == (256, 1, 2, False)
    # layer4: dilation 4
    assert plan[3][0] == (512, 1, 4, True)


@pytest.mark.parametrize("output_stride", [8, 16])
def test_fcn_matches_torch_oracle(rng, output_stride):
    layers = (1, 1, 1, 1)
    torch.manual_seed(0)
    with torch.no_grad():
        oracle = TorchTower(layers, num_units=8, output_stride=output_stride)
        _randomize_bn_stats(oracle, rng)
        oracle.eval()

        x = rng.randn(1, 3, 48, 64).astype(np.float32)
        ref = oracle.fcn.resnet34_8s(torch.from_numpy(x)).numpy()

    variables = convert_ucn_checkpoint({k: v for k, v in oracle.state_dict().items()})
    model = DilatedResNetFCN(layers=layers, block="basic", num_units=8,
                             output_stride=output_stride)
    out = model.apply(
        {"params": variables["params"]["fcn"],
         "batch_stats": variables["batch_stats"]["fcn"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_segnet_rgbd_add_matches_torch_oracle(rng):
    layers = (1, 1, 1, 1)
    torch.manual_seed(1)
    with torch.no_grad():
        oracle = TorchTower(layers, num_units=8, output_stride=8, towers=("fcn", "fcn_depth"))
        _randomize_bn_stats(oracle, rng)
        oracle.eval()

        img = rng.randn(2, 3, 32, 32).astype(np.float32)
        xyz = rng.randn(2, 3, 32, 32).astype(np.float32)
        f_rgb = oracle.fcn.resnet34_8s(torch.from_numpy(img))
        f_d = oracle.fcn_depth.resnet34_8s(torch.from_numpy(xyz))
        feats = f_rgb + f_d
        ref = TF.normalize(feats, p=2, dim=1).numpy()

    variables = convert_ucn_checkpoint(dict(oracle.state_dict()))
    # build a tiny SEGNET with the same tower architecture
    from unseenobjectswithmeanshift_tpu.models import segnet as sn
    import flax.linen as nn

    class TinySeg(SEGNET):
        def _make_fcn(self, name):
            return DilatedResNetFCN(layers=layers, block="basic", num_units=8,
                                    output_stride=8, name=name)

    model = TinySeg(input_type="RGBD", fusion_type="add", num_units=8)
    out = model.apply(variables,
                      jnp.asarray(img.transpose(0, 2, 3, 1)),
                      jnp.asarray(xyz.transpose(0, 2, 3, 1)), train=False)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_resnet34_8s_shapes():
    import jax

    model = resnet34_8s(num_units=64)
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 64, 96, 64)
