"""Resize ops validated against torch (CPU) - the reference's exact conventions."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from unseenobjectswithmeanshift_tpu.ops.resize import (
    resize_bilinear, resize_nearest, resize_nearest_hw,
)


def _torch_resize(x_hwc, out_hw, mode, align_corners=None):
    t = torch.from_numpy(np.ascontiguousarray(x_hwc.transpose(2, 0, 1)))[None]
    kwargs = {} if align_corners is None else {"align_corners": align_corners}
    o = F.interpolate(t, size=out_hw, mode=mode, **kwargs)
    return o[0].numpy().transpose(1, 2, 0)


def test_bilinear_align_corners_true_matches_torch(rng):
    # the backbone's 8x upsample (resnet_dilated.py: upsample_bilinear)
    x = rng.rand(16, 22, 5).astype(np.float32)
    for out in [(128, 176), (37, 50), (16, 22)]:
        mine = np.asarray(resize_bilinear(jnp.asarray(x), out, align_corners=True))
        ref = _torch_resize(x, out, "bilinear", True)
        np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_bilinear_align_corners_false_matches_torch(rng):
    # mask interpolation (F.interpolate align_corners=False)
    x = rng.rand(13, 17, 3).astype(np.float32)
    for out in [(52, 68), (7, 9), (29, 40)]:
        mine = np.asarray(resize_bilinear(jnp.asarray(x), out, align_corners=False))
        ref = _torch_resize(x, out, "bilinear", False)
        np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_nearest_matches_torch(rng):
    x = (rng.rand(9, 11, 1) * 10).astype(np.float32)
    for out in [(224, 224), (18, 22), (5, 6)]:
        mine = np.asarray(resize_nearest(jnp.asarray(x), out))
        ref = _torch_resize(x, out, "nearest")
        np.testing.assert_array_equal(mine, ref)


def test_nearest_hw_label_image(rng):
    lab = (rng.rand(9, 11) * 5).astype(np.int32)
    out = np.asarray(resize_nearest_hw(jnp.asarray(lab), (27, 33)))
    ref = _torch_resize(lab[..., None].astype(np.float32), (27, 33), "nearest")[..., 0]
    np.testing.assert_array_equal(out.astype(np.float32), ref)


def test_downsample_then_identity(rng):
    x = rng.rand(8, 8, 2).astype(np.float32)
    assert resize_bilinear(jnp.asarray(x), (8, 8)) is not None
    np.testing.assert_array_equal(np.asarray(resize_bilinear(jnp.asarray(x), (8, 8))), x)
