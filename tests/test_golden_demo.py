"""Golden-fixture test: the full two-stage pipeline on the reference's demo
RGB-D images (ref: data/demo/*-color.png, the flagship
tools/test_image_with_ms_transformer.py workload) with fixed seeded weights.

Per-module parity tests can't catch a regression in the composed preprocessing
-> stage-1 -> crop -> stage-2 -> paste-back chain; this pins the end-to-end
label images against committed goldens. Random weights make mask logits sit
near zero (sign flips under fp jitter are expected - see
.claude/skills/verify/SKILL.md), so the assertion is >= 99% pixel agreement
rather than bitwise; real composition bugs (wrong normalize order, threshold,
label convention, paste geometry) move far more than 1% of pixels.

Regenerate goldens after an intentional behavior change:
  python tests/test_golden_demo.py --regen
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unseenobjectswithmeanshift_tpu.config import get_config
from unseenobjectswithmeanshift_tpu.pipeline.two_stage import TwoStagePredictor

DEMO_DIR = "/root/reference/data/demo"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "demo_labels.npz")
FRAMES = [f"{i:06d}" for i in range(9)]


def _tiny_cfg():
    cfg = get_config("tabletop_pretrained")
    cfg.decoder.num_queries = 16
    cfg.decoder.hidden_dim = 32
    cfg.decoder.dim_feedforward = 64
    cfg.decoder.dec_layers = 2
    cfg.decoder.nheads = 4
    cfg.decoder.mask_dim = 32
    cfg.decoder.conv_dim = 16
    cfg.backbone.num_units = 16
    cfg.pixel_decoder.conv_dim = 16
    cfg.pixel_decoder.mask_dim = 32
    cfg.test.max_instances = 6
    cfg.test.crop_size = 64
    # random weights are indecisive (class scores ~uniform); drop the
    # confidence floor so detections exist and stage 2 + paste-back run
    cfg.test.low_threshold = 0.05
    return cfg


def _load_frames():
    import json

    from unseenobjectswithmeanshift_tpu.utils.preprocess import (
        read_sample, pad_to_multiple,
    )

    with open(os.path.join(DEMO_DIR, "camera_params.json")) as f:
        camera_params = json.load(f)
    imgs, xyzs = [], []
    for fr in FRAMES:
        sample = read_sample(os.path.join(DEMO_DIR, f"{fr}-color.png"),
                             os.path.join(DEMO_DIR, f"{fr}-depth.png"),
                             camera_params, input_type="RGBD")
        img, _ = pad_to_multiple(sample["image"][None], 32)
        xyz, _ = pad_to_multiple(sample["xyz"][None], 32)
        imgs.append(img[0])
        xyzs.append(xyz[0])
    return jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(xyzs))


def _run():
    cfg = _tiny_cfg()
    pred = TwoStagePredictor(cfg)
    img, xyz = _load_frames()
    v1, v2 = pred.init(jax.random.PRNGKey(3), img.shape[1:3],
                       crop_size=cfg.test.crop_size)
    labels, refined = pred(v1, v2, img, xyz)
    return np.asarray(labels), np.asarray(refined)


@pytest.mark.skipif(not os.path.isdir(DEMO_DIR), reason="demo fixtures absent")
def test_golden_demo_labels():
    assert os.path.exists(GOLDEN), "goldens missing - run with --regen"
    labels, refined = _run()
    g = np.load(GOLDEN)
    for name, got in (("labels", labels), ("refined", refined)):
        want = g[name]
        assert got.shape == want.shape
        agree = (got == want).mean()
        assert agree >= 0.99, (
            f"{name}: only {agree:.4%} of pixels match the golden output")


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        labels, refined = _run()
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, labels=labels, refined=refined)
        ni = [len([v for v in np.unique(refined[i]) if v >= 1])
              for i in range(len(FRAMES))]
        print(f"goldens written: {GOLDEN}; instances/frame {ni}")
