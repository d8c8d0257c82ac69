"""Every shipped reference config has a named preset that builds a model
(ref: MSMFormer/configs/*.yaml - 12 concrete configs - and the 10 UCN
experiments/cfgs/*.yml)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unseenobjectswithmeanshift_tpu.config import get_config, PRESETS

REFERENCE_MSMFORMER_PRESETS = [
    "tabletop_pretrained", "crop_tabletop_pretrained",
    "tabletop_pretrained_resnet50", "crop_tabletop_resnet50_rgb",
    "uoais_resnet50", "uoais_ucn", "mixture_ucn", "crop_mixture_ucn",
    "mixture_resnet50", "crop_mixture_resnet50", "pushing_ucn",
    "pushing_resnet50",
]
UCN_EXPERIMENT_PRESETS = [
    "ucn_color", "ucn_color_crop", "ucn_depth", "ucn_depth_crop",
    "ucn_rgbd_add", "ucn_rgbd_add_crop", "ucn_rgbd_cat", "ucn_rgbd_cat_crop",
    "ucn_rgbd_early", "ucn_rgbd_early_crop",
]


@pytest.mark.parametrize("name", REFERENCE_MSMFORMER_PRESETS + UCN_EXPERIMENT_PRESETS)
def test_preset_exists_and_is_consistent(name):
    cfg = get_config(name)
    assert cfg.name == name
    if "resnet50" in name:
        # ref: *_ResNet50.yaml: MSDeformAttn pixel decoder, CONVS_DIM 64,
        # 3 levels, DEC_LAYERS 10 -> 9 decoder layers
        assert cfg.use_other_backbone
        assert cfg.pixel_decoder.name == "msdeformattn"
        assert cfg.pixel_decoder.conv_dim == 64
        assert cfg.decoder.num_feature_levels == 3
        assert cfg.decoder.dec_layers == 9
    if name.startswith("uoais"):
        # ref: UOAIS_*.yaml:77/86: DETECTIONS_PER_IMAGE 40
        assert cfg.test.detections_per_image == 40
        assert cfg.test.max_instances == 40
    if "mixture" in name or name == "pushing_ucn":
        assert cfg.solver.max_iter == 2120 or "resnet50" in name
    if name.startswith("ucn_"):
        assert cfg.loss.use_embedding_loss
        assert cfg.loss.embedding_lambda_intra == 10.0
        assert cfg.train_syn_crop == name.endswith("_crop")


def test_ucn_preset_builds_segnet():
    from unseenobjectswithmeanshift_tpu.models.segnet import build_segnet

    for name in ("ucn_rgbd_cat", "ucn_rgbd_early", "ucn_color"):
        cfg = get_config(name)
        seg = build_segnet(cfg)
        img = jnp.zeros((1, 32, 32, 3))
        xyz = jnp.zeros((1, 32, 32, 3))
        v = seg.init(jax.random.PRNGKey(0), img, xyz)
        out = seg.apply(v, img, xyz)
        expect_c = 128 if name == "ucn_rgbd_cat" else 64
        assert out.shape == (1, 32, 32, expect_c)


def test_uoais_ucn_preset_builds_model():
    from unseenobjectswithmeanshift_tpu.models.meta_arch import build_model

    cfg = get_config("uoais_ucn")
    # shrink for CPU
    cfg.decoder.hidden_dim = 32
    cfg.decoder.nheads = 4
    cfg.decoder.num_queries = 8
    cfg.decoder.dec_layers = 1
    cfg.decoder.dim_feedforward = 32
    cfg.decoder.mask_dim = 16
    cfg.pixel_decoder.mask_dim = 16
    model = build_model(cfg)
    img = jnp.zeros((1, 32, 32, 3))
    xyz = jnp.zeros((1, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(0), img, xyz)
    out = model.apply(v, img, xyz)
    assert out["pred_logits"].shape == (1, 8, 3)
