"""Preset -> runnable predictor coverage: every config preset must build through
the predictor factory, and each architecture family (UCN-backbone, ResNet50,
Swin; FPN / transformer-encoder / MSDeformAttn pixel decoders) must run
end-to-end (ref: the reference builds either arch from config via
META_ARCH_REGISTRY, lib/fcn/test_demo.py:48-72)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unseenobjectswithmeanshift_tpu.config import PRESETS, get_config
from unseenobjectswithmeanshift_tpu.models.meta_arch import build_model, \
    MSMFormer, StandardMaskFormer
from unseenobjectswithmeanshift_tpu.pipeline.two_stage import TwoStagePredictor
from unseenobjectswithmeanshift_tpu.pipeline.factory import (
    build_two_stage_predictor, crop_preset_for,
)


def test_every_preset_builds_a_model():
    """build_model must dispatch every preset to a constructible meta-arch
    (construction is lazy in flax - this catches config/arch mismatches)."""
    for name in PRESETS:
        cfg = get_config(name)
        model = build_model(cfg)
        if cfg.use_other_backbone or cfg.backbone.kind != "ucn":
            assert isinstance(model, StandardMaskFormer), name
            assert cfg.pixel_decoder.name in ("fpn", "transformer_enc",
                                              "msdeformattn"), name
        else:
            assert isinstance(model, MSMFormer), name
            assert cfg.pixel_decoder.name == "simple", name


def test_crop_preset_pairing():
    for name in PRESETS:
        crop = crop_preset_for(name)
        assert crop in PRESETS


def _shrink(cfg):
    cfg.decoder.num_queries = 8
    cfg.decoder.hidden_dim = 32
    cfg.decoder.dim_feedforward = 64
    cfg.decoder.dec_layers = 3      # multiple of the 3 feature levels
    cfg.decoder.nheads = 4
    cfg.decoder.mask_dim = 32
    # pixel-decoder conv dims must stay divisible by the GroupNorm(32) groups
    cfg.decoder.conv_dim = 32
    cfg.pixel_decoder.conv_dim = 32
    cfg.pixel_decoder.mask_dim = 32
    cfg.pixel_decoder.transformer_enc_layers = 1
    cfg.test.max_instances = 4
    cfg.test.crop_size = 32
    return cfg


@pytest.fixture(scope="module")
def r50_predictor():
    """uoais_resnet50-shaped two-stage predictor (shrunk for CPU): R50 backbone,
    MSDeformAttn pixel decoder, 3-level decoder - the arch the reference's
    UOAIS_ResNet50.yaml evaluation uses."""
    cfg = _shrink(get_config("uoais_resnet50"))
    cfg_crop = _shrink(get_config(crop_preset_for("uoais_resnet50")))
    pred = TwoStagePredictor(cfg, cfg_crop)
    v1, v2 = pred.init(jax.random.PRNGKey(0), (64, 64), crop_size=32)
    return pred, v1, v2


def test_r50_two_stage_end_to_end(r50_predictor, rng):
    """The ResNet50 family is runnable through the same predictor: stage 1
    (whole image) + bucketed stage-2 refinement on crops."""
    pred, v1, v2 = r50_predictor
    img = jnp.asarray((rng.rand(2, 64, 64, 3) * 255).astype(np.float32))
    labels, refined = pred(v1, v2, img, None)
    assert labels.shape == (2, 64, 64)
    assert refined.shape == (2, 64, 64)
    # deterministic across calls
    labels2, refined2 = pred(v1, v2, img, None)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(labels2))
    np.testing.assert_array_equal(np.asarray(refined), np.asarray(refined2))


def test_r50_no_refine_single_stage(r50_predictor, rng):
    """Whole-image (single-stage) R50 eval - the reference's UOAIS_ResNet50
    reproduction mode."""
    pred, v1, v2 = r50_predictor
    img = jnp.asarray((rng.rand(1, 64, 64, 3) * 255).astype(np.float32))
    labels, refined = pred(v1, v2, img, None, refine=False)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(refined))


def test_swin_stage1(rng):
    """Swin-T backbone through the standard meta-arch (the reference's
    registered-but-unshipped backbone option, swin.py:770)."""
    cfg = _shrink(get_config("tabletop_swin"))
    model = build_model(cfg)
    img = jnp.asarray((rng.rand(1, 64, 64, 3) * 255).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert out["pred_logits"].shape == (1, 8, cfg.decoder.num_classes + 1)
    assert out["pred_masks"].shape == (1, 8, 64, 64)


@pytest.mark.parametrize("pd_name", ["fpn", "transformer_enc"])
def test_alternative_pixel_decoders_reachable(pd_name, rng):
    """pixel_decoder.name selects BasePixelDecoder / TransformerEncoderPixelDecoder
    in the standard arch (ref: SEM_SEG_HEADS registry, fpn.py:37,333)."""
    cfg = _shrink(get_config("tabletop_pretrained_resnet50"))
    cfg.pixel_decoder.name = pd_name
    model = build_model(cfg)
    img = jnp.asarray((rng.rand(1, 64, 64, 3) * 255).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert out["pred_masks"].shape == (1, 8, 64, 64)


def test_ucn_arch_rejects_pyramid_pixel_decoder():
    cfg = get_config("tabletop_pretrained")
    cfg.pixel_decoder.name = "fpn"
    model = build_model(cfg)
    with pytest.raises(ValueError, match="standard-backbone"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   jnp.zeros((1, 64, 64, 3)))


def test_factory_builds_flagship(rng):
    """build_two_stage_predictor covers the no-checkpoint (random weights)
    path used by the CLIs; tiny image keeps CPU init fast."""
    pred, v1, v2, cfg, cfg_crop = build_two_stage_predictor(
        "tabletop_pretrained", image_shape=(64, 64))
    assert cfg.name == "tabletop_pretrained"
    assert cfg_crop.name == "crop_tabletop_pretrained"
    assert "params" in v1 and "params" in v2


def test_factory_key_stride_opt_in():
    """key_stride= reaches the 1-level (UCN-backbone) decoder configs and is
    left off the 3-level (R50) decoder, which has no strided path."""
    _, _, _, cfg, cfg_crop = build_two_stage_predictor(
        "tabletop_pretrained", image_shape=(64, 64), key_stride=2)
    assert cfg.decoder.key_stride == 2
    assert cfg_crop.decoder.key_stride == 2
    _, _, _, cfg, _ = build_two_stage_predictor(
        "tabletop_pretrained", image_shape=(64, 64))
    assert cfg.decoder.key_stride == 1
    # 3-level pyramids have no strided path: asking for one must be loud,
    # not silently ignored (the decoder itself rejects it at apply time)
    with pytest.raises(ValueError, match="1-level"):
        build_two_stage_predictor("uoais_resnet50", image_shape=(64, 64),
                                  key_stride=2)


def test_pixel_decoder_bf16_opt_in(r50_predictor, rng):
    """pixel_decoder.fp32=False (opt-in fast serving) follows the model
    compute dtype and stays numerically close to the fp32 parity path at
    bf16 resolution; params are shared (same init tree)."""
    cfg = _shrink(get_config("uoais_resnet50"))
    model32 = build_model(cfg)
    img = jnp.asarray((rng.rand(1, 64, 64, 3) * 255).astype(np.float32))
    v = model32.init(jax.random.PRNGKey(0), img)
    out32 = model32.apply(v, img)

    cfg16 = _shrink(get_config("uoais_resnet50"))
    cfg16.pixel_decoder.fp32 = False
    model16 = build_model(cfg16, dtype=jnp.bfloat16)
    out16 = model16.apply(v, img)   # same params: structure must line up

    a = np.asarray(out32["pred_masks"], np.float32)
    b = np.asarray(out16["pred_masks"], np.float32)
    scale = np.abs(a).max() + 1e-6
    assert np.abs(a - b).max() / scale < 0.15   # bf16-accumulation tolerance
    # sign agreement on confident logits (what binarization consumes)
    conf = np.abs(a) > 0.1 * scale
    assert (np.sign(a[conf]) == np.sign(b[conf])).mean() > 0.97
