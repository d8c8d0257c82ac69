"""ResNet50 + MSDeformAttn pixel decoder + 3-level decoder smoke test."""

import numpy as np
import jax
import jax.numpy as jnp

from unseenobjectswithmeanshift_tpu.config import get_config
from unseenobjectswithmeanshift_tpu.models.meta_arch import MeanShiftMaskFormerR50
from unseenobjectswithmeanshift_tpu.models.backbone_resnet import ResNetBackbone
from unseenobjectswithmeanshift_tpu.models.pixel_decoders import (
    BasePixelDecoder, MSDeformAttnPixelDecoder,
)


def test_resnet_backbone_multiscale(rng):
    m = ResNetBackbone(layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert outs["res2"].shape == (1, 16, 16, 256)
    assert outs["res3"].shape == (1, 8, 8, 512)
    assert outs["res4"].shape == (1, 4, 4, 1024)
    assert outs["res5"].shape == (1, 2, 2, 2048)


def _fake_features(rng, B=1, base=16):
    return {
        "res2": jnp.asarray(rng.randn(B, base, base, 32).astype(np.float32)),
        "res3": jnp.asarray(rng.randn(B, base // 2, base // 2, 64).astype(np.float32)),
        "res4": jnp.asarray(rng.randn(B, base // 4, base // 4, 128).astype(np.float32)),
        "res5": jnp.asarray(rng.randn(B, base // 8, base // 8, 256).astype(np.float32)),
    }


def test_fpn_pixel_decoder(rng):
    feats = _fake_features(rng)
    m = BasePixelDecoder(feature_channels=(32, 64, 128, 256), conv_dim=32, mask_dim=32)
    v = m.init(jax.random.PRNGKey(0), feats)
    mf, _, ms = m.apply(v, feats)
    assert mf.shape == (1, 16, 16, 32)          # at res2 resolution
    assert len(ms) == 3
    assert ms[0].shape[1] == 2                   # res5 first (top-down order)


def test_msdeform_pixel_decoder(rng):
    feats = _fake_features(rng)
    m = MSDeformAttnPixelDecoder(feature_channels=(32, 64, 128, 256),
                                 conv_dim=32, mask_dim=32, enc_layers=2,
                                 dim_feedforward=64, nheads=4)
    v = m.init(jax.random.PRNGKey(0), feats)
    mf, tf, ms = m.apply(v, feats)
    assert mf.shape == (1, 16, 16, 32)           # stride-4 == res2 here
    assert len(ms) == 3
    assert ms[0].shape[1] == 2                    # res5 scale first


def test_r50_meta_arch_smoke(rng):
    cfg = get_config("uoais_resnet50")
    cfg.decoder.hidden_dim = 256
    cfg.decoder.num_queries = 8
    cfg.decoder.dec_layers = 3        # multiple of 3 levels
    cfg.decoder.dim_feedforward = 64
    cfg.pixel_decoder.transformer_enc_layers = 1
    model = MeanShiftMaskFormerR50(cfg=cfg)
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
    v = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(v, img)
    assert out["pred_logits"].shape == (1, 8, 3)
    assert out["pred_masks"].shape == (1, 8, 64, 64)
    assert len(out["aux_outputs"]) == 3


def test_transformer_encoder_pixel_decoder(rng):
    from unseenobjectswithmeanshift_tpu.models.pixel_decoders import (
        TransformerEncoderPixelDecoder,
    )

    feats = _fake_features(rng)
    m = TransformerEncoderPixelDecoder(feature_channels=(32, 64, 128, 256),
                                       conv_dim=32, mask_dim=32, enc_layers=2,
                                       nheads=4, dim_feedforward=64)
    v = m.init(jax.random.PRNGKey(0), feats)
    mf, tf, ms = m.apply(v, feats)
    assert mf.shape == (1, 16, 16, 32)
    assert tf.shape == (1, 2, 2, 32)
    assert len(ms) == 3
