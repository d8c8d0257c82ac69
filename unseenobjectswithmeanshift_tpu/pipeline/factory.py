"""Predictor factory: config preset -> runnable two-stage predictor.

The TPU equivalent of the reference's get_general_predictor / get_predictor /
get_predictor_crop (ref: lib/fcn/test_demo.py:48-72), which builds either
meta-architecture from config via META_ARCH_REGISTRY plus the matching crop
network. Here the preset name selects the architecture family (UCN-backbone
MSMFormer, ResNet50, Swin - config.backbone.kind), the paired crop-network
preset, and the right checkpoint converter.
"""

from __future__ import annotations

from typing import Optional, Tuple

from ..config import Config, get_config

# whole-image preset -> paired crop-network preset (ref: the *_crop config
# pairs under MSMFormer/configs/ and experiments/scripts/ demo wrappers:
# tabletop_pretrained + crop_tabletop_pretrained, *_ResNet50 +
# crop_tabletop_ResNet50_RGB, mixture_UCN + crop_mixture_UCN, ...)
CROP_PRESET_FOR = {
    "tabletop_pretrained": "crop_tabletop_pretrained",
    "tabletop_pretrained_rgb": "crop_tabletop_pretrained",
    "tabletop_pretrained_resnet50": "crop_tabletop_resnet50_rgb",
    "tabletop_swin": "tabletop_swin",
    "uoais_ucn": "crop_tabletop_pretrained",
    "uoais_resnet50": "crop_tabletop_resnet50_rgb",
    "mixture_ucn": "crop_mixture_ucn",
    "mixture_resnet50": "crop_mixture_resnet50",
    "pushing_ucn": "crop_mixture_ucn",
    "pushing_resnet50": "crop_mixture_resnet50",
}


def crop_preset_for(name: str) -> str:
    return CROP_PRESET_FOR.get(name, "crop_tabletop_pretrained")


def _is_standard(cfg: Config) -> bool:
    return cfg.use_other_backbone or cfg.backbone.kind != "ucn"


def convert_checkpoint_for(cfg: Config, state_dict):
    """Pick the right torch->flax converter for the config's architecture."""
    from ..utils.checkpoint import (
        convert_msmformer_checkpoint, convert_r50_msmformer_checkpoint,
    )
    if _is_standard(cfg):
        return convert_r50_msmformer_checkpoint(state_dict)
    return convert_msmformer_checkpoint(state_dict)


def build_two_stage_predictor(
        preset: str = "tabletop_pretrained",
        crop_preset: Optional[str] = None,
        checkpoint: Optional[str] = None,
        checkpoint_crop: Optional[str] = None,
        bf16: bool = False,
        no_depth: bool = False,
        rng_seed: int = 0,
        image_shape: Tuple[int, int] = (480, 640),
        key_stride: int = 1,
):
    """Build (predictor, variables, variables_crop, cfg, cfg_crop) for any
    preset in the matrix - UCN-backbone, ResNet50 or Swin (the crop network
    follows CROP_PRESET_FOR unless overridden). Without checkpoints the
    predictor runs on random weights (pipeline smoke / perf use)."""
    import jax
    import jax.numpy as jnp
    from .two_stage import TwoStagePredictor
    from ..utils.checkpoint import load_torch_state_dict

    cfg = get_config(preset)
    cfg_crop = get_config(crop_preset or crop_preset_for(preset))
    if no_depth:
        cfg.use_depth = cfg_crop.use_depth = False
        if cfg.backbone.kind == "ucn":
            cfg.backbone.input_type = "COLOR"
        if cfg_crop.backbone.kind == "ucn":
            cfg_crop.backbone.input_type = "COLOR"
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    cfg.dtype = cfg_crop.dtype = "bfloat16" if bf16 else "float32"
    if key_stride > 1:
        # opt-in fast serving (config.DecoderConfig.key_stride): NOT the
        # parity configuration; applies to the 1-level (UCN-backbone) decoders
        if cfg.decoder.num_feature_levels != 1:
            raise ValueError(
                f"key_stride={key_stride} applies to the 1-level "
                "(UCN-backbone) decoder configs only; preset "
                f"{preset!r} uses a {cfg.decoder.num_feature_levels}-level "
                "pyramid whose levels are already strided")
        cfg.decoder.key_stride = key_stride
        if cfg_crop.decoder.num_feature_levels == 1:
            cfg_crop.decoder.key_stride = key_stride

    pred = TwoStagePredictor(cfg, cfg_crop, dtype=dtype)
    if checkpoint:
        # device_put ONCE: converters return HOST numpy trees, and numpy
        # leaves fed to a jit re-upload the full weights over the device link
        # on EVERY call (measured 16.7 s/batch vs 0.24 on the dev tunnel)
        v1 = jax.device_put(
            convert_checkpoint_for(cfg, load_torch_state_dict(checkpoint)))
        v2 = jax.device_put(convert_checkpoint_for(
            cfg_crop, load_torch_state_dict(checkpoint_crop or checkpoint)))
    else:
        v1, v2 = pred.init(jax.random.PRNGKey(rng_seed), image_shape,
                           crop_size=cfg.test.crop_size)
    return pred, v1, v2, cfg, cfg_crop
