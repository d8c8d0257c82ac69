"""PyTorch-checkpoint -> JAX pytree conversion.

Published UCN / MSMFormer checkpoints (torch ``state_dict``s) are converted into
flax param/batch_stats trees so the reference's numbers are reproducible on TPU.
Handles the reference's own legacy-key migrations:
- 'module.' prefix stripping and 'decoder.features.' rewrite (lib/networks/SEG.py:130-159)
- 'static_query' -> 'query_feat' (meanshiftformer_transformer_decoder.py:702-723)

Layout conversions:
- conv weights: torch OIHW -> flax HWIO
- linear weights: torch [out, in] -> flax [in, out]
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _np(t):
    try:
        import torch
        if isinstance(t, torch.Tensor):
            return t.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model" in data and isinstance(data["model"], dict):
        data = data["model"]  # detectron2 checkpointer format
    return {k: _np(v) for k, v in data.items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_ucn_checkpoint(state_dict: Dict[str, np.ndarray]):
    """Convert a UCN SEGNET state_dict to flax {'params':..., 'batch_stats':...}.

    Mirrors the tolerant loading of lib/networks/SEG.py update_model (legacy key
    rewrites), mapping:
      fcn.resnet34_8s.conv1.weight          -> params/fcn/conv1/kernel
      fcn.resnet34_8s.layer2.0.downsample.0 -> params/fcn/layer2_0/downsample_conv
      fcn.resnet34_8s.layer2.0.downsample.1 -> params/fcn/layer2_0/downsample_bn
      fcn.resnet34_8s.fc.{weight,bias}      -> params/fcn/fc/{kernel,bias}
      (and identically under fcn_depth.)
    """
    params: dict = {}
    batch_stats: dict = {}

    # legacy migrations (ref: SEG.py:141-150)
    migrated = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[7:]
        if "decoder.features." in k:
            k = "decoder." + k.split("decoder.features.")[1]
        migrated[k] = v

    pat = re.compile(
        r"^(fcn|fcn_depth)\.(resnet\d+_\d+s)\.(.*)$"
    )
    for key, value in migrated.items():
        value = _np(value)
        m = pat.match(key)
        if not m:
            continue  # embedding-loss buffers etc. have no params
        tower, _, rest = m.groups()
        parts = rest.split(".")

        if parts[-1] == "num_batches_tracked":
            continue

        # normalize the sub-path
        if parts[0] in ("conv1", "bn1", "fc"):
            mod_path = (tower, parts[0])
            leaf = parts[1]
        elif parts[0].startswith("layer"):
            layer, block = parts[0], parts[1]
            if parts[2] == "downsample":
                sub = "downsample_conv" if parts[3] == "0" else "downsample_bn"
                mod_path = (tower, f"{layer}_{block}", sub)
                leaf = parts[4]
            else:
                mod_path = (tower, f"{layer}_{block}", parts[2])
                leaf = parts[3]
        else:
            continue

        is_bn = "bn" in mod_path[-1]
        if leaf == "weight":
            if is_bn:
                _set(params, mod_path + ("scale",), value)
            elif value.ndim == 4:
                _set(params, mod_path + ("kernel",), _conv_kernel(value))
            else:
                _set(params, mod_path + ("kernel",), value.T)
        elif leaf == "bias":
            _set(params, mod_path + ("bias",), value)
        elif leaf == "running_mean":
            _set(batch_stats, mod_path + ("mean",), value)
        elif leaf == "running_var":
            _set(batch_stats, mod_path + ("var",), value)

    return {"params": params, "batch_stats": batch_stats}


def _split3(w):
    e = w.shape[0] // 3
    return w[:e], w[e:2 * e], w[2 * e:]


def _convert_d2_resnet(state_dict, params: dict, batch_stats: dict,
                       prefix: str = "backbone."):
    """detectron2 ResNet keys -> models/backbone_resnet.ResNetBackbone tree.

    d2 layout (detectron2 modeling/backbone/resnet.py; Conv2d carries an
    attached .norm):
      backbone.stem.conv1.weight / .norm.{weight,bias,running_mean,running_var}
      backbone.res{2..5}.{b}.conv{1,2,3}.weight / .norm.*
      backbone.res{2..5}.{b}.shortcut.weight / .norm.*
    """
    for key, value in state_dict.items():
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        parts = rest.split(".")
        value = _np(value)
        if parts[0] == "stem":
            # stem.conv1.weight | stem.conv1.norm.X
            if parts[2] == "weight" and len(parts) == 3:
                _set(params, ("backbone", "stem_conv1", "kernel"),
                     _conv_kernel(value))
            elif parts[2] == "norm":
                leaf = parts[3]
                if leaf == "weight":
                    _set(params, ("backbone", "stem_bn1", "scale"), value)
                elif leaf == "bias":
                    _set(params, ("backbone", "stem_bn1", "bias"), value)
                elif leaf == "running_mean":
                    _set(batch_stats, ("backbone", "stem_bn1", "mean"), value)
                elif leaf == "running_var":
                    _set(batch_stats, ("backbone", "stem_bn1", "var"), value)
        elif parts[0].startswith("res"):
            stage, block, mod = parts[0], parts[1], parts[2]
            name = f"{stage}_{block}"
            if mod == "shortcut":
                conv_name, bn_name = "downsample_conv", "downsample_bn"
            else:
                conv_name, bn_name = mod, mod.replace("conv", "bn")
            if parts[3] == "weight" and len(parts) == 4:
                _set(params, ("backbone", name, conv_name, "kernel"),
                     _conv_kernel(value))
            elif parts[3] == "norm":
                leaf = parts[4]
                if leaf == "weight":
                    _set(params, ("backbone", name, bn_name, "scale"), value)
                elif leaf == "bias":
                    _set(params, ("backbone", name, bn_name, "bias"), value)
                elif leaf == "running_mean":
                    _set(batch_stats, ("backbone", name, bn_name, "mean"), value)
                elif leaf == "running_var":
                    _set(batch_stats, ("backbone", name, bn_name, "var"), value)


def _convert_msdeformattn_pixel_decoder(state_dict, params: dict,
                                        prefix: str = "sem_seg_head.pixel_decoder."):
    """MSDeformAttnPixelDecoder keys (ref: modeling/pixel_decoder/msdeformattn.py
    :164-358) -> models/pixel_decoders.MSDeformAttnPixelDecoder tree."""
    P = ("pixel_decoder",)
    for key, value in state_dict.items():
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        parts = rest.split(".")
        value = _np(value)
        if parts[0] == "input_proj":
            i = parts[1]
            if parts[2] == "0":    # 1x1 conv
                leaf = "kernel" if parts[3] == "weight" else "bias"
                v_ = _conv_kernel(value) if value.ndim == 4 else value
                _set(params, P + (f"input_proj_{i}", leaf), v_)
            else:                  # GroupNorm
                leaf = "scale" if parts[3] == "weight" else "bias"
                _set(params, P + (f"input_norm_{i}", leaf), value)
        elif parts[0] == "transformer":
            if parts[1] == "level_embed":
                _set(params, P + ("level_embed",), value)
            elif parts[1] == "encoder":
                i = parts[3]
                sub = parts[4]     # self_attn | norm1 | norm2 | linear1 | linear2
                layer = f"encoder_layer_{i}"
                if sub == "self_attn":
                    mod, leaf = parts[5], parts[6]
                    v_ = value.T if leaf == "weight" else value
                    leaf = "kernel" if leaf == "weight" else "bias"
                    _set(params, P + (layer, "self_attn", mod, leaf), v_)
                elif sub in ("norm1", "norm2"):
                    leaf = "scale" if parts[5] == "weight" else "bias"
                    _set(params, P + (layer, sub, leaf), value)
                elif sub in ("linear1", "linear2"):
                    leaf = "kernel" if parts[5] == "weight" else "bias"
                    v_ = value.T if leaf == "kernel" else value
                    _set(params, P + (layer, sub, leaf), v_)
        elif parts[0] == "mask_features":
            leaf = "kernel" if parts[1] == "weight" else "bias"
            v_ = _conv_kernel(value) if value.ndim == 4 else value
            _set(params, P + ("mask_features", leaf), v_)
        elif parts[0].startswith("adapter_") or parts[0].startswith("layer_"):
            # reference names extra-FPN convs from 1 (:284); ours from 0
            kind, num = parts[0].rsplit("_", 1)
            name = f"{kind}_{int(num) - 1}"
            if parts[1] == "weight" and len(parts) == 2:
                _set(params, P + (name, "kernel"), _conv_kernel(value))
            elif parts[1] == "norm":
                leaf = "scale" if parts[2] == "weight" else "bias"
                _set(params, P + (f"{kind}_norm_{int(num) - 1}", leaf), value)


def convert_r50_msmformer_checkpoint(state_dict: Dict[str, np.ndarray]):
    """Convert a standard-backbone MeanShiftMaskFormer checkpoint (detectron2
    R50 + MSDeformAttnPixelDecoder + 3-level decoder, ref:
    configs/UOAIS_ResNet50.yaml key layout) to the flax tree of
    models.meta_arch.MeanShiftMaskFormerR50."""
    sd = {}
    for k, v in state_dict.items():
        sd[k[6:] if k.startswith("model.") else k] = v

    params: dict = {}
    batch_stats: dict = {}
    _convert_d2_resnet(sd, params, batch_stats)
    _convert_msdeformattn_pixel_decoder(sd, params)
    # the decoder keys are identical to the pretrained variant's
    pred = convert_msmformer_checkpoint(
        {k: v for k, v in sd.items() if k.startswith("sem_seg_head.predictor.")})
    params.update(pred["params"])
    return {"params": params, "batch_stats": batch_stats}


def convert_swin_checkpoint(state_dict: Dict[str, np.ndarray],
                            prefix: str = "backbone."):
    """Convert D2SwinTransformer keys (ref: modeling/backbone/swin.py; also
    matches the upstream microsoft/Swin-Transformer layout under 'backbone.')
    to the flax tree of models/swin.SwinTransformer.

      patch_embed.proj.{weight,bias}            -> patch_embed/{kernel,bias}
      patch_embed.norm.*                        -> patch_norm
      layers.{s}.blocks.{b}.norm1/norm2.*       -> stage{s}_block{b}/norm1|norm2
      layers.{s}.blocks.{b}.attn.qkv/proj.*     -> .../attn/qkv|proj
      layers.{s}.blocks.{b}.attn.relative_position_bias_table -> same name
      layers.{s}.blocks.{b}.mlp.fc1/fc2.*       -> .../mlp_fc1|mlp_fc2
      layers.{s}.downsample.reduction/norm.*    -> merge{s}/reduction|norm
      norm{s}.*                                 -> out_norm{s}
    (relative_position_index is a recomputed buffer and is skipped.)
    """
    params: dict = {}
    for key, value in state_dict.items():
        if key.startswith("model."):
            key = key[6:]
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        parts = rest.split(".")
        value = _np(value)
        if parts[0] == "patch_embed":
            if parts[1] == "proj":
                leaf = "kernel" if parts[2] == "weight" else "bias"
                v_ = _conv_kernel(value) if value.ndim == 4 else value
                _set(params, ("patch_embed", leaf), v_)
            elif parts[1] == "norm":
                leaf = "scale" if parts[2] == "weight" else "bias"
                _set(params, ("patch_norm", leaf), value)
        elif parts[0] == "layers":
            s = parts[1]
            if parts[2] == "blocks":
                b, mod = parts[3], parts[4]
                base = (f"stage{s}_block{b}",)
                if mod in ("norm1", "norm2"):
                    leaf = "scale" if parts[5] == "weight" else "bias"
                    _set(params, base + (mod, leaf), value)
                elif mod == "attn":
                    sub = parts[5]
                    if sub == "relative_position_bias_table":
                        _set(params, base + ("attn", sub), value)
                    elif sub == "relative_position_index":
                        continue
                    else:          # qkv | proj
                        leaf = "kernel" if parts[6] == "weight" else "bias"
                        v_ = value.T if leaf == "kernel" else value
                        _set(params, base + ("attn", sub, leaf), v_)
                elif mod == "mlp":
                    sub = "mlp_fc1" if parts[5] == "fc1" else "mlp_fc2"
                    leaf = "kernel" if parts[6] == "weight" else "bias"
                    v_ = value.T if leaf == "kernel" else value
                    _set(params, base + (sub, leaf), v_)
            elif parts[2] == "downsample":
                mod = parts[3]     # reduction | norm
                leaf_src = parts[4]
                if mod == "reduction":
                    leaf = "kernel" if leaf_src == "weight" else "bias"
                    v_ = value.T if leaf == "kernel" else value
                    _set(params, (f"merge{s}", "reduction", leaf), v_)
                else:
                    leaf = "scale" if leaf_src == "weight" else "bias"
                    _set(params, (f"merge{s}", "norm", leaf), value)
        elif parts[0].startswith("norm") and len(parts[0]) > 4:
            s = parts[0][4:]
            leaf = "scale" if parts[1] == "weight" else "bias"
            _set(params, (f"out_norm{s}", leaf), value)
    return {"params": params}


def convert_msmformer_checkpoint(state_dict: Dict[str, np.ndarray]):
    """Convert a detectron2 PretrainedMeanShiftMaskFormer checkpoint to the flax
    tree of models.meta_arch.MSMFormer.

    Key layout (ref: pretrained_meanshiftformer_model.py / meanshift_former_head.py
    / meanshiftformer_transformer_decoder.py):
      pretrained_backbone.fcn.resnet34_8s.*             -> params/pretrained_backbone/fcn/*
      sem_seg_head.pixel_decoder.mask_features.*        -> params/pixel_decoder/mask_features
      sem_seg_head.predictor.query_feat.weight          -> params/predictor/query_feat
      sem_seg_head.predictor.static_query.weight        -> (legacy) query_feat
      sem_seg_head.predictor.input_proj.L.weight        -> params/predictor/input_proj_L
      ...transformer_cross_attention_layers.i.meanshift_attn.in_proj_weight
                                                        -> q/k/v kernels (split thirds)
      ...transformer_ffn_layers.i.linear1/2             -> ffn_lin1_i / ffn_lin2_i
      class_embed / mask_embed.layers.j / decoder_norm  -> same names
    """
    params: dict = {}
    batch_stats: dict = {}

    backbone_sd = {}
    for k, v in state_dict.items():
        if k.startswith("model."):
            k = k[6:]
        if k.startswith("pretrained_backbone."):
            backbone_sd[k[len("pretrained_backbone."):]] = v
    if backbone_sd:
        bb = convert_ucn_checkpoint(backbone_sd)
        params["pretrained_backbone"] = bb["params"]
        batch_stats["pretrained_backbone"] = bb["batch_stats"]

    def put(path, value):
        _set(params, path, _np(value))

    for key, value in state_dict.items():
        if key.startswith("model."):
            key = key[6:]
        value = _np(value)
        if key == "sem_seg_head.pixel_decoder.mask_features.weight":
            put(("pixel_decoder", "mask_features", "kernel"), _conv_kernel(value))
        elif key == "sem_seg_head.pixel_decoder.mask_features.bias":
            put(("pixel_decoder", "mask_features", "bias"), value)
        elif not key.startswith("sem_seg_head.predictor."):
            continue

        rest = key[len("sem_seg_head.predictor."):] if key.startswith(
            "sem_seg_head.predictor.") else None
        if rest is None:
            continue
        parts = rest.split(".")
        P = ("predictor",)

        if parts[0] in ("query_feat", "query_embed", "level_embed", "static_query"):
            name = "query_feat" if parts[0] == "static_query" else parts[0]
            put(P + (name,), value)
        elif parts[0] == "input_proj":
            # nn.ModuleList of Conv2d (or empty Sequential)
            l = parts[1]
            leaf = "kernel" if parts[2] == "weight" else "bias"
            v_ = _conv_kernel(value) if value.ndim == 4 else value
            put(P + (f"input_proj_{l}", leaf), v_)
        elif parts[0] in ("transformer_cross_attention_layers",
                          "transformer_self_attention_layers"):
            i = parts[1]
            kind = "cross" if "cross" in parts[0] else "self"
            sub = parts[2]     # meanshift_attn | self_attn | multihead_attn | norm
            if sub == "norm":
                leaf = "scale" if parts[3] == "weight" else "bias"
                put(P + (f"{kind}_norm_{i}", leaf), value)
            else:
                mod = P + (f"{kind}_attn_{i}",)
                if parts[3] == "in_proj_weight":
                    qw, kw, vw = _split3(value)
                    put(mod + ("q_kernel",), qw.T)
                    put(mod + ("k_kernel",), kw.T)
                    put(mod + ("v_kernel",), vw.T)
                elif parts[3] == "in_proj_bias":
                    qb, kb, vb = _split3(value)
                    put(mod + ("q_bias",), qb)
                    put(mod + ("k_bias",), kb)
                    put(mod + ("v_bias",), vb)
                elif parts[3] == "out_proj":
                    if parts[4] == "weight":
                        put(mod + ("out_kernel",), value.T)
                    else:
                        put(mod + ("out_bias",), value)
        elif parts[0] == "transformer_ffn_layers":
            i = parts[1]
            if parts[2] == "norm":
                leaf = "scale" if parts[3] == "weight" else "bias"
                put(P + (f"ffn_norm_{i}", leaf), value)
            elif parts[2] in ("linear1", "linear2"):
                n = "ffn_lin1_" if parts[2] == "linear1" else "ffn_lin2_"
                leaf = "kernel" if parts[3] == "weight" else "bias"
                put(P + (n + str(i), leaf), value.T if leaf == "kernel" else value)
        elif parts[0] == "decoder_norm":
            leaf = "scale" if parts[1] == "weight" else "bias"
            put(P + ("decoder_norm", leaf), value)
        elif parts[0] == "class_embed":
            leaf = "kernel" if parts[1] == "weight" else "bias"
            put(P + ("class_embed", leaf), value.T if leaf == "kernel" else value)
        elif parts[0] == "mask_embed":
            j = parts[2]
            leaf = "kernel" if parts[3] == "weight" else "bias"
            put(P + ("mask_embed", f"layers_{j}", leaf),
                value.T if leaf == "kernel" else value)

    return {"params": params, "batch_stats": batch_stats}


def fuse_tower_params(tree: dict) -> dict:
    """Fuse a SEGNET two-tower subtree {fcn, fcn_depth} into the grouped
    single-stack layout (SEGNET.grouped_towers: one feature_group_count=2
    conv stack over channel-concatenated inputs).

    Exact by construction: a grouped conv's kernel is [kh, kw, in/groups,
    out_total] with the groups segregated along the output axis, so stacking
    each tower's kernel (and every per-channel BatchNorm leaf) on the last
    axis reproduces the two towers bit-for-bit. Works on params and
    batch_stats alike (both are per-tower trees of channel-last leaves).
    """
    import jax

    fused = jax.tree_util.tree_map(
        lambda a, b: np.concatenate([np.asarray(a), np.asarray(b)], axis=-1),
        tree["fcn"], tree["fcn_depth"])
    return {k: v for k, v in tree.items()
            if k not in ("fcn", "fcn_depth")} | {"fcn": fused}


def fuse_grouped_towers(variables):
    """Recursively fuse every {fcn, fcn_depth} pair in a variables pytree
    (params AND batch_stats) for use with cfg.backbone.grouped_towers=True.
    Checkpoints stay in the portable two-tower layout on disk; fusion happens
    at load time."""
    def walk(t):
        if isinstance(t, dict):
            if "fcn" in t and "fcn_depth" in t:
                t = fuse_tower_params(t)
            return {k: (v if k == "fcn" else walk(v)) for k, v in t.items()}
        return t

    return walk(variables)
