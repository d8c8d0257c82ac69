"""Checkpoint converters for the standard-backbone (R50/Swin) path:

- detectron2-style ResNet50 keys -> ResNetBackbone, validated numerically
  against a torch oracle of the d2 bottleneck (stride in the 1x1, Conv2d with
  attached .norm - ref: configs/UOAIS_ResNet50.yaml backbone)
- MSDeformAttnPixelDecoder keys: structural round-trip (flax params ->
  reference-layout state_dict -> converter -> identical tree); the op itself
  has a torch oracle in test_ms_deform_attn.py
- D2SwinTransformer keys -> SwinTransformer, validated numerically against a
  torch oracle of one Swin block (window attention with relative position
  bias + MLP - ref: modeling/backbone/swin.py)
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as TF

from unseenobjectswithmeanshift_tpu.models.backbone_resnet import ResNetBackbone
from unseenobjectswithmeanshift_tpu.models.swin import SwinBlock
from unseenobjectswithmeanshift_tpu.utils.checkpoint import (
    convert_r50_msmformer_checkpoint, convert_swin_checkpoint,
    _convert_d2_resnet,
)


# ---------------------------------------------------------------------------
# torch oracle: detectron2-style ResNet (stride_in_1x1, Conv2d.norm)
# ---------------------------------------------------------------------------

class D2Conv(tnn.Module):
    """Conv2d with an attached BatchNorm named .norm (d2's Conv2d + get_norm)."""

    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(cout, cin, k, k) * 0.05)
        self.norm = tnn.BatchNorm2d(cout)
        self.stride, self.padding = stride, padding

    def forward(self, x):
        return self.norm(TF.conv2d(x, self.weight, None, self.stride, self.padding))


class D2TorchBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, has_shortcut=False):
        super().__init__()
        self.conv1 = D2Conv(cin, planes, 1, stride=stride)   # stride in the 1x1
        self.conv2 = D2Conv(planes, planes, 3, padding=1)
        self.conv3 = D2Conv(planes, planes * 4, 1)
        self.shortcut = D2Conv(cin, planes * 4, 1, stride=stride) if has_shortcut else None

    def forward(self, x):
        r = x if self.shortcut is None else self.shortcut(x)
        out = torch.relu(self.conv1(x))
        out = torch.relu(self.conv2(out))
        return torch.relu(self.conv3(out) + r)


class D2TorchResNet50(tnn.Module):
    def __init__(self):
        super().__init__()
        stem = tnn.Module()
        stem.conv1 = D2Conv(3, 64, 7, stride=2, padding=3)
        self.stem = stem
        cin = 64
        for si, (planes, n) in enumerate(zip((64, 128, 256, 512), (3, 4, 6, 3))):
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and si > 0) else 1
                blocks.append(D2TorchBottleneck(
                    cin, planes, stride, has_shortcut=(b == 0)))
                cin = planes * 4
            setattr(self, f"res{si + 2}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = TF.max_pool2d(torch.relu(self.stem.conv1(x)), 3, 2, 1)
        outs = {}
        for si in range(4):
            x = getattr(self, f"res{si + 2}")(x)
            outs[f"res{si + 2}"] = x
        return outs


def _randomize_bn(module, rng):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(rng.randn(m.num_features)
                                                  .astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                (rng.rand(m.num_features) * 0.5 + 0.5).astype(np.float32)))
            m.weight.copy_(torch.from_numpy(rng.randn(m.num_features)
                                            .astype(np.float32) * 0.2 + 1))
            m.bias.copy_(torch.from_numpy(rng.randn(m.num_features)
                                          .astype(np.float32) * 0.1))


def test_d2_resnet50_converter_matches_torch_oracle(rng):
    torch.manual_seed(0)
    with torch.no_grad():
        oracle = D2TorchResNet50().eval()
        _randomize_bn(oracle, rng)
        x = rng.randn(1, 3, 64, 64).astype(np.float32)
        ref = oracle(torch.from_numpy(x))

    sd = {f"backbone.{k}": v for k, v in oracle.state_dict().items()}
    params, batch_stats = {}, {}
    _convert_d2_resnet(sd, params, batch_stats)
    variables = {"params": params["backbone"], "batch_stats": batch_stats["backbone"]}

    model = ResNetBackbone()
    out = model.apply(jax.tree.map(jnp.asarray, variables),
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    for k in ("res2", "res3", "res4", "res5"):
        # random-init activations grow to O(1000) by res5; elementwise rtol is
        # ill-conditioned near relu zero-crossings - compare against the
        # stage's dynamic range (a mapping bug produces O(1) relative errors)
        got = np.asarray(out[k]).transpose(0, 3, 1, 2)
        want = ref[k].numpy()
        scale = np.abs(want).max() + 1e-6
        assert np.abs(got - want).max() / scale < 1e-5, k


# ---------------------------------------------------------------------------
# MSDeformAttn pixel decoder + full meta-arch: structural round-trip
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def test_r50_checkpoint_roundtrip(rng):
    """Init the flax MeanShiftMaskFormerR50, emit a reference-layout
    state_dict from its params (inverse mapping), convert it back, and demand
    the identical tree - proves the converter covers every parameter with the
    right names/transposes."""
    from unseenobjectswithmeanshift_tpu.config import get_config
    from unseenobjectswithmeanshift_tpu.models.meta_arch import MeanShiftMaskFormerR50

    cfg = get_config("uoais_resnet50")
    cfg.decoder.hidden_dim = 32
    cfg.decoder.nheads = 4
    cfg.decoder.num_queries = 6
    cfg.decoder.dec_layers = 2
    cfg.decoder.dim_feedforward = 32
    cfg.decoder.mask_dim = 16
    cfg.decoder.conv_dim = 32
    cfg.pixel_decoder.conv_dim = 32
    cfg.pixel_decoder.mask_dim = 16
    cfg.pixel_decoder.transformer_enc_layers = 2
    model = MeanShiftMaskFormerR50(cfg=cfg)
    img = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), img)

    # inverse mapping: flax tree -> detectron2-style state_dict
    sd = {}
    for path, v in _flatten(variables["params"]).items():
        sd.update(_inverse_map(path, v, variables))
    for path, v in _flatten(variables["batch_stats"]).items():
        sd.update(_inverse_map_bn_stats(path, v))

    converted = convert_r50_msmformer_checkpoint(sd)
    got_p = _flatten(converted["params"])
    want_p = _flatten(jax.tree.map(np.asarray, variables["params"]))
    assert set(got_p) == set(want_p), (
        f"missing: {sorted(set(want_p) - set(got_p))[:5]} "
        f"extra: {sorted(set(got_p) - set(want_p))[:5]}")
    for k in want_p:
        np.testing.assert_allclose(got_p[k], want_p[k], atol=1e-6, err_msg=str(k))
    got_b = _flatten(converted["batch_stats"])
    want_b = _flatten(jax.tree.map(np.asarray, variables["batch_stats"]))
    assert set(got_b) == set(want_b)


def _inverse_map(path, v, variables):
    """flax param path -> {reference torch key: tensor} (weights only)."""
    p = list(map(str, path))
    t = torch.from_numpy(np.asarray(v, np.float32))

    def conv_w(x):
        return x.permute(3, 2, 0, 1)

    if p[0] == "backbone":
        name = p[1]
        if name == "stem_conv1":
            return {"backbone.stem.conv1.weight": conv_w(t)}
        if name == "stem_bn1":
            leaf = "weight" if p[2] == "scale" else "bias"
            return {f"backbone.stem.conv1.norm.{leaf}": t}
        stage, block = name.split("_")
        mod = p[2]
        if mod == "downsample_conv":
            return {f"backbone.{stage}.{block}.shortcut.weight": conv_w(t)}
        if mod == "downsample_bn":
            leaf = "weight" if p[3] == "scale" else "bias"
            return {f"backbone.{stage}.{block}.shortcut.norm.{leaf}": t}
        if mod.startswith("conv"):
            return {f"backbone.{stage}.{block}.{mod}.weight": conv_w(t)}
        if mod.startswith("bn"):
            leaf = "weight" if p[3] == "scale" else "bias"
            return {f"backbone.{stage}.{block}.{mod.replace('bn', 'conv')}"
                    f".norm.{leaf}": t}
    if p[0] == "pixel_decoder":
        P = "sem_seg_head.pixel_decoder."
        name = p[1]
        if name.startswith("input_proj_"):
            i = name.split("_")[-1]
            leaf = "weight" if p[2] == "kernel" else "bias"
            return {f"{P}input_proj.{i}.0.{leaf}": conv_w(t) if t.ndim == 4 else t}
        if name.startswith("input_norm_"):
            i = name.split("_")[-1]
            leaf = "weight" if p[2] == "scale" else "bias"
            return {f"{P}input_proj.{i}.1.{leaf}": t}
        if name == "level_embed":
            return {f"{P}transformer.level_embed": t}
        if name.startswith("encoder_layer_"):
            i = name.split("_")[-1]
            L = f"{P}transformer.encoder.layers.{i}."
            sub = p[2]
            if sub == "self_attn":
                leaf = "weight" if p[4] == "kernel" else "bias"
                return {f"{L}self_attn.{p[3]}.{leaf}": t.T if leaf == "weight" else t}
            if sub in ("norm1", "norm2"):
                leaf = "weight" if p[3] == "scale" else "bias"
                return {f"{L}{sub}.{leaf}": t}
            if sub in ("linear1", "linear2"):
                leaf = "weight" if p[3] == "kernel" else "bias"
                return {f"{L}{sub}.{leaf}": t.T if leaf == "weight" else t}
        if name == "mask_features":
            leaf = "weight" if p[2] == "kernel" else "bias"
            return {f"{P}mask_features.{leaf}": conv_w(t) if t.ndim == 4 else t}
        if name.startswith(("adapter_norm_", "layer_norm_")):
            kind, _, num = name.rsplit("_", 2)
            leaf = "weight" if p[2] == "scale" else "bias"
            return {f"{P}{kind}_{int(num) + 1}.norm.{leaf}": t}
        if name.startswith(("adapter_", "layer_")):
            kind, num = name.rsplit("_", 1)
            return {f"{P}{kind}_{int(num) + 1}.weight": conv_w(t)}
    if p[0] == "predictor":
        return _inverse_map_predictor(p, t)
    raise AssertionError(f"unmapped param path {path}")


def _inverse_map_predictor(p, t):
    P = "sem_seg_head.predictor."
    name = p[1]
    if name in ("query_feat", "query_embed", "level_embed"):
        return {f"{P}{name}.weight" if name != "level_embed" else
                f"{P}level_embed.weight": t}
    if name.startswith("input_proj_"):
        i = name.split("_")[-1]
        leaf = "weight" if p[2] == "kernel" else "bias"
        return {f"{P}input_proj.{i}.{leaf}": t.permute(3, 2, 0, 1)
                if t.ndim == 4 else t}
    if name.startswith(("cross_attn_", "self_attn_")):
        kind = "cross" if name.startswith("cross") else "self"
        i = name.split("_")[-1]
        L = (f"{P}transformer_{kind}_attention_layers.{i}."
             + ("meanshift_attn." if kind == "cross" else "self_attn."))
        leaf = p[2]
        # packed in_proj: emitted jointly when we see q_kernel (k/v fetched later)
        return {f"__attn__{kind}.{i}.{leaf}": t}
    if name.startswith(("cross_norm_", "self_norm_", "ffn_norm_")):
        kind = name.split("_")[0]
        i = name.split("_")[-1]
        mod = {"cross": "transformer_cross_attention_layers",
               "self": "transformer_self_attention_layers",
               "ffn": "transformer_ffn_layers"}[kind]
        leaf = "weight" if p[2] == "scale" else "bias"
        return {f"{P}{mod}.{i}.norm.{leaf}": t}
    if name.startswith("ffn_lin"):
        n = "linear1" if "lin1" in name else "linear2"
        i = name.split("_")[-1]
        leaf = "weight" if p[2] == "kernel" else "bias"
        return {f"{P}transformer_ffn_layers.{i}.{n}.{leaf}":
                t.T if leaf == "weight" else t}
    if name == "decoder_norm":
        leaf = "weight" if p[2] == "scale" else "bias"
        return {f"{P}decoder_norm.{leaf}": t}
    if name == "class_embed":
        leaf = "weight" if p[2] == "kernel" else "bias"
        return {f"{P}class_embed.{leaf}": t.T if leaf == "weight" else t}
    if name == "mask_embed":
        j = p[2].split("_")[-1]
        leaf = "weight" if p[3] == "kernel" else "bias"
        return {f"{P}mask_embed.layers.{j}.{leaf}": t.T if leaf == "weight" else t}
    raise AssertionError(f"unmapped predictor path {p}")


def _inverse_map_bn_stats(path, v):
    p = list(map(str, path))
    t = torch.from_numpy(np.asarray(v, np.float32))
    leaf = "running_mean" if p[-1] == "mean" else "running_var"
    if p[1] == "stem_bn1":
        return {f"backbone.stem.conv1.norm.{leaf}": t}
    stage, block = p[1].split("_")
    mod = p[2]
    conv = "shortcut" if mod == "downsample_bn" else mod.replace("bn", "conv")
    return {f"backbone.{stage}.{block}.{conv}.norm.{leaf}": t}


def _pack_attention(sd):
    """Combine the __attn__ placeholders into torch packed in_proj tensors."""
    import collections
    groups = collections.defaultdict(dict)
    out = {}
    for k, v in list(sd.items()):
        if k.startswith("__attn__"):
            _, rest = k.split("__attn__")
            kind_i, leaf = rest.rsplit(".", 1)
            groups[kind_i][leaf] = v
        else:
            out[k] = v
    P = "sem_seg_head.predictor."
    for kind_i, leaves in groups.items():
        kind, i = kind_i.split(".")
        mod = (f"{P}transformer_{kind}_attention_layers.{i}."
               + ("meanshift_attn" if kind == "cross" else "self_attn"))
        w = torch.cat([leaves["q_kernel"].T, leaves["k_kernel"].T,
                       leaves["v_kernel"].T], 0)
        b = torch.cat([leaves["q_bias"], leaves["k_bias"], leaves["v_bias"]], 0)
        out[f"{mod}.in_proj_weight"] = w
        out[f"{mod}.in_proj_bias"] = b
        out[f"{mod}.out_proj.weight"] = leaves["out_kernel"].T
        out[f"{mod}.out_proj.bias"] = leaves["out_bias"]
    return out


# patch the roundtrip test to pack attention placeholders
_orig_convert = convert_r50_msmformer_checkpoint


def convert_r50_msmformer_checkpoint(sd):  # noqa: F811 (test-local wrapper)
    return _orig_convert(_pack_attention(sd))


# ---------------------------------------------------------------------------
# torch oracle: one Swin block (window attention + relative position bias)
# ---------------------------------------------------------------------------

class TorchSwinBlock(tnn.Module):
    """Faithful torch re-statement of the reference SwinTransformerBlock
    (ref: modeling/backbone/swin.py WindowAttention/SwinTransformerBlock,
    shift 0, no drop-path)."""

    def __init__(self, dim, heads, ws):
        super().__init__()
        self.dim, self.heads, self.ws = dim, heads, ws
        self.norm1 = tnn.LayerNorm(dim)
        attn = tnn.Module()
        attn.qkv = tnn.Linear(dim, dim * 3)
        attn.proj = tnn.Linear(dim, dim)
        attn.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.2)
        self.attn = attn
        self.norm2 = tnn.LayerNorm(dim)
        mlp = tnn.Module()
        mlp.fc1 = tnn.Linear(dim, dim * 4)
        mlp.fc2 = tnn.Linear(dim * 4, dim)
        self.mlp = mlp
        coords = torch.stack(torch.meshgrid(torch.arange(ws), torch.arange(ws),
                                            indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.rel_idx = rel.sum(-1)

    def forward(self, x):
        """x: [B, H, W, C] with H, W multiples of ws."""
        B, H, W, C = x.shape
        ws, nh = self.ws, self.heads
        shortcut = x
        h = self.norm1(x)
        h = h.view(B, H // ws, ws, W // ws, ws, C).permute(0, 1, 3, 2, 4, 5)
        h = h.reshape(-1, ws * ws, C)
        B_, N, _ = h.shape
        qkv = self.attn.qkv(h).reshape(B_, N, 3, nh, C // nh).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (C // nh) ** -0.5
        bias = self.attn.relative_position_bias_table[self.rel_idx.view(-1)]
        bias = bias.view(N, N, nh).permute(2, 0, 1)
        attn = torch.softmax(attn + bias[None], -1)
        h = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        h = self.attn.proj(h)
        h = h.view(B, H // ws, W // ws, ws, ws, C).permute(0, 1, 3, 2, 4, 5)
        h = h.reshape(B, H, W, C)
        x = shortcut + h
        return x + self.mlp.fc2(TF.gelu(self.mlp.fc1(self.norm2(x))))


def test_swin_block_converter_matches_torch_oracle(rng):
    dim, heads, ws = 32, 4, 4
    torch.manual_seed(1)
    with torch.no_grad():
        oracle = TorchSwinBlock(dim, heads, ws).eval()
        x = rng.randn(2, 8, 8, dim).astype(np.float32) * 0.5
        ref = oracle(torch.from_numpy(x)).numpy()

    sd = {f"backbone.layers.0.blocks.0.{k}": v for k, v in oracle.state_dict().items()}
    variables = convert_swin_checkpoint(sd)
    params = variables["params"]["stage0_block0"]

    block = SwinBlock(dim=dim, num_heads=heads, window_size=ws, shift=0)
    out = block.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)
