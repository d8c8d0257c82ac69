"""Decoder parity: a torch oracle of the full PretrainedMeanShiftTransformerDecoder
semantics (sine PE, input proj + level embed, hypersphere cross/self attention
with the <0.5-sigmoid mask feedback and all-masked-row guard, post-norm FFN,
decoder_block_norm, per-layer prediction heads) is randomly initialized, exported
with detectron2-style keys, converted, and the flax decoder must reproduce every
output head."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as TF

from unseenobjectswithmeanshift_tpu.models.decoder import MeanShiftDecoder
from unseenobjectswithmeanshift_tpu.models.position_encoding import position_embedding_sine
from unseenobjectswithmeanshift_tpu.utils.checkpoint import convert_msmformer_checkpoint


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------

def torch_sine_pe(h, w, num_pos_feats, scale=2 * math.pi, temperature=10000.0):
    y = torch.arange(1, h + 1, dtype=torch.float32)[:, None].expand(h, w).clone()
    x = torch.arange(1, w + 1, dtype=torch.float32)[None, :].expand(h, w).clone()
    eps = 1e-6
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = torch.stack((px[:, :, 0::2].sin(), px[:, :, 1::2].cos()), dim=3).flatten(2)
    py = torch.stack((py[:, :, 0::2].sin(), py[:, :, 1::2].cos()), dim=3).flatten(2)
    return torch.cat((py, px), dim=2)  # [H, W, 2*npf]


def hypersphere_mha(q, k, v, attn, kappa=30.0, attn_mask=None):
    """q,k,v: [B, L, E] batch-first; attn: torch MultiheadAttention module."""
    B, Lq, E = q.shape
    H = attn.num_heads
    D = E // H
    w = attn.in_proj_weight
    b = attn.in_proj_bias
    qp = TF.linear(q, w[:E], b[:E])
    kp = TF.linear(k, w[E:2 * E], b[E:2 * E])
    vp = TF.linear(v, w[2 * E:], b[2 * E:])
    heads = lambda t: t.reshape(B, -1, H, D).permute(0, 2, 1, 3)
    qp, kp, vp = heads(qp), heads(kp), heads(vp)
    qp = TF.normalize(qp, p=2, dim=-1)
    kp = TF.normalize(kp, p=2, dim=-1)
    logits = kappa * torch.einsum("bhqd,bhkd->bhqk", qp, kp)
    if attn_mask is not None:
        logits = logits.masked_fill(attn_mask[:, None], float("-inf"))
    a = torch.softmax(logits, dim=-1)
    out = torch.einsum("bhqk,bhkd->bhqd", a, vp)
    out = TF.normalize(out, p=2, dim=-1)
    out = out.permute(0, 2, 1, 3).reshape(B, Lq, E)
    return TF.linear(out, attn.out_proj.weight, attn.out_proj.bias)


class TorchDecoderOracle(tnn.Module):
    def __init__(self, E, nheads, Q, layers, mask_dim, in_ch, ffn, num_classes):
        super().__init__()
        self.E, self.H, self.Q, self.L = E, nheads, Q, layers
        self.query_feat = tnn.Embedding(Q, E)
        self.query_embed = tnn.Embedding(Q, E)
        self.level_embed = tnn.Embedding(1, E)
        self.input_proj = tnn.ModuleList([tnn.Conv2d(in_ch, E, 1)])
        self.transformer_cross_attention_layers = tnn.ModuleList()
        self.transformer_self_attention_layers = tnn.ModuleList()
        self.transformer_ffn_layers = tnn.ModuleList()
        for _ in range(layers):
            ca = tnn.Module()
            ca.meanshift_attn = tnn.MultiheadAttention(E, nheads)
            ca.norm = tnn.LayerNorm(E)
            self.transformer_cross_attention_layers.append(ca)
            sa = tnn.Module()
            sa.self_attn = tnn.MultiheadAttention(E, nheads)
            sa.norm = tnn.LayerNorm(E)
            self.transformer_self_attention_layers.append(sa)
            ff = tnn.Module()
            ff.linear1 = tnn.Linear(E, ffn)
            ff.linear2 = tnn.Linear(ffn, E)
            ff.norm = tnn.LayerNorm(E)
            self.transformer_ffn_layers.append(ff)
        self.decoder_norm = tnn.LayerNorm(E)
        self.class_embed = tnn.Linear(E, num_classes + 1)
        me = tnn.Module()
        me.layers = tnn.ModuleList([tnn.Linear(E, E), tnn.Linear(E, E),
                                    tnn.Linear(E, mask_dim)])
        self.mask_embed = me

    def heads(self, output, mask_features):
        d = self.decoder_norm(output)
        cls = self.class_embed(d)
        me = d
        for j, lin in enumerate(self.mask_embed.layers):
            me = lin(me)
            if j < 2:
                me = torch.relu(me)
        masks = torch.einsum("bqc,bchw->bqhw", me, mask_features)
        # same-size interpolation is identity; sigmoid < 0.5 <=> logits < 0
        attn_mask = (masks.sigmoid().flatten(2) < 0.5)
        return cls, masks, attn_mask

    def forward(self, x, mask_features):
        """x: [B, in_ch, h, w]; mask_features: [B, mask_dim, h, w]."""
        B, _, h, w = x.shape
        pos = torch_sine_pe(h, w, self.E // 2).reshape(h * w, self.E)[None]
        src = self.input_proj[0](x).flatten(2).permute(0, 2, 1) \
            + self.level_embed.weight[0]
        output = self.query_feat.weight[None].expand(B, -1, -1)
        qpos = self.query_embed.weight[None].expand(B, -1, -1)

        out_cls, out_masks = [], []
        cls, masks, attn_mask = self.heads(output, mask_features)
        out_cls.append(cls); out_masks.append(masks)
        for i in range(self.L):
            # degenerate-row guard (ref :970)
            full = attn_mask.sum(-1) == attn_mask.shape[-1]
            attn_mask = attn_mask & ~full[..., None]
            output = self.transformer_cross_attention_layers[i].norm(
                output + hypersphere_mha(
                    output + qpos, src + pos, src,
                    self.transformer_cross_attention_layers[i].meanshift_attn,
                    attn_mask=attn_mask))
            qk = output + qpos
            output = self.transformer_self_attention_layers[i].norm(
                output + hypersphere_mha(
                    qk, qk, output,
                    self.transformer_self_attention_layers[i].self_attn))
            ff = self.transformer_ffn_layers[i]
            output = ff.norm(output + ff.linear2(torch.relu(ff.linear1(output))))
            output = TF.normalize(output, p=2, dim=-1)   # decoder_block_norm
            cls, masks, attn_mask = self.heads(output, mask_features)
            out_cls.append(cls); out_masks.append(masks)
        return out_cls, out_masks


def test_position_encoding_matches_torch():
    pe = np.asarray(position_embedding_sine(7, 9, 16))
    ref = torch_sine_pe(7, 9, 16).numpy()
    np.testing.assert_allclose(pe, ref, atol=1e-6)


def test_decoder_matches_torch_oracle(rng):
    E, H, Q, L, MD, IC, FF, NC = 32, 4, 6, 2, 24, 16, 48, 2
    h = w = 12
    torch.manual_seed(0)
    with torch.no_grad():
        oracle = TorchDecoderOracle(E, H, Q, L, MD, IC, FF, NC).eval()
        x = rng.randn(1, IC, h, w).astype(np.float32)
        mf = rng.randn(1, MD, h, w).astype(np.float32)
        ref_cls, ref_masks = oracle(torch.from_numpy(x), torch.from_numpy(mf))

    # export with detectron2-style keys
    sd = {f"sem_seg_head.predictor.{k}": v for k, v in oracle.state_dict().items()}
    variables = convert_msmformer_checkpoint(sd)

    dec = MeanShiftDecoder(num_classes=NC, hidden_dim=E, num_queries=Q, nheads=H,
                           dim_feedforward=FF, dec_layers=L, mask_dim=MD,
                           in_channels=IC, num_feature_levels=1)
    out = dec.apply({"params": variables["params"]["predictor"]},
                    [jnp.asarray(x.transpose(0, 2, 3, 1))],
                    jnp.asarray(mf.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(np.asarray(out["pred_logits"]),
                               ref_cls[-1].numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["pred_masks"]),
                               ref_masks[-1].numpy(), atol=5e-3)
    for a, (rc, rm) in zip(out["aux_outputs"], zip(ref_cls[:-1], ref_masks[:-1])):
        np.testing.assert_allclose(np.asarray(a["pred_logits"]), rc.numpy(), atol=5e-4)
        np.testing.assert_allclose(np.asarray(a["pred_masks"]), rm.numpy(), atol=5e-3)
