"""Hypersphere (von Mises-Fisher mean-shift) attention - the core op of MSMFormer.

One differentiable mean-shift step of the object queries ("cluster centers"):
    q, k <- L2-normalize per head
    attn = softmax(kappa * q k^T + mask)
    out  = L2-normalize(attn v) per head
followed by the standard in/out projections of multi-head attention.

Ref: MSMFormer/meanshiftformer/modeling/transformer_decoder/attention_util.py:
- hypersphere_attention (:30-82): the normalized-softmax-normalized core, kappa=30
- hypersphere_attention_forward (:198-432): packed qkv projection, bool attn masks
  become additive -inf, attention weights averaged over heads.

This module holds the pure-JAX formulation (also the oracle for the fused Pallas
kernel in pallas_attention.py). Batch-first layout [B, L, E]; masks are either
bool [B, Lq, Lk] (True = may NOT attend, torch convention) or float bias.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

KAPPA = 30.0  # attention_util.py:26

_NEG_INF = -1e30


def l2_normalize(x, axis=-1, eps=1e-12):
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps).astype(x.dtype)


class MhaParams(NamedTuple):
    """Projection parameters, flax layout (kernel [in, out])."""

    q_kernel: jax.Array   # [E, E]
    k_kernel: jax.Array
    v_kernel: jax.Array
    q_bias: jax.Array     # [E]
    k_bias: jax.Array
    v_bias: jax.Array
    out_kernel: jax.Array  # [E, E]
    out_bias: jax.Array


def split_heads(x, num_heads):
    b, l, e = x.shape
    return x.reshape(b, l, num_heads, e // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def hypersphere_attention_core(q, k, v, kappa: float = KAPPA,
                               mask_bias: Optional[jax.Array] = None,
                               precision=jax.lax.Precision.HIGHEST):
    """Core op on per-head tensors q,k,v: [B, H, L, Dh].

    mask_bias: additive float bias broadcastable to [B, H, Lq, Lk] (0 or -inf).
    Softmax runs in fp32 for stability regardless of input dtype.
    """
    dt = q.dtype
    qn = l2_normalize(q)
    kn = l2_normalize(k)
    logits = kappa * jnp.einsum("bhqd,bhkd->bhqk", qn, kn, precision=precision)
    logits = logits.astype(jnp.float32)
    if mask_bias is not None:
        logits = logits + mask_bias
    attn = jax.nn.softmax(logits, axis=-1).astype(dt)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, precision=precision)
    return l2_normalize(out), attn


def bool_mask_to_bias(attn_mask_bool, guard_all_masked: bool = True):
    """Convert torch-style bool mask (True = masked) [B, Lq, Lk] to an additive
    fp32 bias [B, 1, Lq, Lk]; optionally un-mask rows that are fully masked
    (the decoder's degenerate-mask guard,
    ref: meanshiftformer_transformer_decoder.py:970)."""
    if guard_all_masked:
        all_masked = jnp.all(attn_mask_bool, axis=-1, keepdims=True)
        attn_mask_bool = jnp.where(all_masked, False, attn_mask_bool)
    bias = jnp.where(attn_mask_bool, _NEG_INF, 0.0).astype(jnp.float32)
    return bias[:, None, :, :]


def meanshift_attention(params: MhaParams, query, key, value, num_heads: int,
                        kappa: float = KAPPA, mask_bias=None,
                        precision=jax.lax.Precision.HIGHEST):
    """Full MeanShiftAttention forward (batch-first [B, L, E]).

    Ref: attention_util.py hypersphere_attention_forward:198-432 with packed
    projections; num_heads follows cfg MODEL.MASK_FORMER.NHEADS (8 in the shipped
    configs).
    """
    dt = query.dtype
    proj = lambda x, w, b: (
        jnp.einsum("ble,ef->blf", x, w.astype(dt), precision=precision) + b.astype(dt))
    q = proj(query, params.q_kernel, params.q_bias)
    k = proj(key, params.k_kernel, params.k_bias)
    v = proj(value, params.v_kernel, params.v_bias)

    q, k, v = (split_heads(t, num_heads) for t in (q, k, v))
    out, attn = hypersphere_attention_core(q, k, v, kappa, mask_bias, precision)
    out = merge_heads(out)
    out = proj(out, params.out_kernel, params.out_bias)
    # average attention weights over heads (need_weights path, :427-430)
    return out, attn.mean(axis=1)
