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


LOG2E = 1.4426950408889634


def chunked_masked_meanshift_attention(params: MhaParams, query, key, value,
                                       num_heads: int, mask_logits,
                                       kappa: float = KAPPA,
                                       chunk_size: int = 8192,
                                       precision=jax.lax.Precision.HIGHEST):
    """Flash-style masked hypersphere attention for TRAINING at large K.

    The dense formulation holds [B, H, Q, K] attention weights (1.9 GB bf16 at
    the flagship 480x640 shapes) plus k/v projections per layer - the full-res
    train step exceeds HBM. This scans over K chunks with an online-max
    softmax (standard flash rescaling) and checkpoints the per-chunk body, so
    fwd+bwd memory is O(chunk) instead of O(K). Differentiable end to end; the
    attention mask (mask_logits < 0, all-masked-row guard, ref:
    meanshiftformer_transformer_decoder.py:970,1028-1033) is derived per chunk
    and detached like the reference.

    Unlike the inference kernel (ops/fused_cross_attention.py) this does NOT
    use the fixed-max exp2(c*s - c) trick: at random init all logits sit far
    below kappa, the fixed-max softmax sums are ~1e-20, and their backward
    produces ~1e+20-scale intermediates that overflow the optimizer's
    global-grad-norm computation to inf (observed: loss -> nan after the first
    update). The running max keeps den >= 1 and gradients well-conditioned;
    softmax shift invariance makes the result identical.

    query/key/value: [B, L, E]; mask_logits: [B, Q, K] raw (detached) logits.
    Returns out [B, Q, E] (no attention weights).
    """
    dt = query.dtype
    B, Q, E = query.shape
    K = key.shape[1]
    H = num_heads
    D = E // H
    proj = lambda x, w, b: (
        jnp.einsum("ble,ef->blf", x, w.astype(dt), precision=precision)
        + b.astype(dt))
    qn = l2_normalize(split_heads(proj(query, params.q_kernel, params.q_bias), H))

    c = kappa * LOG2E
    NEG = jnp.float32(-1e30)   # finite -inf sentinel: exp2(c*(s-NEG)) clamped below
    nc = -(-K // chunk_size)
    pad = nc * chunk_size - K
    if pad:
        key = jnp.pad(key, ((0, 0), (0, pad), (0, 0)))
        value = jnp.pad(value, ((0, 0), (0, pad), (0, 0)))
        # padded keys get mask_logit < 0 AND are excluded from the guard sums
        mask_logits = jnp.pad(mask_logits, ((0, 0), (0, 0), (0, pad)),
                              constant_values=-1.0)
    Kp = K + pad
    kx = key.reshape(B, nc, chunk_size, E).transpose(1, 0, 2, 3)
    vx = value.reshape(B, nc, chunk_size, E).transpose(1, 0, 2, 3)
    mx = mask_logits.reshape(B, Q, nc, chunk_size).transpose(2, 0, 1, 3)
    if pad:
        valid = (jnp.arange(Kp) < K).astype(jnp.float32)
        validx = jnp.broadcast_to(valid.reshape(nc, 1, 1, chunk_size),
                                  (nc, 1, 1, chunk_size))
    else:
        validx = jnp.ones((nc, 1, 1, 1), jnp.float32)

    def safe_normalize(x):
        # rsqrt-form normalize (the inference kernel's formula): finite
        # gradient at x == 0, unlike norm/max(norm, eps) whose backward is
        # 0/0 = nan there. The K padding appends all-zero keys and k_bias
        # initializes to zeros, so zero k rows DO occur; their weights are
        # zeroed but nan * 0 = nan would still poison dk.
        sq = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(sq + 1e-24)).astype(x.dtype)

    def body(carry, xs):
        accm, lm, mm, accu, lu, mu = carry
        k_c, v_c, m_c, valid_c = xs
        kh = safe_normalize(split_heads(proj(k_c, params.k_kernel,
                                             params.k_bias), H))   # [B,H,c,D]
        vh = split_heads(proj(v_c, params.v_kernel, params.v_bias), H)
        s = jnp.einsum("bhqd,bhkd->bhqk", qn, kh,
                       precision=precision).astype(jnp.float32)
        mask_f = (jax.lax.stop_gradient(m_c) >= 0).astype(jnp.float32)[:, None]
        valid_f = valid_c                                         # [1,1,c] bc
        su = jnp.where(valid_f > 0, s, NEG)
        sm = jnp.where(mask_f * valid_f > 0, s, NEG)
        # online max update + rescale (alpha <= 1 always; NEG-NEG -> alpha 1)
        mu_new = jnp.maximum(mu, jnp.max(su, axis=-1, keepdims=True))
        mm_new = jnp.maximum(mm, jnp.max(sm, axis=-1, keepdims=True))
        alpha_u = jnp.exp2(jnp.minimum(c * (mu - mu_new), 0.0))
        alpha_m = jnp.exp2(jnp.minimum(c * (mm - mm_new), 0.0))
        # p relative to the running max; exponent clamped <= 0 so the NEG
        # sentinel rows yield exactly 0 instead of inf*0
        p_u = jnp.exp2(jnp.minimum(c * (su - mu_new), 0.0)) * valid_f
        p_m = jnp.exp2(jnp.minimum(c * (sm - mm_new), 0.0)) * mask_f * valid_f
        # pv in the model dtype (matches the dense core's attn.astype(dt))
        accm = accm * alpha_m + jnp.einsum(
            "bhqk,bhkd->bhqd", p_m.astype(dt), vh,
            precision=precision).astype(jnp.float32)
        accu = accu * alpha_u + jnp.einsum(
            "bhqk,bhkd->bhqd", p_u.astype(dt), vh,
            precision=precision).astype(jnp.float32)
        lm = lm * alpha_m + jnp.sum(p_m, axis=-1, keepdims=True)
        lu = lu * alpha_u + jnp.sum(p_u, axis=-1, keepdims=True)
        return (accm, lm, mm_new, accu, lu, mu_new), None

    z = jnp.zeros((B, H, Q, D), jnp.float32)
    zl = jnp.zeros((B, H, Q, 1), jnp.float32)
    zm = jnp.full((B, H, Q, 1), NEG)
    (accm, lm, _, accu, lu, _), _ = jax.lax.scan(
        jax.checkpoint(body), (z, zl, zm, z, zl, zm), (kx, vx, mx, validx))

    guard = lm <= 0.0          # all keys masked -> attend to everything
    num = jnp.where(guard, accu, accm)
    den = jnp.where(guard, lu, lm)
    out = (num / jnp.maximum(den, 1e-30)).astype(dt)
    out = merge_heads(l2_normalize(out))
    return proj(out, params.out_kernel, params.out_bias)


def chunked_masked_meanshift_attention_twopass(
        params: MhaParams, query, key, value, num_heads: int, mask_logits,
        kappa: float = KAPPA, chunk_size: int = 8192,
        precision=jax.lax.Precision.HIGHEST):
    """Two-pass variant of the chunked TRAINING attention (same math).

    The online-softmax version above carries SIX accumulators (masked and
    unmasked num/den/max) and differentiates through the rescale chain, so
    its backward recomputes the double accumulation per chunk. This variant
    restructures for the backward pass:

      * the all-masked-row guard (ref: transformer decoder's degenerate-mask
        handling, meanshiftformer_transformer_decoder.py:970) is resolved
        UP FRONT from the detached mask_logits - each row then has ONE
        effective mask, so the scan carries a single num/den pair and pays
        one pv matmul per chunk instead of two;
      * pass 1 computes the global row max under lax.stop_gradient (softmax
        is shift-invariant: the max carries no gradient) with no v-side
        work at all;
      * pass 2 accumulates num = sum exp2(c(s-M)) v and den = sum exp2(...)
        against the FIXED max - plain sums, no inter-chunk rescale, so the
        checkpointed backward of each chunk is independent of the others.

    den stays differentiable (its cotangent is the softmax normalization
    term), making the gradient exact, not an approximation. Outputs match
    chunked_masked_meanshift_attention to fp32 roundoff (tested in
    tests/test_hypersphere_attention.py).
    """
    dt = query.dtype
    B, Q, E = query.shape
    K = key.shape[1]
    H = num_heads
    D = E // H
    proj = lambda x, w, b: (
        jnp.einsum("ble,ef->blf", x, w.astype(dt), precision=precision)
        + b.astype(dt))
    qn = l2_normalize(split_heads(proj(query, params.q_kernel, params.q_bias), H))

    c = kappa * LOG2E
    NEG = jnp.float32(-1e30)
    nc = -(-K // chunk_size)
    pad = nc * chunk_size - K
    if pad:
        key = jnp.pad(key, ((0, 0), (0, pad), (0, 0)))
        value = jnp.pad(value, ((0, 0), (0, pad), (0, 0)))
        mask_logits = jnp.pad(mask_logits, ((0, 0), (0, 0), (0, pad)),
                              constant_values=-1.0)
    Kp = K + pad
    kx = key.reshape(B, nc, chunk_size, E).transpose(1, 0, 2, 3)
    vx = value.reshape(B, nc, chunk_size, E).transpose(1, 0, 2, 3)
    valid = (jnp.arange(Kp) < K) if pad else jnp.ones((Kp,), bool)
    # guard resolved up front: rows with NO valid unmasked key attend to
    # every valid key (exactly the online version's lm <= 0 selector)
    ml = jax.lax.stop_gradient(mask_logits)
    keep = (ml >= 0) & valid                                   # [B, Q, Kp]
    guard = ~jnp.any(keep, axis=-1, keepdims=True)             # [B, Q, 1]
    eff = jnp.where(guard, valid[None, None, :], keep)         # [B, Q, Kp]
    effx = eff.reshape(B, Q, nc, chunk_size).transpose(2, 0, 1, 3)

    def safe_normalize(x):
        sq = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(sq + 1e-24)).astype(x.dtype)

    def kh_of(k_c):
        return safe_normalize(split_heads(proj(k_c, params.k_kernel,
                                               params.k_bias), H))

    # ---- pass 1: global effective-row max, no gradient, no v work
    def max_body(m, xs):
        k_c, e_c = xs
        s = jnp.einsum("bhqd,bhkd->bhqk", qn, kh_of(k_c),
                       precision=precision).astype(jnp.float32)
        s = jnp.where(e_c[:, None], s, NEG)
        return jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True)), None

    m0 = jnp.full((B, H, Q, 1), NEG)
    M, _ = jax.lax.scan(max_body, m0,
                        (jax.lax.stop_gradient(kx), effx))
    M = jax.lax.stop_gradient(M)

    # ---- pass 2: plain sums against the fixed max (differentiable)
    def body(carry, xs):
        num, den = carry
        k_c, v_c, e_c = xs
        kh = kh_of(k_c)
        vh = split_heads(proj(v_c, params.v_kernel, params.v_bias), H)
        s = jnp.einsum("bhqd,bhkd->bhqk", qn, kh,
                       precision=precision).astype(jnp.float32)
        # no min-clamp: s <= M holds bitwise for effective lanes (pass 1
        # computes the identical einsum), and a minimum(x, 0) clamp would
        # tie at the argmax lane where JAX splits the gradient 0.5/0.5 -
        # the where-form keeps the softmax gradient exact
        p = jnp.where(e_c[:, None], jnp.exp2(c * (s - M)), 0.0)
        num = num + jnp.einsum("bhqk,bhkd->bhqd", p.astype(dt), vh,
                               precision=precision).astype(jnp.float32)
        den = den + jnp.sum(p, axis=-1, keepdims=True)
        return (num, den), None

    z = jnp.zeros((B, H, Q, D), jnp.float32)
    zl = jnp.zeros((B, H, Q, 1), jnp.float32)
    (num, den), _ = jax.lax.scan(jax.checkpoint(body), (z, zl),
                                 (kx, vx, effx))
    out = (num / jnp.maximum(den, 1e-30)).astype(dt)
    out = merge_heads(l2_normalize(out))
    return proj(out, params.out_kernel, params.out_bias)
