"""Hypersphere attention validated against a torch oracle written directly from the
math: normalize(q,k per head) -> softmax(kappa qk^T + mask) -> normalize(out),
with packed in/out projections (the semantics of attention_util.py)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from unseenobjectswithmeanshift_tpu.ops.hypersphere_attention import (
    MhaParams, meanshift_attention, hypersphere_attention_core,
    bool_mask_to_bias, split_heads,
)


def torch_meanshift_mha(query, key, value, wq, wk, wv, bq, bk, bv, wo, bo,
                        num_heads, kappa=30.0, attn_mask_bool=None):
    """Oracle: batch-first [B, L, E]; weights torch layout [out, in]."""
    B, Lq, E = query.shape
    Lk = key.shape[1]
    H = num_heads
    Dh = E // H
    q = TF.linear(query, wq, bq)
    k = TF.linear(key, wk, bk)
    v = TF.linear(value, wv, bv)

    def heads(t, L):
        return t.reshape(B, L, H, Dh).permute(0, 2, 1, 3)

    q, k, v = heads(q, Lq), heads(k, Lk), heads(v, Lk)
    q = TF.normalize(q, p=2, dim=-1)
    k = TF.normalize(k, p=2, dim=-1)
    logits = kappa * torch.einsum("bhqd,bhkd->bhqk", q, k)
    if attn_mask_bool is not None:
        m = attn_mask_bool[:, None]  # [B,1,Lq,Lk]
        # degenerate-row guard (decoder loop, :970): fully masked rows unmask
        all_masked = m.all(dim=-1, keepdim=True)
        m = m & ~all_masked
        logits = logits.masked_fill(m, float("-inf"))
    attn = torch.softmax(logits, dim=-1)
    out = torch.einsum("bhqk,bhkd->bhqd", attn, v)
    out = TF.normalize(out, p=2, dim=-1)
    out = out.permute(0, 2, 1, 3).reshape(B, Lq, E)
    return TF.linear(out, wo, bo), attn.mean(dim=1)


def make_params(rng, E):
    ws = [rng.randn(E, E).astype(np.float32) * 0.1 for _ in range(4)]
    bs = [rng.randn(E).astype(np.float32) * 0.1 for _ in range(4)]
    return ws, bs


def test_attention_matches_torch_oracle(rng):
    B, Lq, Lk, E, H = 2, 10, 33, 32, 4
    ws, bs = make_params(rng, E)
    q = rng.randn(B, Lq, E).astype(np.float32)
    k = rng.randn(B, Lk, E).astype(np.float32)
    v = rng.randn(B, Lk, E).astype(np.float32)

    ref_out, ref_attn = torch_meanshift_mha(
        *(torch.from_numpy(t) for t in (q, k, v)),
        *(torch.from_numpy(w) for w in ws[:3]),
        *(torch.from_numpy(b) for b in bs[:3]),
        torch.from_numpy(ws[3]), torch.from_numpy(bs[3]), H)

    params = MhaParams(
        q_kernel=jnp.asarray(ws[0].T), k_kernel=jnp.asarray(ws[1].T),
        v_kernel=jnp.asarray(ws[2].T),
        q_bias=jnp.asarray(bs[0]), k_bias=jnp.asarray(bs[1]), v_bias=jnp.asarray(bs[2]),
        out_kernel=jnp.asarray(ws[3].T), out_bias=jnp.asarray(bs[3]))
    out, attn = meanshift_attention(params, jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), num_heads=H)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(attn), ref_attn.numpy(), atol=2e-5)


def test_attention_with_bool_mask_matches_oracle(rng):
    B, Lq, Lk, E, H = 1, 6, 20, 16, 2
    ws, bs = make_params(rng, E)
    q = rng.randn(B, Lq, E).astype(np.float32)
    k = rng.randn(B, Lk, E).astype(np.float32)
    v = rng.randn(B, Lk, E).astype(np.float32)
    mask = rng.rand(B, Lq, Lk) > 0.5
    mask[0, 3, :] = True  # fully-masked row, must trigger the guard

    ref_out, _ = torch_meanshift_mha(
        *(torch.from_numpy(t) for t in (q, k, v)),
        *(torch.from_numpy(w) for w in ws[:3]),
        *(torch.from_numpy(b) for b in bs[:3]),
        torch.from_numpy(ws[3]), torch.from_numpy(bs[3]), H,
        attn_mask_bool=torch.from_numpy(mask))

    params = MhaParams(
        q_kernel=jnp.asarray(ws[0].T), k_kernel=jnp.asarray(ws[1].T),
        v_kernel=jnp.asarray(ws[2].T),
        q_bias=jnp.asarray(bs[0]), k_bias=jnp.asarray(bs[1]), v_bias=jnp.asarray(bs[2]),
        out_kernel=jnp.asarray(ws[3].T), out_bias=jnp.asarray(bs[3]))
    bias = bool_mask_to_bias(jnp.asarray(mask))
    out, _ = meanshift_attention(params, jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), num_heads=H, mask_bias=bias)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=2e-5)


def test_core_output_is_unit_norm(rng):
    q = jnp.asarray(rng.randn(1, 2, 5, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 9, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 9, 8).astype(np.float32))
    out, attn = hypersphere_attention_core(q, k, v)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, atol=1e-5)


def test_chunked_masked_attention_matches_dense(rng):
    """Chunked online-softmax attention == dense masked attention (values and
    gradients), including all-masked-row guard and K padding."""
    import jax
    from unseenobjectswithmeanshift_tpu.ops.hypersphere_attention import (
        MhaParams, meanshift_attention, chunked_masked_meanshift_attention,
        bool_mask_to_bias,
    )

    B, Q, K, E, H = 2, 6, 700, 32, 4   # K not a multiple of the chunk size
    p = MhaParams(*[jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
                    for s in [(E, E)] * 3 + [(E,)] * 3 + [(E, E), (E,)]])
    # zero k-bias: padded zero keys then project to exactly zero vectors,
    # which must NOT poison gradients (l2-normalize at 0 has a nan backward
    # in the norm/max formulation - the chunked path uses rsqrt)
    p = p._replace(k_bias=jnp.zeros((E,)))
    q = jnp.asarray(rng.randn(B, Q, E).astype(np.float32))
    k = jnp.asarray(rng.randn(B, K, E).astype(np.float32))
    v = jnp.asarray(rng.randn(B, K, E).astype(np.float32))
    ml = jnp.asarray(rng.randn(B, Q, K).astype(np.float32))
    ml = ml.at[0, 0].set(-1.0)          # one fully-masked row -> guard path

    dense, _ = meanshift_attention(p, q, k, v, H,
                                   mask_bias=bool_mask_to_bias(ml < 0))
    chunked = chunked_masked_meanshift_attention(p, q, k, v, H, ml,
                                                 chunk_size=256)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                               rtol=1e-4, atol=1e-4)

    # gradients w.r.t. inputs and params agree
    gd = jax.grad(lambda k_, v_: jnp.sum(meanshift_attention(
        p, q, k_, v_, H, mask_bias=bool_mask_to_bias(ml < 0))[0] ** 2),
        argnums=(0, 1))(k, v)
    gc = jax.grad(lambda k_, v_: jnp.sum(chunked_masked_meanshift_attention(
        p, q, k_, v_, H, ml, chunk_size=256) ** 2), argnums=(0, 1))(k, v)
    for a, b in zip(gc, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_twopass_matches_online_chunked(rng):
    """Two-pass fixed-max chunked attention == online-softmax chunked
    attention (values AND gradients w.r.t. q, k, v, and params), including
    the all-masked-row guard and K padding."""
    import jax
    from unseenobjectswithmeanshift_tpu.ops.hypersphere_attention import (
        MhaParams, chunked_masked_meanshift_attention,
        chunked_masked_meanshift_attention_twopass,
    )

    B, Q, K, E, H = 2, 6, 700, 32, 4
    p = MhaParams(*[jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
                    for s in [(E, E)] * 3 + [(E,)] * 3 + [(E, E), (E,)]])
    p = p._replace(k_bias=jnp.zeros((E,)))
    q = jnp.asarray(rng.randn(B, Q, E).astype(np.float32))
    k = jnp.asarray(rng.randn(B, K, E).astype(np.float32))
    v = jnp.asarray(rng.randn(B, K, E).astype(np.float32))
    ml = jnp.asarray(rng.randn(B, Q, K).astype(np.float32))
    ml = ml.at[0, 0].set(-1.0)          # fully-masked row -> guard path

    a = chunked_masked_meanshift_attention(p, q, k, v, H, ml, chunk_size=256)
    b = chunked_masked_meanshift_attention_twopass(p, q, k, v, H, ml,
                                                   chunk_size=256)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-4, atol=1e-4)

    def loss(fn):
        return lambda p_, q_, k_, v_: jnp.sum(
            fn(p_, q_, k_, v_, H, ml, chunk_size=256) ** 2)

    ga = jax.grad(loss(chunked_masked_meanshift_attention),
                  argnums=(0, 1, 2, 3))(p, q, k, v)
    gb = jax.grad(loss(chunked_masked_meanshift_attention_twopass),
                  argnums=(0, 1, 2, 3))(p, q, k, v)
    for ta, tb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(tb), np.asarray(ta),
                                   rtol=1e-3, atol=1e-4)
