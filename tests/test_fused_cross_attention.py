"""The fully-fused cross-attention kernel (interpret mode) against its pure-JAX
oracle and against the decoder-math composition it replaces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unseenobjectswithmeanshift_tpu.ops.fused_cross_attention import (
    fused_uoms_cross_attention, fused_uoms_cross_attention_reference,
)


def make_inputs(rng, B=2, H=4, Q=10, D=8, K=100, C=16, Cm=24, decisive=3.0):
    E = H * D
    qn = rng.randn(B, H, Q, D).astype(np.float32)
    qn /= np.linalg.norm(qn, axis=-1, keepdims=True)
    feat = rng.randn(B, C, K).astype(np.float32) * 0.3   # K-minor
    mf = rng.randn(B, Cm, K).astype(np.float32) * 0.3    # K-minor
    # decisive mask logits (away from 0) so binarization is fp-robust
    me = rng.randn(B, Q, Cm).astype(np.float32) * decisive
    pos = rng.randn(E, K).astype(np.float32) * 0.3       # K-minor
    awk = rng.randn(C, E).astype(np.float32) * 0.2
    awv = rng.randn(C, E).astype(np.float32) * 0.2
    wk = rng.randn(E, E).astype(np.float32) * 0.1
    ck = rng.randn(E).astype(np.float32) * 0.1
    cv = rng.randn(E).astype(np.float32) * 0.1
    return [jnp.asarray(x) for x in (qn, feat, mf, me, pos, awk, awv, wk, ck, cv)]


def test_matches_reference(rng):
    args = make_inputs(rng)
    out = fused_uoms_cross_attention(*args, kappa=30.0, block_k=32, block_b=2,
                                     interpret=True)
    ref = fused_uoms_cross_attention_reference(*args, kappa=30.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_batch_chunking_and_padding(rng):
    # B=3 with block_b=2 exercises batch padding; K=90 with block_k=32 pads keys;
    # Q=5 pads queries
    args = make_inputs(rng, B=3, Q=5, K=90)
    out = fused_uoms_cross_attention(*args, kappa=20.0, block_k=32, block_b=2,
                                     interpret=True)
    ref = fused_uoms_cross_attention_reference(*args, kappa=20.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_all_masked_row_guard(rng):
    """Queries whose mask removes every key must attend to everything
    (ref: meanshiftformer_transformer_decoder.py:970)."""
    args = make_inputs(rng)
    B, Q, Cm = 2, 10, 24
    me = np.asarray(args[3]).copy()
    mf = np.asarray(args[2]).copy()
    # deterministic all-masked construction: channel 0 of image 0's mask
    # features is strictly positive, and query 0 weights ONLY that channel
    # negatively -> me . mf < 0 for every key
    mf[0, 0, :] = np.abs(mf[0, 0, :]) + 0.1
    me[0, 0, :] = 0.0
    me[0, 0, 0] = -5.0
    assert (me[0, 0] @ mf[0] < 0).all()
    args[2] = jnp.asarray(mf)
    args[3] = jnp.asarray(me)
    out = fused_uoms_cross_attention(*args, block_k=32, interpret=True)
    ref = fused_uoms_cross_attention_reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # and the guarded row equals unmasked attention
    args_unmasked = list(args)
    me2 = np.asarray(args[3]).copy()
    me2[0, 0, 0] = 5.0                  # attend everywhere explicitly
    args_unmasked[3] = jnp.asarray(me2)
    ref_u = fused_uoms_cross_attention_reference(*args_unmasked)
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], np.asarray(ref_u)[0, :, 0],
                               atol=2e-5)


def test_matches_decoder_composition(rng):
    """The kernel must equal the unfused decoder math: k = Wk(src+pos)+bk with
    src = input_proj(feat) + level_embed, v = Wv(src)+bv, mask from me.mf."""
    B, H, Q, D, K, C, Cm = 1, 2, 6, 8, 40, 12, 16
    E = H * D
    qn = rng.randn(B, H, Q, D).astype(np.float32)
    qn /= np.linalg.norm(qn, axis=-1, keepdims=True)
    feat = rng.randn(B, K, C).astype(np.float32) * 0.5
    mf = rng.randn(B, K, Cm).astype(np.float32) * 0.5
    me = rng.randn(B, Q, Cm).astype(np.float32) * 3.0
    pos = rng.randn(K, E).astype(np.float32) * 0.5
    featT = feat.transpose(0, 2, 1)
    mfT = mf.transpose(0, 2, 1)
    posT = pos.T
    win = rng.randn(C, E).astype(np.float32) * 0.3   # input_proj kernel
    bin_ = rng.randn(E).astype(np.float32) * 0.1     # input_proj bias
    lev = rng.randn(E).astype(np.float32) * 0.1      # level embed
    wkk = rng.randn(E, E).astype(np.float32) * 0.2
    bk = rng.randn(E).astype(np.float32) * 0.1
    wvv = rng.randn(E, E).astype(np.float32) * 0.2
    bv = rng.randn(E).astype(np.float32) * 0.1

    # unfused decoder math
    src = feat @ win + bin_ + lev                        # [B, K, E]
    k = (src + pos[None]) @ wkk + bk
    v = src @ wvv + bv
    kh = k.reshape(B, K, H, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, K, H, D).transpose(0, 2, 1, 3)
    kn = kh / np.linalg.norm(kh, axis=-1, keepdims=True)
    mlog = np.einsum("bqc,bkc->bqk", me, mf)
    masked = mlog < 0
    unmask = masked.all(-1, keepdims=True)
    bias = np.where(masked & ~unmask, -np.inf, 0.0)[:, None]
    logits = 30.0 * np.einsum("bhqd,bhkd->bhqk", qn, kn) + bias
    a = np.exp(logits - logits.max(-1, keepdims=True))
    a /= a.sum(-1, keepdims=True)
    expect = np.einsum("bhqk,bhkd->bhqd", a, vh)

    # folded kernel arguments
    awk = win @ wkk
    awv = win @ wvv
    ck = (bin_ + lev) @ wkk + bk
    cv = (bin_ + lev) @ wvv + bv
    out = fused_uoms_cross_attention(
        *[jnp.asarray(x) for x in (qn, featT, mfT, me, posT, awk, awv, wkk, ck, cv)],
        kappa=30.0, block_k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), expect, atol=3e-5)


def test_present_gating(rng):
    """Absent batch entries are skipped (zero output) and present entries are
    bit-identical to an ungated call; the guard-skip fast path must not change
    results either."""
    args = make_inputs(rng, B=4)
    present = jnp.asarray(np.array([True, False, True, False]))
    out = fused_uoms_cross_attention(*args, present=present, block_k=32,
                                     block_b=2, interpret=True)
    full = fused_uoms_cross_attention(*args, block_k=32, block_b=2,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(full[0]))
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(full[2]))
    assert np.all(np.asarray(out[1]) == 0) and np.all(np.asarray(out[3]) == 0)
