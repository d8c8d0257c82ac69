"""Pallas fused masked hypersphere attention vs the pure-JAX oracle
(interpret mode on CPU - the oracle pattern of the reference's ops/test.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unseenobjectswithmeanshift_tpu.ops import pallas_attention as pa
from unseenobjectswithmeanshift_tpu.ops.hypersphere_attention import l2_normalize


def _make(rng, B=1, H=2, Q=10, K=96, D=8):
    qn = l2_normalize(jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32)))
    kn = l2_normalize(jnp.asarray(rng.randn(B, H, K, D).astype(np.float32)))
    v = jnp.asarray(rng.randn(B, H, K, D).astype(np.float32))
    mask = jnp.asarray(rng.randn(B, Q, K).astype(np.float32))
    return qn, kn, v, mask


def _run(qn, kn, v, mask, block_k=32):
    return pa.masked_hypersphere_attention(qn, kn, v, mask, block_k=block_k,
                                           interpret=True)


def test_kernel_matches_reference(rng):
    qn, kn, v, mask = _make(rng)
    ref = pa.masked_hypersphere_attention_reference(qn, kn, v, mask)
    out = _run(qn, kn, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_fully_masked_row_guard(rng):
    qn, kn, v, mask = _make(rng, Q=6, K=64)
    mask = mask.at[0, 2, :].set(-5.0)      # fully masked row -> guard unmasks it
    ref = pa.masked_hypersphere_attention_reference(qn, kn, v, mask)
    out = _run(qn, kn, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_padded_k(rng):
    # K not a multiple of block_k exercises the padded-key bias
    qn, kn, v, mask = _make(rng, K=75)
    ref = pa.masked_hypersphere_attention_reference(qn, kn, v, mask)
    out = _run(qn, kn, v, mask, block_k=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_no_mask_all_attend(rng):
    qn, kn, v, mask = _make(rng)
    mask = jnp.abs(mask) + 0.1             # everything attends
    ref = pa.masked_hypersphere_attention_reference(qn, kn, v, mask)
    out = _run(qn, kn, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_multibatch_multihead(rng):
    qn, kn, v, mask = _make(rng, B=3, H=4, Q=17, K=130, D=16)
    ref = pa.masked_hypersphere_attention_reference(qn, kn, v, mask)
    out = _run(qn, kn, v, mask, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_kv_transposed(rng):
    qn, kn, v, mask = _make(rng, B=2, H=2, Q=10, K=96, D=8)
    ref = pa.masked_hypersphere_attention_reference(qn, kn, v, mask)
    out = pa.masked_hypersphere_attention(
        qn, kn.transpose(0, 1, 3, 2), v.transpose(0, 1, 3, 2), mask,
        block_k=32, interpret=True, kv_transposed=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_projection_kernel_matches_reference(rng):
    B, H, Q, K, D, E = 2, 2, 10, 96, 8, 16
    qn = l2_normalize(jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32)))
    base = jnp.asarray(rng.randn(B, K, E).astype(np.float32))
    pos = jnp.asarray(rng.randn(K, E).astype(np.float32))
    wk = jnp.asarray(rng.randn(E, H * D).astype(np.float32) * 0.2)
    bk = jnp.asarray(rng.randn(H * D).astype(np.float32) * 0.1)
    wv = jnp.asarray(rng.randn(E, H * D).astype(np.float32) * 0.2)
    bv = jnp.asarray(rng.randn(H * D).astype(np.float32) * 0.1)
    mask = jnp.asarray(rng.randn(B, Q, K).astype(np.float32))
    mask = mask.at[0, 3, :].set(-5.0)   # degenerate row

    # reference composition: project outside, normalize, unfused oracle
    k = ((base + pos[None]) @ wk + bk).reshape(B, K, H, D).transpose(0, 2, 1, 3)
    v = (base @ wv + bv).reshape(B, K, H, D).transpose(0, 2, 1, 3)
    ref = pa.masked_hypersphere_attention_reference(qn, l2_normalize(k), v, mask)

    out = pa.fused_masked_hypersphere_attention(
        qn, base, pos, wk, bk, wv, bv, mask, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
