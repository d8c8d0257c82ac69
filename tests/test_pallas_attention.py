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


def _run_interpret(qn, kn, v, mask, kappa=30.0, block_k=32):
    """Run the kernel in interpreter mode (no TPU needed)."""
    import unseenobjectswithmeanshift_tpu.ops.pallas_attention as m
    from functools import partial
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Q, D = qn.shape
    K = kn.shape[2]
    Qp = m._round_up(max(Q, 8), 8)
    Kp = m._round_up(K, block_k)
    if Qp != Q:
        qn = jnp.pad(qn, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, Qp - Q), (0, 0)))
    if Kp != K:
        kn = jnp.pad(kn, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, Kp - K)))
    unmask = jnp.all(mask[..., :K] < 0, axis=-1)[..., None].astype(jnp.float32)
    out = pl.pallas_call(
        partial(m._flash_kernel, kappa=kappa, num_heads=H, kv_len=K, block_k=block_k),
        grid=(B, Kp // block_k),
        in_specs=[
            pl.BlockSpec((1, H, Qp, D), lambda b, kb: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, block_k, D), lambda b, kb: (b, 0, kb, 0)),
            pl.BlockSpec((1, H, block_k, D), lambda b, kb: (b, 0, kb, 0)),
            pl.BlockSpec((1, Qp, block_k), lambda b, kb: (b, 0, kb)),
            pl.BlockSpec((1, Qp, 1), lambda b, kb: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, Qp, D), lambda b, kb: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), qn.dtype),
        scratch_shapes=[
            pltpu.VMEM((H, Qp), jnp.float32),
            pltpu.VMEM((H, Qp, D), jnp.float32),
        ],
        interpret=True,
    )(qn, kn, v, mask, unmask)
    return out[:, :, :Q, :]


def test_kernel_matches_reference(rng):
    qn, kn, v, mask = _make(rng)
    ref = pa.masked_hypersphere_attention_reference(qn, kn, v, mask)
    out = _run_interpret(qn, kn, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_fully_masked_row_guard(rng):
    qn, kn, v, mask = _make(rng, Q=6, K=64)
    mask = mask.at[0, 2, :].set(-5.0)      # fully masked row -> guard unmasks it
    ref = pa.masked_hypersphere_attention_reference(qn, kn, v, mask)
    out = _run_interpret(qn, kn, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_padded_k(rng):
    # K not a multiple of block_k exercises the kv_len guard
    qn, kn, v, mask = _make(rng, K=75)
    ref = pa.masked_hypersphere_attention_reference(qn, kn, v, mask)
    out = _run_interpret(qn, kn, v, mask, block_k=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_no_mask_all_attend(rng):
    qn, kn, v, mask = _make(rng)
    mask = jnp.abs(mask) + 0.1             # everything attends
    ref = pa.masked_hypersphere_attention_reference(qn, kn, v, mask)
    out = _run_interpret(qn, kn, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
