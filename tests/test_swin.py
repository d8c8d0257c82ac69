"""Swin backbone: shapes, shifted-window mask, window round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from unseenobjectswithmeanshift_tpu.models.swin import (
    SwinTransformer, window_partition, window_reverse, _shift_attn_mask,
    _relative_position_index,
)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.rand(2, 14, 14, 8).astype(np.float32))
    w = window_partition(x, 7)
    assert w.shape == (2 * 4, 49, 8)
    back = window_reverse(w, 7, 14, 14)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_bounds():
    idx = _relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < (2 * 7 - 1) ** 2


def test_shift_mask_blocks_cross_region():
    m = _shift_attn_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    assert (m == 0).any() and (m == -100).any()


def test_swin_tiny_shapes(rng):
    model = SwinTransformer(embed_dim=32, depths=(1, 1, 1, 1),
                            num_heads=(2, 2, 4, 4), window_size=4)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(v, x)
    assert outs["res2"].shape == (1, 16, 16, 32)
    assert outs["res3"].shape == (1, 8, 8, 64)
    assert outs["res4"].shape == (1, 4, 4, 128)
    assert outs["res5"].shape == (1, 2, 2, 256)
