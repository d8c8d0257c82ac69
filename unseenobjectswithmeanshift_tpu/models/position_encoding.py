"""2D sine positional embedding (DETR-style, normalized to 2*pi).

Ref: MSMFormer/meanshiftformer/modeling/transformer_decoder/position_encoding.py.
Channel-last output [H, W, 2*num_pos_feats] with layout [y-feats | x-feats],
exactly matching the reference's channel-first concat(pos_y, pos_x).
Since inference never passes a padding mask (mask=None there), the cumsum over
an all-ones mask reduces to arange(1, N+1) - computed statically here.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _pe_np(h: int, w: int, num_pos_feats: int, temperature: float, normalize: bool,
           scale: float) -> np.ndarray:
    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x_embed = np.ones((h, 1), np.float32) * np.arange(1, w + 1, dtype=np.float32)[None, :]
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    # interleave sin/cos of paired frequencies (stack on a new axis then flatten)
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3
                     ).reshape(h, w, num_pos_feats)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3
                     ).reshape(h, w, num_pos_feats)
    return np.concatenate([pos_y, pos_x], axis=2)


def position_embedding_sine(h: int, w: int, num_pos_feats: int = 128,
                            temperature: float = 10000.0, normalize: bool = True,
                            scale: float = 2 * math.pi, dtype=jnp.float32):
    """[H, W, 2*num_pos_feats] sine PE, precomputed on host (static shapes)."""
    return jnp.asarray(_pe_np(h, w, num_pos_feats, temperature, normalize, scale), dtype)
