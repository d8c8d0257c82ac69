"""2D sine positional embedding (DETR-style, normalized to 2*pi).

Ref: MSMFormer/meanshiftformer/modeling/transformer_decoder/position_encoding.py.
Channel-last output [H, W, 2*num_pos_feats] with layout [y-feats | x-feats],
exactly matching the reference's channel-first concat(pos_y, pos_x).
Since inference never passes a padding mask (mask=None there), the cumsum over
an all-ones mask reduces to arange(1, N+1) - computed statically here.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def position_embedding_sine(h: int, w: int, num_pos_feats: int = 128,
                            temperature: float = 10000.0, normalize: bool = True,
                            scale: float = 2 * math.pi, dtype=jnp.float32):
    """[H, W, 2*num_pos_feats] sine PE, computed ON DEVICE from iota.

    At 480x640 the embedding is 300 MB fp32 - as a host constant it would be
    captured into the HLO (and the axon remote-compile tunnel rejects such
    programs); as a handful of iota/sin ops it is fused and costs nothing.
    """
    y_embed = (jnp.arange(1, h + 1, dtype=jnp.float32))[:, None]
    x_embed = (jnp.arange(1, w + 1, dtype=jnp.float32))[None, :]
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (h + eps) * scale
        x_embed = x_embed / (w + eps) * scale
    y_embed = jnp.broadcast_to(y_embed, (h, w))
    x_embed = jnp.broadcast_to(x_embed, (h, w))

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])],
                      axis=3).reshape(h, w, num_pos_feats)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])],
                      axis=3).reshape(h, w, num_pos_feats)
    return jnp.concatenate([pos_y, pos_x], axis=2).astype(dtype)
