"""Multi-Scale Deformable Attention - TPU formulation.

The reference implements this as a CUDA im2col kernel
(ref: MSMFormer/meanshiftformer/modeling/pixel_decoder/ops/src/cuda/
ms_deform_im2col_cuda.cuh) with a pure-PyTorch grid_sample fallback that is the
numerically exact spec (ref: ops/functions/ms_deform_attn_func.py:52-72):
for each query, bilinearly sample n_points locations per head per level from the
multi-scale value maps and sum them with softmaxed attention weights.

On TPU the bilinear sample is expressed as four dynamic gathers + lerp (XLA
lowers these to efficient dynamic-slice/gather fusions); everything is batched
over [B, Lq, H, L, P] at once. Sampling uses grid_sample semantics:
grid = 2 * loc - 1, align_corners=False, zero padding.

The module (projections, offset/weight heads) mirrors
ops/modules/ms_deform_attn.py:34-125.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..models.resnet import default_precision


def _bilinear_sample_zero_pad(value_hw, x, y):
    """value_hw: [H, W, C]; x, y: [...] absolute coords (grid_sample
    align_corners=False unnormalized: src = p * size - 0.5). Zero padding."""
    H, W, C = value_hw.shape
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    def tap(yi, xi):
        inb = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))[..., None]
        v = value_hw[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb, v, 0.0)

    return (tap(y0, x0) * (1 - wy) * (1 - wx) + tap(y0, x0 + 1) * (1 - wy) * wx
            + tap(y0 + 1, x0) * wy * (1 - wx) + tap(y0 + 1, x0 + 1) * wy * wx)


def ms_deform_attn_core(value, value_spatial_shapes, sampling_locations,
                        attention_weights):
    """Exact equivalent of ms_deform_attn_core_pytorch (the CUDA kernel's oracle).

    value: [B, Len_in, H, D] (Len_in = sum of H_l * W_l)
    value_spatial_shapes: static list of (H_l, W_l)
    sampling_locations: [B, Lq, H, L, P, 2] normalized (x, y) in [0, 1]
    attention_weights: [B, Lq, H, L, P]
    Returns [B, Lq, H * D].
    """
    B, _, NH, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    splits = [h * w for h, w in value_spatial_shapes]
    offsets = [0]
    for s in splits:
        offsets.append(offsets[-1] + s)

    out = jnp.zeros((B, Lq, NH, D), value.dtype)
    for l, (h, w) in enumerate(value_spatial_shapes):
        vl = value[:, offsets[l]:offsets[l + 1]]             # [B, h*w, NH, D]
        vl = vl.reshape(B, h, w, NH, D).transpose(0, 3, 1, 2, 4)  # [B, NH, h, w, D]
        loc = sampling_locations[:, :, :, l]                 # [B, Lq, NH, P, 2]
        # grid_sample align_corners=False: src = (2*loc-1 + 1)/2 * size - 0.5
        x = loc[..., 0].transpose(0, 2, 1, 3) * w - 0.5      # [B, NH, Lq, P]
        y = loc[..., 1].transpose(0, 2, 1, 3) * h - 0.5

        sample_bh = jax.vmap(jax.vmap(_bilinear_sample_zero_pad))
        sampled = sample_bh(vl, x, y)                        # [B, NH, Lq, P, D]
        out = out + jnp.einsum("bhqpd,bqhp->bqhd", sampled,
                               attention_weights[:, :, :, l],
                               precision=jax.lax.Precision.HIGHEST)
    return out.reshape(B, Lq, NH * D)


def ms_deform_attn_core_packed(value, value_spatial_shapes, sampling_locations,
                               attention_weights):
    """Packed-window formulation of `ms_deform_attn_core` (same contract,
    numerically equivalent): per level the value map is expanded once into a
    [(h+1)*(w+1), 4*D] tensor of 2x2 neighborhoods (zero-padded border ring),
    so the four bilinear taps of every sample become ONE contiguous row gather
    instead of four independent gathers. TPU gathers cost ~per row, so 4x wider
    rows at 1/4 the row count is a large win (same trick as the criterion's
    packed-window point_sample). Memory: 4x the per-level value map, transient.

    Tap semantics match the gather core exactly: grid_sample
    align_corners=False with zero padding. Coordinates whose floor cell lies
    fully outside [-1, h] x [-1, w] are clipped onto the zero ring and masked.
    """
    B, _, NH, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    splits = [h * w for h, w in value_spatial_shapes]
    offsets = [0]
    for s in splits:
        offsets.append(offsets[-1] + s)

    out = jnp.zeros((B, Lq, NH, D), value.dtype)
    for l, (h, w) in enumerate(value_spatial_shapes):
        vl = value[:, offsets[l]:offsets[l + 1]]
        vl = vl.reshape(B, h, w, NH, D).transpose(0, 3, 1, 2, 4)  # [B,NH,h,w,D]
        vp = jnp.pad(vl, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        # windows[yy, xx] = the 2x2 cell whose top-left tap is (yy-1, xx-1)
        win = jnp.stack([vp[:, :, :-1, :-1], vp[:, :, :-1, 1:],
                         vp[:, :, 1:, :-1], vp[:, :, 1:, 1:]], axis=-2)
        win = win.reshape(B, NH, (h + 1) * (w + 1), 4 * D)

        loc = sampling_locations[:, :, :, l]                 # [B, Lq, NH, P, 2]
        x = loc[..., 0].transpose(0, 2, 1, 3) * w - 0.5      # [B, NH, Lq, P]
        y = loc[..., 1].transpose(0, 2, 1, 3) * h - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        xi = jnp.clip(x0, -1, w - 1)
        yi = jnp.clip(y0, -1, h - 1)
        # a clipped cell came from outside [-1, h-1] x [-1, w-1]: all four taps
        # of the true zero-padded sample are zero there, but the clipped window
        # straddles one real row/column - mask the whole row instead.
        valid = ((x0 == xi) & (y0 == yi))
        idx = ((yi + 1) * (w + 1) + (xi + 1)).reshape(B, NH, Lq * P)

        rows = jnp.take_along_axis(win, idx[..., None], axis=2)
        rows = rows.reshape(B, NH, Lq, P, 4, D)
        rows = jnp.where(valid[..., None, None], rows, 0.0)

        wx = (x - x0).astype(jnp.float32)
        wy = (y - y0).astype(jnp.float32)
        tapw = jnp.stack([(1 - wy) * (1 - wx), (1 - wy) * wx,
                          wy * (1 - wx), wy * wx], axis=-1)  # [B,NH,Lq,P,4]
        # fold the softmaxed attention weight into the tap weights so one
        # einsum reduces both the 4 taps and the P points. The lerp weights
        # stay f32 like the gather core (whose bf16-tap x f32-weight products
        # promote) - quantizing them to bf16 would shift effective sampling
        # positions by ~2^-8.
        aw = attention_weights[:, :, :, l].transpose(0, 2, 1, 3)  # [B,NH,Lq,P]
        w4 = tapw * aw[..., None].astype(jnp.float32)
        out = out + jnp.einsum(
            "bhqptd,bhqpt->bqhd", rows.astype(jnp.float32), w4,
            precision=jax.lax.Precision.HIGHEST).astype(out.dtype)
    return out.reshape(B, Lq, NH * D)


def _offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Reference init: per-head unit directions at angles 2*pi*h/H, scaled by
    point index (ref: ops/modules/ms_deform_attn.py _reset_parameters)."""
    import numpy as np

    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * np.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)             # [H, 2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1)


class MSDeformAttn(nn.Module):
    """Deformable attention module (ref: ops/modules/ms_deform_attn.py:34-125)."""

    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, input_flatten, spatial_shapes,
                 padding_mask=None):
        """query: [B, Lq, C]; reference_points: [B, Lq, L, 2] normalized;
        input_flatten: [B, Len, C]; spatial_shapes: static list of (H_l, W_l)."""
        B, Lq, C = query.shape
        H, L, P = self.n_heads, self.n_levels, self.n_points
        prec = default_precision(self.dtype)

        value = nn.Dense(self.d_model, dtype=self.dtype, precision=prec,
                         name="value_proj")(input_flatten)
        if padding_mask is not None:
            value = jnp.where(padding_mask[..., None], 0.0, value)
        value = value.reshape(B, -1, H, self.d_model // H)

        offsets = nn.Dense(H * L * P * 2, dtype=self.dtype, precision=prec,
                           kernel_init=nn.initializers.zeros,
                           bias_init=lambda key, shape, dtype=jnp.float32:
                               jnp.asarray(_offset_bias_init(H, L, P), dtype),
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(B, Lq, H, L, P, 2)

        weights = nn.Dense(H * L * P, dtype=self.dtype, precision=prec,
                           kernel_init=nn.initializers.zeros,
                           name="attention_weights")(query)
        weights = jax.nn.softmax(
            weights.reshape(B, Lq, H, L * P).astype(jnp.float32), axis=-1
        ).astype(value.dtype).reshape(B, Lq, H, L, P)

        # normalize offsets by (W_l, H_l) (ms_deform_attn.py:102-109)
        normalizer = jnp.asarray([[w, h] for h, w in spatial_shapes],
                                 jnp.float32)                       # [L, 2]
        locations = (reference_points[:, :, None, :, None, :]
                     + offsets / normalizer[None, None, None, :, None, :])

        out = ms_deform_attn_core_packed(value, spatial_shapes, locations,
                                         weights)
        return nn.Dense(self.d_model, dtype=self.dtype, precision=prec,
                        name="output_proj")(out)
