"""Swin Transformer backbone (flax, NHWC) with multi-scale outputs.

Equivalent of the reference's D2SwinTransformer
(ref: MSMFormer/meanshiftformer/modeling/backbone/swin.py, registered but unused
by the shipped configs): patch embedding, window attention with relative
position bias, shifted windows, patch merging; returns {'res2'..'res5'}.

TPU notes: window partition/merge are pure reshapes/transposes; attention runs
as dense batched matmuls over [num_windows*B, tokens, C] which map directly onto
the MXU. The attention mask for shifted windows is precomputed statically.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .resnet import default_precision

xavier = nn.initializers.xavier_uniform()
trunc = nn.initializers.truncated_normal(0.02)


def window_partition(x, ws: int):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(windows, ws: int, H: int, W: int):
    B = windows.shape[0] // (H * W // ws // ws)
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # [ws*ws, ws*ws]


def _shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """[num_windows, ws*ws, ws*ws] additive mask for shifted windows."""
    img_mask = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, H // ws, ws, W // ws, ws, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        """x: [B_, N, C] windows."""
        B_, N, C = x.shape
        H = self.num_heads
        D = C // H
        prec = default_precision(self.dtype)
        qkv = nn.Dense(C * 3, dtype=self.dtype, precision=prec,
                       kernel_init=trunc, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B_, N, 3, H, D).transpose(2, 0, 3, 1, 4), 3)
        q, k, v = q[0], k[0], v[0]                 # [B_, H, N, D]

        rpb_table = self.param("relative_position_bias_table", trunc,
                               ((2 * self.window_size - 1) ** 2, H))
        idx = jnp.asarray(_relative_position_index(self.window_size))
        bias = rpb_table[idx.reshape(-1)].reshape(N, N, H).transpose(2, 0, 1)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, precision=prec) * (D ** -0.5)
        attn = attn.astype(jnp.float32) + bias[None].astype(jnp.float32)
        if attn_mask is not None:
            nW = attn_mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, H, N, N) + attn_mask[None, :, None]
            attn = attn.reshape(B_, H, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, precision=prec)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, dtype=self.dtype, precision=prec, kernel_init=trunc,
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, C] (H, W multiples of window_size after padding)."""
        B, H, W, C = x.shape
        ws = self.window_size
        prec = default_precision(self.dtype)

        shortcut = x
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.shift > 0:
            h = jnp.roll(h, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(H, W, ws, self.shift))
        else:
            mask = None
        windows = window_partition(h, ws)
        attn = WindowAttention(dim=C, num_heads=self.num_heads, window_size=ws,
                               dtype=self.dtype, name="attn")(windows, mask)
        h = window_reverse(attn, ws, H, W)
        if self.shift > 0:
            h = jnp.roll(h, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + h

        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, precision=prec,
                     kernel_init=trunc, name="mlp_fc1")(h)
        h = nn.Dense(C, dtype=self.dtype, precision=prec, kernel_init=trunc,
                     name="mlp_fc2")(nn.gelu(h, approximate=False))
        return x + h


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, H // 2, W // 2, 4 * C)
        # torch order: [x0 (even,even), x1 (odd,even), x2 (even,odd), x3 (odd,odd)]
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                        precision=default_precision(self.dtype),
                        kernel_init=trunc, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin-T by default: embed 96, depths (2,2,6,2), heads (3,6,12,24)."""

    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        prec = default_precision(self.dtype)
        B, H, W, _ = x.shape
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=self.patch_size, dtype=self.dtype, precision=prec,
                    name="patch_embed")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)

        outs = {}
        ws = self.window_size
        for si, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            Hs, Ws = x.shape[1], x.shape[2]
            ph = (-Hs) % ws
            pw = (-Ws) % ws
            xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0))) if ph or pw else x
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else ws // 2
                xp = SwinBlock(dim=xp.shape[-1], num_heads=heads, window_size=ws,
                               shift=shift, dtype=self.dtype,
                               name=f"stage{si}_block{bi}")(xp)
            xp = xp[:, :Hs, :Ws]
            out = nn.LayerNorm(dtype=self.dtype, name=f"out_norm{si}")(xp)
            outs[f"res{si + 2}"] = out
            if si < len(self.depths) - 1:
                # pad to even before merging
                ph2 = Hs % 2
                pw2 = Ws % 2
                if ph2 or pw2:
                    xp = jnp.pad(xp, ((0, 0), (0, ph2), (0, pw2), (0, 0)))
                x = PatchMerging(dim=xp.shape[-1], dtype=self.dtype,
                                 name=f"merge{si}")(xp)
            else:
                x = xp
        return outs
