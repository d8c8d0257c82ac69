"""Resizing ops with PyTorch-exact semantics, built for the TPU.

The reference relies on three distinct interpolation conventions:

- ``nn.functional.upsample_bilinear`` == bilinear with align_corners=True
  (backbone upsampling, resnet_dilated.py Resnet34_8s.forward; crop_rois resize,
  lib/fcn/test_dataset.py:104-109)
- ``F.interpolate(mode='bilinear', align_corners=False)`` (attention-mask and
  pred-mask resizing, meanshiftformer_transformer_decoder.py:1028,
  pretrained_meanshiftformer_model.py:338-343)
- ``F.upsample_nearest`` == nearest with src = floor(dst * in / out)
  (mask crops and paste-back, test_dataset.py:106,173)

Bilinear resize here is expressed as two dense interpolation-matrix matmuls
(separable along H then W) - on TPU these run on the MXU and fuse well, unlike
gather-based formulations. All index computation is static (shapes known at trace
time).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """[out_size, in_size] row-stochastic linear interpolation matrix."""
    M = np.zeros((out_size, in_size), np.float32)
    if in_size == 1:
        M[:, 0] = 1.0
        return M
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
            src = min(max(src, 0.0), in_size - 1)  # clamp (border replicate)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        M[i, lo] += 1.0 - w
        M[i, hi] += w
    return M


@lru_cache(maxsize=None)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] one-hot matrix with torch upsample_nearest indexing:
    src = floor(dst * in / out)."""
    M = np.zeros((out_size, in_size), np.float32)
    idx = np.minimum((np.arange(out_size) * in_size) // out_size, in_size - 1)
    M[np.arange(out_size), idx] = 1.0
    return M


@lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    return np.minimum((np.arange(out_size) * in_size) // out_size, in_size - 1).astype(np.int32)


def resize_bilinear(x, out_hw, align_corners: bool = False):
    """Bilinear resize of [..., H, W, C] to out_hw=(H', W') via MXU matmuls."""
    h_out, w_out = out_hw
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return x
    dt = x.dtype
    Rh = jnp.asarray(_linear_matrix(h_in, h_out, align_corners), dt)
    Rw = jnp.asarray(_linear_matrix(w_in, w_out, align_corners), dt)
    # rows: [H', H] x [..., H, W, C] over axis -3. Interpolation must be exact:
    # force fp32 MXU precision regardless of the global default matmul precision.
    x = jnp.einsum("Hh,...hwc->...Hwc", Rh, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("Ww,...hwc->...hWc", Rw, x, precision=jax.lax.Precision.HIGHEST)
    return x


def resize_nearest(x, out_hw):
    """Nearest resize of [..., H, W, C] to out_hw, torch upsample_nearest indexing
    (exact gathers - safe for integer label images stored channel-last)."""
    h_out, w_out = out_hw
    iy = jnp.asarray(_nearest_index(x.shape[-3], h_out))
    ix = jnp.asarray(_nearest_index(x.shape[-2], w_out))
    x = jnp.take(x, iy, axis=-3)
    return jnp.take(x, ix, axis=-2)


def resize_nearest_hw(x, out_hw):
    """Nearest resize treating the LAST TWO dims as (H, W) - for label images
    [..., H, W]."""
    h_out, w_out = out_hw
    iy = jnp.asarray(_nearest_index(x.shape[-2], h_out))
    ix = jnp.asarray(_nearest_index(x.shape[-1], w_out))
    return jnp.take(jnp.take(x, iy, axis=-2), ix, axis=-1)
