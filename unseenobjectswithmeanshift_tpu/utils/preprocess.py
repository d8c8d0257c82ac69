"""Host/device preprocessing: depth->XYZ, normalization, padding.

Semantics match the reference exactly:
- compute_xyz: lib/fcn/get_network_crop.py:114-121 / lib/datasets/tabletop_object.py:57-93
- UCN normalization (BGR/255 - pixel_means/255): get_network_crop.py:140-148
- COCO normalization ((rgb - mean) / std): lib/datasets/tabletop_dataset.py:395-396
- padding to a size multiple: detectron2 ImageList.from_tensors(, 32) pads bottom/right
  with zeros (used by pretrained_meanshiftformer_model.py:275).

These are thin jnp functions usable both inside jit graphs and (via numpy duck-typing)
on the host.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import UCN_PIXEL_MEANS_BGR, COCO_PIXEL_MEAN_RGB, COCO_PIXEL_STD_RGB


def build_matrix_of_indices(height: int, width: int) -> np.ndarray:
    """[H, W, 2] array of (row, col) float indices (ref: lib/utils/mask.py:41-46)."""
    return np.indices((height, width), dtype=np.float32).transpose(1, 2, 0)


def compute_xyz(depth_m, fx: float, fy: float, px: float, py: float):
    """Back-project a depth map (meters) into camera-frame XYZ.

    depth_m: [H, W] float array (meters). Returns [H, W, 3] (x, y, z).
    Ref: lib/fcn/get_network_crop.py:114-121.
    """
    xp = jnp if isinstance(depth_m, jnp.ndarray) else np
    h, w = depth_m.shape[-2], depth_m.shape[-1]
    rows = xp.arange(h, dtype=depth_m.dtype)[:, None]
    cols = xp.arange(w, dtype=depth_m.dtype)[None, :]
    z = depth_m
    x = (cols - px) * z / fx
    y = (rows - py) * z / fy
    return xp.stack([x, y, z], axis=-1)


def normalize_image_ucn(im_bgr_u8):
    """BGR uint8 [H, W, 3] -> float normalized: im/255 - pixel_means/255.

    Ref: lib/fcn/get_network_crop.py:146-148 (and lib/datasets/tabletop_object.py:296).
    Output stays HWC (channel-last, TPU-native layout).
    """
    xp = jnp if isinstance(im_bgr_u8, jnp.ndarray) else np
    means = xp.asarray(UCN_PIXEL_MEANS_BGR, dtype=xp.float32) / 255.0
    return im_bgr_u8.astype(xp.float32) / 255.0 - means


def normalize_image_coco(im_rgb_u8):
    """RGB uint8 [H, W, 3] -> (im - mean) / std, COCO statistics.

    Ref: lib/datasets/tabletop_dataset.py:395-396.
    """
    xp = jnp if isinstance(im_rgb_u8, jnp.ndarray) else np
    mean = xp.asarray(COCO_PIXEL_MEAN_RGB, dtype=xp.float32)
    std = xp.asarray(COCO_PIXEL_STD_RGB, dtype=xp.float32)
    return (im_rgb_u8.astype(xp.float32) - mean) / std


def pad_to_multiple(x, divisor: int = 32, value: float = 0.0):
    """Pad an [..., H, W, C] array on bottom/right so H and W are multiples of divisor.

    Matches detectron2 ImageList.from_tensors (pads after the image content with value).
    Returns (padded, (orig_h, orig_w)).
    """
    xp = jnp if isinstance(x, jnp.ndarray) else np
    h, w = x.shape[-3], x.shape[-2]
    ph = (-h) % divisor
    pw = (-w) % divisor
    if ph == 0 and pw == 0:
        return x, (h, w)
    pad = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return xp.pad(x, pad, mode="constant", constant_values=value), (h, w)


def read_sample(color_path: str, depth_path=None, camera_params=None, input_type="RGBD"):
    """Read one RGB(-D) sample from disk into the model's host format.

    Mirrors read_sample in lib/fcn/get_network_crop.py:124-153 / the demo CLI
    (tools/test_image_with_ms_transformer.py), but returns HWC numpy arrays:
      {'image': [H,W,3] float32 normalized BGR, 'xyz': [H,W,3] float32 or None}
    """
    import cv2

    im = cv2.imread(color_path)  # BGR uint8
    sample = {"image": normalize_image_ucn(im)}
    if input_type in ("DEPTH", "RGBD") and depth_path is not None:
        depth_img = cv2.imread(depth_path, cv2.IMREAD_ANYDEPTH)
        depth = depth_img.astype(np.float32) / 1000.0
        sample["xyz"] = compute_xyz(
            depth,
            camera_params["fx"],
            camera_params["fy"],
            camera_params["x_offset"],
            camera_params["y_offset"],
        )
    else:
        sample["xyz"] = None
    return sample
