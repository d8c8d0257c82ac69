"""Host-side data augmentation (numpy/cv2), feeding fixed-shape device batches.

Depth-noise suite from DexNet (ref: lib/utils/augmentation.py:58-126):
- add_noise_to_depth: multiplicative gamma noise
- add_noise_to_xyz: GP additive noise approximated by low-res gaussian upsampled
  bicubically, applied where depth > 0
- dropout_random_ellipses: Poisson count of gamma-sized ellipses zeroed out

RGB augmentation (ref: lib/utils/blob.py:74-129):
- chromatic_transform: HLS jitter (+-0.05 hue, +-0.1 sat/luma)
- add_noise: gaussian (90%) or motion blur (10%)

Default parameters mirror data_loading_params (ref: lib/datasets/tabletop_object.py:23-55).
"""

from __future__ import annotations

import numpy as np
import cv2

DEFAULT_PARAMS = {
    "gamma_shape": 1000.0,
    "gamma_scale": 0.001,
    "gaussian_scale": 0.005,
    "gp_rescale_factor": 4,
    "ellipse_dropout_mean": 10,
    "ellipse_gamma_shape": 5.0,
    "ellipse_gamma_scale": 1.0,
}


def add_noise_to_depth(depth_img, params=DEFAULT_PARAMS, rng=np.random):
    mult = rng.gamma(params["gamma_shape"], params["gamma_scale"])
    return depth_img * mult


def add_noise_to_xyz(xyz_img, depth_img, params=DEFAULT_PARAMS, rng=np.random):
    xyz_img = xyz_img.copy()
    H, W, C = xyz_img.shape
    small = (np.array([H, W]) / params["gp_rescale_factor"]).astype(int)
    noise = rng.normal(0.0, params["gaussian_scale"], size=(small[0], small[1], C))
    noise = cv2.resize(noise, (W, H), interpolation=cv2.INTER_CUBIC)
    xyz_img[depth_img > 0, :] += noise[depth_img > 0, :]
    return xyz_img


def dropout_random_ellipses(depth_img, params=DEFAULT_PARAMS, rng=np.random):
    depth_img = depth_img.copy()
    n = rng.poisson(params["ellipse_dropout_mean"])
    nz = np.array(np.where(depth_img > 0)).T
    if len(nz) == 0 or n == 0:
        return depth_img
    centers = nz[rng.choice(nz.shape[0], size=n)]
    xr = rng.gamma(params["ellipse_gamma_shape"], params["ellipse_gamma_scale"], size=n)
    yr = rng.gamma(params["ellipse_gamma_shape"], params["ellipse_gamma_scale"], size=n)
    angles = rng.randint(0, 360, size=n)
    for i in range(n):
        mask = np.zeros_like(depth_img)
        mask = cv2.ellipse(mask, tuple(centers[i][::-1].tolist()),
                           (int(np.round(xr[i])), int(np.round(yr[i]))),
                           angle=int(angles[i]), startAngle=0, endAngle=360,
                           color=1, thickness=-1)
        depth_img[mask == 1] = 0
    return depth_img


def chromatic_transform(im_bgr_u8, rng=np.random):
    """HLS jitter of a BGR uint8 image (ref: blob.py:74-99)."""
    d_h = (rng.rand(1) - 0.5) * 0.1 * 180
    d_l = (rng.rand(1) - 0.5) * 0.2 * 256
    d_s = (rng.rand(1) - 0.5) * 0.2 * 256
    hls = cv2.cvtColor(im_bgr_u8, cv2.COLOR_BGR2HLS)
    h, l, s = cv2.split(hls)
    new_h = (h + d_h) % 180
    new_l = np.clip(l + d_l, 0, 255)
    new_s = np.clip(s + d_s, 0, 255)
    new_hls = cv2.merge((new_h, new_l, new_s)).astype("uint8")
    return cv2.cvtColor(new_hls, cv2.COLOR_HLS2BGR)


def add_noise(image_bgr_u8, level=0.1, rng=np.random):
    """Gaussian noise (p=0.9) or motion blur (p=0.1) (ref: blob.py:102-129)."""
    r = rng.rand(1)
    if r < 0.9:
        row, col, ch = image_bgr_u8.shape
        sigma = rng.rand(1) * rng.uniform(0, level) * 256
        gauss = sigma * rng.randn(row, col)
        noisy = image_bgr_u8 + np.repeat(gauss[:, :, None], ch, axis=2)
        noisy = np.clip(noisy, 0, 255)
    else:
        sizes = [3, 5, 7, 9, 11, 15]
        size = sizes[int(rng.randint(len(sizes)))]
        k = np.zeros((size, size))
        if rng.rand(1) < 0.5:
            k[(size - 1) // 2, :] = 1.0
        else:
            k[:, (size - 1) // 2] = 1.0
        noisy = cv2.filter2D(image_bgr_u8, -1, k / size)
    return noisy.astype("uint8")
