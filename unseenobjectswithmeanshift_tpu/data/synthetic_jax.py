"""On-device synthetic-scene pipeline: render + augment + batch, all jitted.

The production data path for training on procedurally generated tabletop
scenes (see synthetic.py for the scene recipe and why it exists). This
environment's host CPU needs seconds to ray-cast one 480x640 scene in
numpy, which would starve the chip; the per-pixel closest-hit is trivially
data-parallel VPU work, so the whole input pipeline runs on the TPU:

  host: sample_scene_params (tiny rejection loop over <=9 objects, ~ms)
  device (one jit): ray-cast render -> DexNet-style depth noise -> XYZ ->
  GP noise -> chromatic/gaussian RGB aug -> UCN normalization -> instance
  mask extraction / compaction

`render_scene_batch` matches the numpy oracle `synthetic.render_scene_numpy`
bit-for-bit in geometry (same fp32 intersection math; tested in
tests/test_synthetic.py); the augmentations mirror data/augmentation.py
parameters with two documented deviations: the RGB noise branch is
gaussian-only (the reference's 10% motion-blur branch is a host cv2
filter2D; omitted), and ellipse-dropout centers are uniform over the image
rather than over valid-depth pixels (our analytic depth is valid almost
everywhere, so the distinction is ~nil).

Ref: lib/utils/augmentation.py:58-126 (depth noise), lib/utils/blob.py:74-129
(chromatic/gaussian), lib/datasets/tabletop_object.py (sample assembly).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from .synthetic import (KIND_SPHERE, KIND_BOX, KIND_CYLINDER, MOTTLE_HW,
                        sample_scene_params)
from .datasets import fov_intrinsics
from ..config import UCN_PIXEL_MEANS_BGR

_INF = jnp.float32(jnp.inf)

# All geometry contractions are tiny ([N,3] dots / [N,3]x[3,3]); pin them to
# full-fp32 precision so the TPU render matches the numpy oracle (the MXU's
# DEFAULT precision computes fp32 matmuls with bf16 products, which moves
# silhouette pixels; measured in tests/test_synthetic.py).
_PREC = jax.lax.Precision.HIGHEST


def _dot3(a, b):
    """Rowwise 3-dot; elementwise VPU math, full fp32."""
    return jnp.sum(a * b, axis=-1)


def stack_scene_params(params_list: List[Dict[str, np.ndarray]]):
    """List of per-scene packed params -> batched numpy pytree."""
    return {k: np.stack([p[k] for p in params_list])
            for k in params_list[0]}


# ---------------------------------------------------------------------------
# render (geometry identical to the numpy oracle; see synthetic.py)


def _ray_dirs_j(H, W, fx, fy, px, py):
    rows = jnp.arange(H, dtype=jnp.float32)[:, None]
    cols = jnp.arange(W, dtype=jnp.float32)[None, :]
    d = jnp.stack([jnp.broadcast_to((cols - px) / fx, (H, W)),
                   jnp.broadcast_to((rows - py) / fy, (H, W)),
                   jnp.ones((H, W), jnp.float32)], axis=-1)
    return d.reshape(-1, 3)                                  # [N, 3], dz = 1


def _isect_plane_j(d, p0, n):
    dn = _dot3(d, n)
    t = jnp.where(jnp.abs(dn) > 1e-9, _dot3(p0, n) / jnp.where(dn == 0, 1.0, dn),
                  _INF)
    return jnp.where(t > 1e-6, t, _INF)


def _isect_sphere_j(d, c, r):
    a = jnp.sum(d * d, axis=1)
    b = _dot3(d, c)
    cc = _dot3(c, c) - r * r
    disc = b * b - a * cc
    ok = disc > 0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    t = (b - sq) / a
    return jnp.where(ok & (t > 1e-6), t, _INF)


def _isect_box_j(d, center, R, half):
    o = jnp.matmul(-center, R, precision=_PREC)
    dd = jnp.matmul(d, R, precision=_PREC)
    safe = jnp.where(jnp.abs(dd) < 1e-12, 1e-12, dd)
    t1 = (-half - o) / safe
    t2 = (half - o) / safe
    tmin = jnp.minimum(t1, t2).max(axis=1)
    tmax = jnp.maximum(t1, t2).min(axis=1)
    hit = (tmax >= tmin) & (tmax > 1e-6)
    t = jnp.where(tmin > 1e-6, tmin, tmax)
    return jnp.where(hit, t, _INF)


def _isect_cylinder_j(d, base, axis, r, h):
    d_par = _dot3(d, axis)[:, None] * axis
    d_ort = d - d_par
    o = -base
    o_ort = o - _dot3(o, axis) * axis
    a = jnp.sum(d_ort * d_ort, axis=1)
    b = jnp.matmul(d_ort, o_ort, precision=_PREC)
    c = _dot3(o_ort, o_ort) - r * r
    disc = b * b - a * c
    ok = (disc > 0) & (a > 1e-12)
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    sa = jnp.where(a > 1e-12, a, 1.0)
    t_side = jnp.where(ok, (-b - sq) / sa, _INF)
    z_hit = jnp.where(jnp.isfinite(t_side),
                      t_side * _dot3(d, axis) - _dot3(base, axis), _INF)
    t_side = jnp.where((t_side > 1e-6) & (z_hit >= 0) & (z_hit <= h),
                       t_side, _INF)
    t_caps = jnp.full_like(t_side, _INF)
    dn = _dot3(d, axis)
    for p0c in (base, base + h * axis):
        tc = jnp.where(jnp.abs(dn) > 1e-9,
                       _dot3(p0c, axis) / jnp.where(dn == 0, 1.0, dn), _INF)
        hitp = jnp.where(jnp.isfinite(tc)[:, None], tc[:, None] * d, 0.0) - p0c
        inside = jnp.sum(hitp * hitp, axis=1) <= r * r
        t_caps = jnp.minimum(t_caps, jnp.where(
            (tc > 1e-6) & jnp.isfinite(tc) & inside, tc, _INF))
    return jnp.minimum(t_side, t_caps)


def _render_one(params, d, H, W, M):
    """One scene from packed params -> (rgb [H,W,3] in [0,1], depth, label)."""
    N = d.shape[0]
    n = params["plane_n"]
    t_best = _isect_plane_j(d, params["plane_p0"], n)
    ids = jnp.zeros(N, jnp.int32)
    normals = jnp.broadcast_to(n, (N, 3))
    mottle = jax.image.resize(params["mottle"], (H, W), method="bicubic")
    albedos = params["table_albedo"] * (0.8 + 0.4 * mottle.reshape(-1, 1))

    for i in range(M):
        kind = params["kinds"][i]
        c = params["centers"][i]
        axis = params["axes"][i]
        R = params["rots"][i]
        dims = params["dims"][i]
        r = dims[0]
        # branchless: evaluate all three primitives, select by kind (VPU
        # elementwise work - 3x arithmetic is free next to HBM traffic)
        t_s = _isect_sphere_j(d, c, jnp.maximum(r, 1e-4))
        t_b = _isect_box_j(d, c, R, jnp.maximum(dims, 1e-4))
        t_c = _isect_cylinder_j(d, c, axis, jnp.maximum(r, 1e-4),
                                jnp.maximum(dims[1], 1e-4))
        t = jnp.where(kind == KIND_SPHERE, t_s,
                      jnp.where(kind == KIND_BOX, t_b,
                                jnp.where(kind == KIND_CYLINDER, t_c, _INF)))
        p = jnp.where(jnp.isfinite(t)[:, None], t[:, None] * d, 0.0)
        # normals per primitive
        nm_s = p - c
        z = _dot3(p - c, axis)
        side = p - c - z[:, None] * axis
        nm_c = jnp.where((z > 1e-4)[:, None] & (z < dims[1] - 1e-4)[:, None],
                         side, jnp.sign(z - dims[1] / 2)[:, None] * axis)
        local = jnp.matmul(p - c, R, precision=_PREC)
        ratio = jnp.abs(local) / jnp.maximum(dims, 1e-4)
        ax = jnp.argmax(ratio, axis=1)
        nm_b = (jnp.sign(jnp.take_along_axis(local, ax[:, None], 1) + 1e-30)
                * R.T[ax])
        nm = jnp.where((kind == KIND_SPHERE)[..., None], nm_s,
                       jnp.where((kind == KIND_BOX)[..., None], nm_b, nm_c))
        hit = t < t_best
        t_best = jnp.where(hit, t, t_best)
        ids = jnp.where(hit, params["ids"][i], ids)
        normals = jnp.where(hit[:, None], nm, normals)
        albedos = jnp.where(hit[:, None], params["albedos"][i], albedos)

    depth = jnp.where(jnp.isfinite(t_best), t_best, 0.0)
    nn = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=1, keepdims=True), 1e-9)
    lam = jnp.abs(_dot3(nn, params["light"]))
    shade = 0.35 + 0.65 * lam
    rgb = jnp.clip(albedos * shade[:, None], 0.0, 1.0)
    return (rgb.reshape(H, W, 3), depth.reshape(H, W),
            ids.reshape(H, W))


@partial(jax.jit, static_argnames=("H", "W", "fx", "fy", "px", "py"))
def render_scene_batch(params, H, W, fx, fy, px, py):
    """Batched closest-hit render. params: stacked pytree ([B, ...] leaves).

    Returns (rgb [B,H,W,3] float32 in [0,1] RGB, depth_m [B,H,W],
    label [B,H,W] int32 = params['ids'][slot] per hit (composites share one
    id across slots), background 0).
    """
    d = _ray_dirs_j(H, W, fx, fy, px, py)
    M = params["kinds"].shape[1]
    return jax.vmap(lambda p: _render_one(p, d, H, W, M))(params)


# ---------------------------------------------------------------------------
# device augmentation (mirrors data/augmentation.py semantics)


def _gamma(key, shape_k, scale, size=()):
    return jax.random.gamma(key, shape_k, shape=size) * scale


def augment_depth(key, depth, max_ellipses: int = 20,
                  gamma_shape=1000.0, gamma_scale=0.001,
                  ellipse_mean=10.0, ellipse_gamma_shape=5.0,
                  ellipse_gamma_scale=1.0):
    """Multiplicative gamma noise + random-ellipse dropout, [H, W] -> [H, W].

    Ref: augmentation.py add_noise_to_depth / dropout_random_ellipses. The
    ellipse count is Poisson(10) clamped to max_ellipses; dropped pixels get
    depth 0 (invalid), exactly like the reference.
    """
    H, W = depth.shape
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    depth = depth * _gamma(k1, gamma_shape, gamma_scale)

    n = jnp.minimum(jax.random.poisson(k2, ellipse_mean), max_ellipses)
    cy = jax.random.uniform(k3, (max_ellipses,), minval=0.0, maxval=H - 1.0)
    cx = jax.random.uniform(k3, (max_ellipses,), minval=0.0, maxval=W - 1.0)
    rx = _gamma(k4, ellipse_gamma_shape, ellipse_gamma_scale, (max_ellipses,))
    ry = _gamma(k5, ellipse_gamma_shape, ellipse_gamma_scale, (max_ellipses,))
    ang = jax.random.uniform(k6, (max_ellipses,), minval=0.0,
                             maxval=2 * jnp.pi)
    rows = jnp.arange(H, dtype=jnp.float32)[:, None]
    cols = jnp.arange(W, dtype=jnp.float32)[None, :]

    def one(i, dep):
        dy = rows - cy[i]
        dx = cols - cx[i]
        ca, sa = jnp.cos(ang[i]), jnp.sin(ang[i])
        u = ca * dx + sa * dy
        v = -sa * dx + ca * dy
        inside = ((u / jnp.maximum(rx[i], 0.5)) ** 2
                  + (v / jnp.maximum(ry[i], 0.5)) ** 2) <= 1.0
        return jnp.where(inside & (i < n), 0.0, dep)

    return jax.lax.fori_loop(0, max_ellipses, one, depth)


def augment_xyz(key, xyz, depth, gp_rescale_factor=4, gaussian_scale=0.005):
    """GP additive noise: low-res gaussian grid upsampled bicubically, added
    where depth > 0 (ref: augmentation.py add_noise_to_xyz)."""
    H, W, C = xyz.shape
    small = (H // gp_rescale_factor, W // gp_rescale_factor, C)
    noise = jax.random.normal(key, small) * gaussian_scale
    noise = jax.image.resize(noise, (H, W, C), method="bicubic")
    return xyz + jnp.where((depth > 0)[..., None], noise, 0.0)


def _rgb_to_hls(rgb):
    mx = rgb.max(-1)
    mn = rgb.min(-1)
    c = mx - mn
    l = (mx + mn) / 2
    s = jnp.where(c > 0, c / jnp.maximum(1.0 - jnp.abs(2 * l - 1), 1e-6), 0.0)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(mx == r, ((g - b) / safe_c) % 6.0,
                  jnp.where(mx == g, (b - r) / safe_c + 2.0,
                            (r - g) / safe_c + 4.0))
    h = jnp.where(c > 0, h / 6.0, 0.0)          # [0, 1)
    return h, l, s


def _hls_to_rgb(h, l, s):
    c = (1.0 - jnp.abs(2 * l - 1)) * s
    hp = (h % 1.0) * 6.0
    x = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    z = jnp.zeros_like(c)
    idx = jnp.floor(hp).astype(jnp.int32) % 6
    rgbs = jnp.stack([
        jnp.stack([c, x, z], -1), jnp.stack([x, c, z], -1),
        jnp.stack([z, c, x], -1), jnp.stack([z, x, c], -1),
        jnp.stack([x, z, c], -1), jnp.stack([c, z, x], -1)], 0)
    sel = jnp.take_along_axis(rgbs, idx[None, ..., None], axis=0)[0]
    m = l - c / 2
    return jnp.clip(sel + m[..., None], 0.0, 1.0)


def augment_rgb(key, rgb):
    """Chromatic HLS jitter (+-0.05 hue, +-0.1 luma/sat) then gaussian noise,
    each skipped with p=0.1 like the reference sample assembly
    (ref: blob.py:74-129, tabletop_object.py noise gates)."""
    kh, kl, ks_, kg1, kg2, kg3, kg4, kg5 = jax.random.split(key, 8)
    d_h = (jax.random.uniform(kh) - 0.5) * 0.1
    d_l = (jax.random.uniform(kl) - 0.5) * 0.2
    d_s = (jax.random.uniform(ks_) - 0.5) * 0.2
    h, l, s = _rgb_to_hls(rgb)
    jit = _hls_to_rgb(h + d_h, jnp.clip(l + d_l, 0, 1), jnp.clip(s + d_s, 0, 1))
    rgb = jnp.where(jax.random.uniform(kg1) > 0.1, jit, rgb)

    sigma = jax.random.uniform(kg2) * jax.random.uniform(kg3) * 0.1
    noise = sigma * jax.random.normal(kg4, rgb.shape[:2])
    noisy = jnp.clip(rgb + noise[..., None], 0.0, 1.0)
    return jnp.where(jax.random.uniform(kg5) > 0.1, noisy, rgb)


# ---------------------------------------------------------------------------
# batch assembly


def _syn_crop_device(key, image, xyz, label, S, max_gt,
                     min_padding=0.5, max_padding=1.0):
    """Device SYN_CROP: square padded crop around a uniformly-chosen present
    object, resized to S x S - the statistics the stage-2 crop network sees
    at inference (crop_rois tight box + padding). Mirrors the host
    `TableTopObject.pad_crop_resize` (ref: lib/datasets/tabletop_object.py:
    175-237): square the tight box, pad each side by uniform(min_padding,
    max_padding) * side (25 px if the pad rounds to 0), clamp, resize -
    bilinear for the image, nearest for label and xyz.

    TPU-native formulation: crop+resize in one as separable SELECTOR-MATRIX
    matmuls (Ry [S,H] / Rx [S,W] interpolation matrices built from the
    data-dependent box; no gathers, fixed shapes, jit/vmap-safe). Nearest
    uses cv2's floor(i*scale) convention; bilinear the standard half-pixel
    two-tap kernel with edge clamp."""
    H, W = label.shape
    k1, k2 = jax.random.split(key)
    ids = jnp.arange(1, max_gt + 1, dtype=jnp.int32)
    present = (label[None] == ids[:, None, None]).any((1, 2))
    idx = jax.random.categorical(
        k1, jnp.where(present, 0.0, -jnp.inf)).astype(jnp.int32) + 1
    fg = label == idx
    rows, cols = fg.any(1), fg.any(0)
    ri = jnp.arange(H, dtype=jnp.float32)
    ci = jnp.arange(W, dtype=jnp.float32)
    y_min = jnp.min(jnp.where(rows, ri, jnp.float32(H)))
    y_max = jnp.max(jnp.where(rows, ri, jnp.float32(-1)))
    x_min = jnp.min(jnp.where(cols, ci, jnp.float32(W)))
    x_max = jnp.max(jnp.where(cols, ci, jnp.float32(-1)))
    cx, cy = (x_min + x_max) / 2, (y_min + y_max) / 2
    xd, yd = x_max - x_min, y_max - y_min
    wide = xd > yd
    y_min = jnp.where(wide, cy - xd / 2, y_min)
    y_max = jnp.where(wide, cy + xd / 2, y_max)
    x_min = jnp.where(wide, x_min, cx - yd / 2)
    x_max = jnp.where(wide, x_max, cx + yd / 2)
    side = x_max - x_min
    pad = jnp.round(side * jax.random.uniform(
        k2, minval=min_padding, maxval=max_padding))
    pad = jnp.where(pad == 0, 25.0, pad)
    y_lo = jnp.clip(jnp.floor(y_min - pad), 0, H - 1)
    y_hi = jnp.clip(jnp.ceil(y_max + pad), 0, H - 1)
    x_lo = jnp.clip(jnp.floor(x_min - pad), 0, W - 1)
    x_hi = jnp.clip(jnp.ceil(x_max + pad), 0, W - 1)
    y_hi = jnp.maximum(y_hi, y_lo + 1)
    x_hi = jnp.maximum(x_hi, x_lo + 1)

    def matrices(lo, hi, size):
        span = hi - lo + 1.0
        grid = jnp.arange(size, dtype=jnp.float32)[None, :]        # [1, size]
        i = jnp.arange(S, dtype=jnp.float32)[:, None]              # [S, 1]
        c = jnp.clip(lo + (i + 0.5) * span / S - 0.5, 0.0, size - 1.0)
        R_lin = jnp.maximum(0.0, 1.0 - jnp.abs(grid - c))          # [S, size]
        near = lo + jnp.clip(jnp.floor(i * span / S), 0, span - 1)
        R_near = (grid == near).astype(jnp.float32)
        return R_lin, R_near

    Ry_l, Ry_n = matrices(y_lo, y_hi, H)
    Rx_l, Rx_n = matrices(x_lo, x_hi, W)
    img_c = jnp.einsum("ih,hwc,jw->ijc", Ry_l, image, Rx_l,
                       precision=_PREC)
    xyz_c = jnp.einsum("ih,hwc,jw->ijc", Ry_n, xyz, Rx_n, precision=_PREC)
    lab_c = jnp.einsum("ih,hw,jw->ij", Ry_n, label.astype(jnp.float32),
                       Rx_n, precision=_PREC)
    return img_c, xyz_c, jnp.round(lab_c).astype(jnp.int32)


def _instances_device(label, max_gt):
    """[H, W] slot-label image -> compacted (masks [G,H,W], labels [G],
    valid [G], renumbered [H,W]) - the device version of
    loader.label_image_to_instances (slots with zero pixels are dropped and
    the rest compacted to the front, preserving order)."""
    ids = jnp.arange(1, max_gt + 1, dtype=jnp.int32)
    masks = (label[None] == ids[:, None, None])          # [G, H, W] bool
    valid = masks.any(axis=(1, 2))
    order = jnp.argsort(~valid, stable=True)             # valid first
    masks = masks[order].astype(jnp.float32)
    valid = valid[order]
    renum = jnp.einsum("ghw,g->hw",
                       masks, jnp.arange(1, max_gt + 1, dtype=jnp.float32)
                       * valid).astype(jnp.int32)
    return masks, jnp.ones(max_gt, jnp.int32), valid, renum


@partial(jax.jit,
         static_argnames=("H", "W", "fx", "fy", "px", "py", "max_gt",
                          "augment", "syn_crop", "crop_size"))
def make_train_batch(key, params, H, W, fx, fy, px, py, max_gt=24,
                     augment=True, syn_crop=False, crop_size=224):
    """One jit: render + augment + normalize (+ SYN_CROP) + instance
    extraction.

    Returns the BatchLoader-contract dict (image normalized BGR, xyz,
    gt_masks, gt_labels, gt_valid, label_image), all on device. With
    syn_crop=True scenes render at (H, W) and every sample is a square
    padded crop around one random object resized to crop_size^2 - the
    reference's SYN_CROP crop-network training mode (_syn_crop_device).
    """
    rgb, depth, label = render_scene_batch(params, H, W, fx, fy, px, py)
    B = rgb.shape[0]
    keys = jax.random.split(key, B * 4).reshape(B, 4, 2)

    def per_image(rgb1, depth1, label1, ks):
        if augment:
            depth1 = augment_depth(ks[0], depth1)
        # analytic xyz from (possibly noised) depth, exactly the TOD path
        rows = jnp.arange(H, dtype=jnp.float32)[:, None]
        cols = jnp.arange(W, dtype=jnp.float32)[None, :]
        xyz1 = jnp.stack([(cols - px) * depth1 / fx,
                          (rows - py) * depth1 / fy, depth1], axis=-1)
        if augment:
            xyz1 = augment_xyz(ks[1], xyz1, depth1)
            rgb1 = augment_rgb(ks[2], rgb1)
        bgr = rgb1[..., ::-1]
        means = jnp.asarray(UCN_PIXEL_MEANS_BGR, jnp.float32) / 255.0
        image = bgr - means
        if syn_crop:
            image, xyz1, label1 = _syn_crop_device(
                ks[3], image, xyz1, label1, crop_size, max_gt)
        masks, labels, valid, renum = _instances_device(label1, max_gt)
        return image, xyz1, masks, labels, valid, renum

    image, xyz, masks, labels, valid, renum = jax.vmap(per_image)(
        rgb, depth, label, keys)
    return {"image": image, "xyz": xyz, "gt_masks": masks,
            "gt_labels": labels, "gt_valid": valid, "label_image": renum}


class SyntheticDeviceLoader:
    """Endless batch iterator: host samples scene params, device does the
    rest. Deterministic in (seed, step). Matches BatchLoader's batch contract
    so Trainer.jit_train_step consumes it unchanged."""

    def __init__(self, batch_size: int, height=480, width=640, max_gt=24,
                 max_objects=9, min_objects=3, image_set="train", seed=0,
                 augment=True, crop_like=False, scene_style="r4",
                 syn_crop=False, crop_size=224, render_hw=(480, 640)):
        self.B = batch_size
        self.H, self.W = height, width
        self.max_gt = max_gt
        # syn_crop: the CORRECT crop-network training mode - render full
        # scenes at render_hw and emit a padded square crop around one
        # random object resized to crop_size^2 (the reference's SYN_CROP,
        # matching crop_rois inference statistics: ONE dominant object
        # filling the frame + partial neighbors). crop_like (zoomed-out
        # few-object scenes) is kept as the round-4 legacy mode; round 5
        # measured that a crop net trained on it SHATTERS objects at
        # inference scale (refined Objects F 0.336) because its objects
        # are 3-4x smaller than real RoI crops.
        self.syn_crop = syn_crop
        self.crop_size = crop_size
        if syn_crop:
            self.H, self.W = render_hw
        self.max_objects = 4 if crop_like else max_objects
        self.min_objects = 1 if crop_like else min_objects
        self.dist_range = (0.35, 0.7) if crop_like else (1.0, 1.4)
        # scene_style='ocid': push the scene statistics toward OCID (up to
        # ~14 instances, touching/stacked objects, concave composites - the
        # clutter regime where the bucketed stage-2 is really tested).
        # 'r4' keeps the round-4 streams bit-identical so the committed
        # checkpoints' held-out evaluation stays stable.
        self.style = dict(p_stack=0.0, p_composite=0.0, touching=False,
                          max_slots=None)
        if scene_style == "ocid":
            self.style = dict(p_stack=0.3, p_composite=0.25, touching=True,
                              max_slots=(6 if crop_like
                                         else max(20, self.max_objects + 6)))
            if not crop_like:
                self.max_objects = max(max_objects, 14)
                self.min_objects = max(min_objects, 5)
        elif scene_style != "r4":
            raise ValueError(f"unknown scene_style {scene_style!r}")
        self.augment = augment
        self.seed = seed
        self.split_salt = {"train": 0, "test": 1 << 20}[image_set]
        # intrinsics follow the RENDER frame (syn_crop renders render_hw)
        self.intr = fov_intrinsics(self.W, self.H)
        self.step = 0

    def params_for(self, indices):
        ps = [sample_scene_params(
            np.random.RandomState(
                (self.seed * 1_000_003 + self.split_salt + int(i))
                % (2 ** 31 - 1)),
            self.intr, max_objects=self.max_objects,
            min_objects=self.min_objects, height=self.H, width=self.W,
            dist_range=self.dist_range, **self.style)
            for i in indices]
        return stack_scene_params(ps)

    def batch_at(self, step: int):
        idx = range(step * self.B, (step + 1) * self.B)
        params = self.params_for(idx)
        key = jax.random.PRNGKey((self.seed << 20) ^ step ^ self.split_salt)
        return make_train_batch(
            key, params, self.H, self.W,
            float(self.intr["fx"]), float(self.intr["fy"]),
            float(self.intr["x_offset"]), float(self.intr["y_offset"]),
            max_gt=self.max_gt, augment=self.augment,
            syn_crop=self.syn_crop, crop_size=self.crop_size)

    def __iter__(self):
        while True:
            b = self.batch_at(self.step)
            self.step += 1
            yield b
