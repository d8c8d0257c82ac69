"""Point sampling on mask logits (detectron2 point_rend equivalents).

- point_sample: bilinear sampling at normalized (x, y) in [0, 1]^2, matching
  F.grid_sample(2*p - 1, align_corners=False, padding_mode='zeros') as used by
  the matcher and criterion (ref: modeling/matcher.py:122-132,
  modeling/criterion.py:161-181).
- get_uncertain_point_coords_with_randomness: importance sampling of uncertain
  points (ref: detectron2 point_rend.point_features, parameters
  oversample_ratio=3.0, importance_sample_ratio=0.75 from the shipped configs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def point_sample(masks, points):
    """Sample [.., H, W] mask maps at normalized points.

    masks: [N, H, W]; points: [N, P, 2] with (x, y) in [0, 1].
    Returns [N, P]. grid_sample align_corners=False semantics with zero padding:
    src = p * size - 0.5, bilinear, out-of-range neighbours contribute zero.
    """
    N, H, W = masks.shape

    def sample_one(m, pts):
        fx = pts[:, 0] * W - 0.5
        fy = pts[:, 1] * H - 0.5
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        wx = fx - x0
        wy = fy - y0

        def tap(yi, xi, w):
            inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            v = m[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
            return jnp.where(inb, v, 0.0) * w

        return (tap(y0, x0, (1 - wy) * (1 - wx)) + tap(y0, x0 + 1, (1 - wy) * wx)
                + tap(y0 + 1, x0, wy * (1 - wx)) + tap(y0 + 1, x0 + 1, wy * wx))

    return jax.vmap(sample_one)(masks, points)


def calculate_uncertainty(logits):
    """-|logit|: most uncertain where logits are near 0 (ref: criterion.py:73-87)."""
    return -jnp.abs(logits)


def get_uncertain_point_coords_with_randomness(
        rng, mask_logits, num_points: int, oversample_ratio: float,
        importance_sample_ratio: float):
    """mask_logits: [N, H, W]. Returns [N, num_points, 2] (x, y) in [0, 1].

    1. sample num_points * oversample random points
    2. keep the importance_sample_ratio fraction with highest uncertainty
    3. fill the rest with fresh random points
    """
    N = mask_logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain

    k1, k2 = jax.random.split(rng)
    coords = jax.random.uniform(k1, (N, num_sampled, 2))
    logits = point_sample(mask_logits, coords)
    unc = calculate_uncertainty(logits)                       # [N, num_sampled]
    _, idx = jax.lax.top_k(unc, num_uncertain)
    picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
    rand = jax.random.uniform(k2, (N, num_random, 2))
    return jnp.concatenate([picked, rand], axis=1)
