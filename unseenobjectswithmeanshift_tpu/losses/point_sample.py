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


def build_sample_window(masks, dtype=None):
    """Precompute the 4-tap window tensor for point_sample: win[n, a, b] =
    [mz[a, b], mz[a, b+1], mz[a+1, b], mz[a+1, b+1]] with mz the map
    zero-padded by one row/col on every side (anchor = y0+1, x0+1 in padded
    coords). Build it ONCE when the same maps are sampled at several coord
    sets (e.g. the gt masks across every deep-supervision head).

    dtype: optional storage dtype. bf16 is BITWISE-exact for 0/1 target masks
    (the bilinear weights stay fp32, and bf16*fp32 promotes); for logit maps
    bf16 matches the reference's AMP behavior (criterion point sampling runs
    under autocast, tabletop_train_net_pretrained.py:231-234)."""
    masks = masks if dtype is None else masks.astype(dtype)
    mz = jnp.pad(masks, ((0, 0), (1, 1), (1, 1)))
    return jnp.stack([mz[:, :-1, :-1], mz[:, :-1, 1:],
                      mz[:, 1:, :-1], mz[:, 1:, 1:]], axis=-1)  # [N, H+1, W+1, 4]


def point_sample(masks, points, win=None, hw=None):
    """Sample [.., H, W] mask maps at normalized points.

    masks: [N, H, W] (or None with win + hw given); points: [N, P, 2] with
    (x, y) in [0, 1]. Returns [N, P] fp32. grid_sample align_corners=False
    semantics with zero padding: src = p * size - 0.5, bilinear, out-of-range
    neighbours contribute zero.

    The four bilinear taps are gathered as ONE window row from the prebuilt
    window tensor (win, see build_sample_window) instead of four scattered
    per-element gathers - per-element gathers dominate the TPU train step, and
    a contiguous row costs the same as a single element. Padding keeps the
    zero-contribution semantics of out-of-range neighbours exactly: src coords
    lie in [-0.5, size - 0.5], so the +1-shifted anchor always lands inside
    the padded map and no range masks are needed.
    """
    if win is None:
        H, W = masks.shape[1], masks.shape[2]
        win = build_sample_window(masks)
    else:
        H, W = hw

    def sample_one(w4, pts):
        fx = pts[:, 0] * W - 0.5
        fy = pts[:, 1] * H - 0.5
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        wx = fx - x0
        wy = fy - y0
        taps = w4[y0 + 1, x0 + 1]                               # [P, 4]
        wgt = jnp.stack([(1 - wy) * (1 - wx), (1 - wy) * wx,
                         wy * (1 - wx), wy * wx], axis=-1)       # [P, 4]
        return (taps.astype(jnp.float32) * wgt).sum(-1)

    return jax.vmap(sample_one)(win, points)


def calculate_uncertainty(logits):
    """-|logit|: most uncertain where logits are near 0 (ref: criterion.py:73-87)."""
    return -jnp.abs(logits)


def get_uncertain_point_coords_with_randomness(
        rng, mask_logits, num_points: int, oversample_ratio: float,
        importance_sample_ratio: float, row_idx=None, total_rows=None):
    """mask_logits: [N, H, W]. Returns [N, num_points, 2] (x, y) in [0, 1].

    1. sample num_points * oversample random points
    2. keep the importance_sample_ratio fraction with highest uncertainty
    3. fill the rest with fresh random points

    row_idx/total_rows: when the caller compacted its maps from total_rows
    down to N rows (pair compaction in the criterion), draw the uniforms at
    [total_rows, ...] and gather row_idx so the coords for every surviving row
    are BIT-IDENTICAL to the uncompacted draw - compaction then provably
    cannot change the loss. The draw itself is cheap; only the per-point map
    sampling below scales with N.
    """
    N = mask_logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain
    draw_n = total_rows if total_rows is not None else N

    k1, k2 = jax.random.split(rng)
    coords = jax.random.uniform(k1, (draw_n, num_sampled, 2))
    if row_idx is not None:
        coords = coords[row_idx]
    logits = point_sample(mask_logits, coords)
    unc = calculate_uncertainty(logits)                       # [N, num_sampled]
    _, idx = jax.lax.top_k(unc, num_uncertain)
    picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
    rand = jax.random.uniform(k2, (draw_n, num_random, 2))
    if row_idx is not None:
        rand = rand[row_idx]
    return jnp.concatenate([picked, rand], axis=1)


def point_sample_features(features, points):
    """Bilinearly sample [H, W, C] feature maps at normalized points.

    features: [H, W, C]; points: [P, 2] (x, y) in [0, 1]. Returns [P, C].
    Same grid_sample semantics as point_sample, but gathers CONTIGUOUS feature
    rows instead of per-element values. Sampling per-query mask maps
    (mask_embed @ mask_features) at P points is a [P]-element gather per query
    per tap - 5M scattered elements per call, 76 ms on the TPU; sampling the
    shared feature map once and applying mask_embed afterwards is linear in the
    features, so the results are identical and the gather is 4 row-taps.
    """
    H, W, C = features.shape
    fx = points[:, 0] * W - 0.5
    fy = points[:, 1] * H - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    wx = (fx - x0)[:, None]
    wy = (fy - y0)[:, None]

    def tap(yi, xi, w):
        inb = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))[:, None]
        rows = features[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]  # [P, C]
        return jnp.where(inb, rows, 0.0) * w

    return (tap(y0, x0, (1 - wy) * (1 - wx)) + tap(y0, x0 + 1, (1 - wy) * wx)
            + tap(y0 + 1, x0, wy * (1 - wx)) + tap(y0 + 1, x0 + 1, wy * wx))


def point_sample_factored(mask_embed, mask_features, points):
    """Sample the factored mask maps (mask_embed @ mask_features) at points.

    mask_embed: [N, C]; mask_features: [H, W, C] (shared); points: [N, P, 2]
    OR [1, P, 2] (shared point set). Returns [N, P] == point_sample of the
    materialized [N, H, W] maps (bilinear commutes with the channel dot).
    """
    f32 = jnp.float32
    if points.shape[0] == 1:
        pts = point_sample_features(mask_features, points[0]).astype(f32)
        return jnp.einsum("nc,pc->np", mask_embed.astype(f32), pts,
                          precision=jax.lax.Precision.HIGHEST)
    pts = jax.vmap(lambda p: point_sample_features(mask_features, p))(points)
    return jnp.einsum("nc,npc->np", mask_embed.astype(f32), pts.astype(f32),
                      precision=jax.lax.Precision.HIGHEST)
