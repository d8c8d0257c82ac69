"""MS deformable attention core vs the torch grid_sample oracle (the reference's
own CUDA-kernel spec, ops/functions/ms_deform_attn_func.py:52-72)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from unseenobjectswithmeanshift_tpu.ops.ms_deform_attn import (
    ms_deform_attn_core, MSDeformAttn,
)


def torch_ms_deform_attn_core(value, shapes, locs, weights):
    """Oracle: per level, grid_sample(value_l, 2*loc-1, bilinear, zeros,
    align_corners=False), weighted sum."""
    B, _, H, D = value.shape
    _, Lq, _, L, P, _ = locs.shape
    splits = [h * w for h, w in shapes]
    values = torch.split(value, splits, dim=1)
    grids = 2 * locs - 1
    out = []
    for l, (h, w) in enumerate(shapes):
        vl = values[l].flatten(2).transpose(1, 2).reshape(B * H, D, h, w)
        g = grids[:, :, :, l].transpose(1, 2).flatten(0, 1)   # [B*H, Lq, P, 2]
        s = TF.grid_sample(vl, g, mode="bilinear", padding_mode="zeros",
                           align_corners=False)               # [B*H, D, Lq, P]
        out.append(s)
    w_ = weights.transpose(1, 2).reshape(B * H, 1, Lq, L * P)
    o = (torch.stack(out, dim=-2).flatten(-2) * w_).sum(-1)
    return o.view(B, H * D, Lq).transpose(1, 2).contiguous()


def test_core_matches_torch_oracle(rng):
    B, H, D, Lq, P = 2, 4, 8, 17, 4
    shapes = [(12, 16), (6, 8), (3, 4)]
    L = len(shapes)
    Len = sum(h * w for h, w in shapes)
    value = rng.randn(B, Len, H, D).astype(np.float32)
    locs = rng.rand(B, Lq, H, L, P, 2).astype(np.float32) * 1.2 - 0.1  # some OOB
    weights = rng.rand(B, Lq, H, L, P).astype(np.float32)
    weights /= weights.reshape(B, Lq, H, -1).sum(-1)[..., None].reshape(
        B, Lq, H, 1, 1)

    ref = torch_ms_deform_attn_core(
        torch.from_numpy(value), shapes, torch.from_numpy(locs),
        torch.from_numpy(weights)).numpy()
    mine = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(weights)))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_msdeform_module_shapes(rng):
    shapes = [(8, 8), (4, 4)]
    Len = sum(h * w for h, w in shapes)
    B, Lq, C = 1, 20, 32
    m = MSDeformAttn(d_model=C, n_levels=2, n_heads=4, n_points=4)
    q = jnp.asarray(rng.randn(B, Lq, C).astype(np.float32))
    ref_pts = jnp.asarray(rng.rand(B, Lq, 2, 2).astype(np.float32))
    inp = jnp.asarray(rng.randn(B, Len, C).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), q, ref_pts, inp, shapes)
    out = m.apply(variables, q, ref_pts, inp, shapes)
    assert out.shape == (B, Lq, C)
    # zero-init offset kernel + reference bias -> offsets depend only on bias
    assert np.isfinite(np.asarray(out)).all()


def test_core_packed_matches_gather_core(rng):
    """The packed-window core is the gather core's drop-in serving fast path:
    identical tap values/masks/lerp weights, including far-out-of-range
    locations (both formulations must zero them)."""
    from unseenobjectswithmeanshift_tpu.ops.ms_deform_attn import (
        ms_deform_attn_core_packed,
    )
    B, H, D, Lq, P = 2, 4, 8, 23, 4
    shapes = [(12, 16), (6, 8), (3, 4)]
    L = len(shapes)
    Len = sum(h * w for h, w in shapes)
    value = rng.randn(B, Len, H, D).astype(np.float32)
    # heavy OOB coverage: in-range, border-straddling, and far outside
    locs = rng.rand(B, Lq, H, L, P, 2).astype(np.float32) * 3.0 - 1.0
    weights = rng.rand(B, Lq, H, L, P).astype(np.float32)

    want = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(weights)))
    got = np.asarray(ms_deform_attn_core_packed(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(weights)))
    np.testing.assert_allclose(got, want, atol=2e-5)

    ref = torch_ms_deform_attn_core(
        torch.from_numpy(value), shapes, torch.from_numpy(locs),
        torch.from_numpy(weights)).numpy()
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_core_packed_matches_gather_core_bf16(rng):
    """bf16 values (the compute dtype when the module runs under bf16): both
    cores keep the lerp weights f32, so they must agree to bf16 resolution."""
    from unseenobjectswithmeanshift_tpu.ops.ms_deform_attn import (
        ms_deform_attn_core_packed,
    )
    B, H, D, Lq, P = 1, 4, 8, 16, 4
    shapes = [(12, 16), (6, 8)]
    L = len(shapes)
    Len = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.randn(B, Len, H, D).astype(np.float32)).astype(
        jnp.bfloat16)
    locs = jnp.asarray(rng.rand(B, Lq, H, L, P, 2).astype(np.float32))
    weights = jnp.asarray(
        rng.rand(B, Lq, H, L, P).astype(np.float32)).astype(jnp.bfloat16)

    want = np.asarray(ms_deform_attn_core(value, shapes, locs, weights),
                      np.float32)
    got = np.asarray(ms_deform_attn_core_packed(value, shapes, locs, weights),
                     np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
