"""Perf breakdown on the real TPU: backbone / stage-1 model / stage-1+post /
full two-stage. Run: python scripts/profile_breakdown.py"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10):
    import jax
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(jax.tree.leaves(x)[0].ravel()[0]) if hasattr(x, 'ravel') else x, out)
    # cheap sync: pull one scalar
    leaves = [l for l in __import__('jax').tree.leaves(out)]
    np.asarray(leaves[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        leaves = [l for l in __import__('jax').tree.leaves(out)]
        np.asarray(leaves[0].ravel()[0:1])
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from unseenobjectswithmeanshift_tpu.config import get_config
    from unseenobjectswithmeanshift_tpu.pipeline.two_stage import TwoStagePredictor
    from unseenobjectswithmeanshift_tpu.models.segnet import SEGNET
    from unseenobjectswithmeanshift_tpu.models.meta_arch import MSMFormer

    cfg = get_config("tabletop_pretrained")
    cfg_crop = get_config("crop_tabletop_pretrained")
    dtype = jnp.bfloat16
    B, H, W = 4, 480, 640

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    xyz = jnp.asarray((rng.rand(B, H, W, 3) * 2).astype(np.float32))

    # backbone only
    b = cfg.backbone
    seg = SEGNET(network=b.network, input_type=b.input_type, fusion_type=b.fusion_type,
                 num_units=b.num_units, normalize=b.normalize, dtype=dtype)
    vseg = seg.init(jax.random.PRNGKey(0), img, xyz)
    f_back = jax.jit(lambda v, i, x: seg.apply(v, i, x))
    dt = timeit(f_back, vseg, img, xyz)
    print(f"backbone (2 towers, B={B}):      {dt*1000:8.2f} ms  = {dt/B*1000:6.2f} ms/img")

    # stage-1 full model
    model = MSMFormer(cfg=cfg, dtype=dtype)
    v1 = model.init(jax.random.PRNGKey(0), img, xyz)
    f_s1 = jax.jit(lambda v, i, x: model.apply(v, i, x)["pred_masks"])
    dt = timeit(f_s1, v1, img, xyz)
    print(f"stage-1 model (bb+decoder):      {dt*1000:8.2f} ms  = {dt/B*1000:6.2f} ms/img")

    # full pipeline stage1-only labels (model + postprocess)
    pred = TwoStagePredictor(cfg, cfg_crop, dtype=dtype)
    v1p, v2p = pred.init(jax.random.PRNGKey(0), (H, W), crop_size=cfg.test.crop_size)
    f_lab = jax.jit(lambda a, b2, i, x: pred._forward(a, b2, i, x, osd=False, refine=False)[0])
    dt = timeit(f_lab, v1p, v2p, img, xyz)
    print(f"stage-1 + postprocess:           {dt*1000:8.2f} ms  = {dt/B*1000:6.2f} ms/img")

    # full two-stage
    f_full = jax.jit(lambda a, b2, i, x: pred._forward(a, b2, i, x, osd=False, refine=True)[1])
    dt = timeit(f_full, v1p, v2p, img, xyz)
    print(f"full two-stage:                  {dt*1000:8.2f} ms  = {dt/B*1000:6.2f} ms/img")

    # crop model alone at the B*T crop batch
    T, S = cfg.test.max_instances, cfg.test.crop_size
    model_crop = MSMFormer(cfg=cfg_crop, dtype=dtype)
    imgc = jnp.asarray(rng.rand(B * T, S, S, 3).astype(np.float32))
    xyzc = jnp.asarray(rng.rand(B * T, S, S, 3).astype(np.float32))
    f_crop = jax.jit(lambda v, i, x: model_crop.apply(v, i, x)["pred_masks"])
    dt = timeit(f_crop, v2p, imgc, xyzc)
    print(f"crop model ({B*T}x{S}x{S}):        {dt*1000:8.2f} ms  = {dt/B*1000:6.2f} ms/img")


if __name__ == "__main__":
    main()
