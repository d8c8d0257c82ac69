"""Fine-grained timing breakdown of the two-stage pipeline on the real TPU.

Times each sub-component as its own jit (backbone towers, decoder, stage-1
postprocess, crop extraction, crop network, paste-back) so perf work is
attributable. Uses on-device checksums (tunnel-safe, see bench.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unseenobjectswithmeanshift_tpu.config import get_config
from unseenobjectswithmeanshift_tpu.pipeline.two_stage import (
    TwoStagePredictor, stage1_labels,
)
from unseenobjectswithmeanshift_tpu.models.segnet import SEGNET, l2_normalize
from unseenobjectswithmeanshift_tpu.pipeline.refine import crop_rois, match_label_crop


def timeit(fn, args, iters=30):
    """Pipelined: enqueue all iterations, sync once (excludes the dev tunnel's
    ~28 ms per-sync RTT; the TPU executes the queue back-to-back)."""
    chk = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32))
                                 for x in jax.tree.leaves(fn(*a))))
    np.asarray(chk(*args))
    t0 = time.perf_counter()
    outs = [chk(*args) for _ in range(iters)]
    np.asarray(outs[-1])
    return (time.perf_counter() - t0) / iters


def main():
    cfg = get_config("tabletop_pretrained")
    cfg_crop = get_config("crop_tabletop_pretrained")
    dtype = jnp.bfloat16
    B, H, W = 4, 480, 640
    T, S = cfg.test.max_instances, cfg.test.crop_size

    pred = TwoStagePredictor(cfg, cfg_crop, dtype=dtype)
    v1, v2 = pred.init(jax.random.PRNGKey(0), (H, W), crop_size=S)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    xyz = jnp.asarray((rng.rand(B, H, W, 3) * 2).astype(np.float32))

    # ---- stage-1 backbone only ----
    b = cfg.backbone
    backbone = SEGNET(network=b.network, input_type=b.input_type,
                      fusion_type=b.fusion_type, num_units=b.num_units,
                      normalize=b.normalize, dtype=dtype)
    bb_params = {"params": v1["params"]["pretrained_backbone"]}
    if "batch_stats" in v1:
        bb_params["batch_stats"] = v1["batch_stats"]["pretrained_backbone"]
    bb_fn = jax.jit(lambda p, i, x: backbone.apply(p, i, x))
    t_bb = timeit(bb_fn, (bb_params, img, xyz))
    print(f"stage1 backbone (2 towers):   {t_bb*1000:8.2f} ms/batch "
          f"({t_bb/B*1000:6.2f} ms/img)")

    # ---- stage-1 full model (backbone + decoder, light) ----
    m1_fn = jax.jit(lambda v, i, x: pred.model.apply(v, i, x, light=True))
    t_m1 = timeit(m1_fn, (v1, img, xyz))
    print(f"stage1 model (bb+decoder):    {t_m1*1000:8.2f} ms/batch "
          f"({t_m1/B*1000:6.2f} ms/img)  decoder ~= {(t_m1-t_bb)*1000:.2f} ms")

    # ---- stage-1 postprocess ----
    outputs = m1_fn(v1, img, xyz)
    per_img = {"pred_logits": outputs["pred_logits"],
               "mask_embed": outputs["mask_embed"],
               "mask_features": outputs["mask_features"]}

    def post1(per_img, xyz):
        labels, _ = jax.vmap(
            lambda o, d: stage1_labels(cfg, o, d, (H, W), osd=False))(per_img, xyz)
        return labels
    post1_fn = jax.jit(post1)
    t_p1 = timeit(post1_fn, (per_img, xyz))
    print(f"stage1 postprocess:           {t_p1*1000:8.2f} ms/batch")

    labels = post1_fn(per_img, xyz)

    # ---- crop extraction ----
    crops_fn = jax.jit(lambda i, l, x: jax.vmap(
        lambda a, b_, c: crop_rois(a, b_, c, max_instances=T, crop_size=S,
                                   padding=cfg.test.crop_padding))(i, l, x))
    t_cr = timeit(crops_fn, (img, labels, xyz))
    print(f"crop extraction:              {t_cr*1000:8.2f} ms/batch")
    crops = crops_fn(img, labels, xyz)

    # ---- crop backbone only ----
    rgb = crops.rgb.reshape(B * T, S, S, 3)
    dep = crops.xyz.reshape(B * T, S, S, 3)
    bc = cfg_crop.backbone
    backbone_c = SEGNET(network=bc.network, input_type=bc.input_type,
                        fusion_type=bc.fusion_type, num_units=bc.num_units,
                        normalize=bc.normalize, dtype=dtype)
    bb2_params = {"params": v2["params"]["pretrained_backbone"]}
    if "batch_stats" in v2:
        bb2_params["batch_stats"] = v2["batch_stats"]["pretrained_backbone"]
    bb2_fn = jax.jit(lambda p, i, x: backbone_c.apply(p, i, x))
    t_bb2 = timeit(bb2_fn, (bb2_params, rgb, dep))
    print(f"crop backbone (80 crops):     {t_bb2*1000:8.2f} ms/batch")

    # ---- crop full model ----
    present = crops.present.reshape(B * T)
    m2_fn = jax.jit(lambda v, i, x, p: pred.model_crop.apply(
        v, i, x, light=True, present=p))
    t_m2 = timeit(m2_fn, (v2, rgb, dep, present))
    print(f"crop model (bb+decoder):      {t_m2*1000:8.2f} ms/batch  "
          f"decoder ~= {(t_m2-t_bb2)*1000:.2f} ms")

    # ---- full pipeline for reference ----
    full_fn = jax.jit(lambda a, b_, c, d: pred._forward(a, b_, c, d, osd=False,
                                                        refine=True))
    t_full = timeit(full_fn, (v1, v2, img, xyz))
    print(f"TOTAL fused two-stage:        {t_full*1000:8.2f} ms/batch "
          f"({B/t_full:.2f} img/s)")
    n_present = int(np.asarray(jnp.sum(crops.present)))
    print(f"present crops: {n_present} / {B*T}")


if __name__ == "__main__":
    main()
