"""Where do the R50 single-stage 598 ms/batch go? Isolates, on the real chip:

  - ResNet50 backbone alone
  - backbone + MSDeformAttnPixelDecoder (encoder = 6 deformable-attn layers)
  - full StandardMaskFormer forward (adds the 3-level MeanShiftDecoder)
  - ms_deform_attn_core in isolation at the encoder's real shapes
  - full single-stage pipeline (adds postprocess/labels)

Pipelined timing recipe per scripts/profile_breakdown.py: enqueue all ITERS
iterations of a jit whose scalar output depends on the compute, sync once.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unseenobjectswithmeanshift_tpu.config import get_config
from unseenobjectswithmeanshift_tpu.models.meta_arch import build_model
from unseenobjectswithmeanshift_tpu.models.backbone_resnet import ResNetBackbone
from unseenobjectswithmeanshift_tpu.models.pixel_decoders import (
    MSDeformAttnPixelDecoder,
)
from unseenobjectswithmeanshift_tpu.ops import ms_deform_attn as mda
from unseenobjectswithmeanshift_tpu.pipeline.factory import (
    build_two_stage_predictor,
)

B, H, W = 4, 480, 640
ITERS = 20
DT = jnp.bfloat16


def bench(fn, *args, warmup=2, iters=ITERS):
    chk = jax.jit(lambda r: jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    np.asarray(chk(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(chk(out))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray((rng.rand(B, H, W, 3) * 255).astype(np.float32))

    # ---- backbone alone ----
    bb = ResNetBackbone(dtype=DT)
    x = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)).astype(DT)
    vb = bb.init(jax.random.PRNGKey(0), x)
    dt = bench(lambda v, a: bb.apply(v, a), vb, x)
    print(f"backbone (R50):            {dt*1000:8.2f} ms/batch", flush=True)
    feats = jax.jit(bb.apply)(vb, x)

    # ---- pixel decoder (6-layer deformable-attn encoder + FPN fuse) ----
    pd = MSDeformAttnPixelDecoder(feature_channels=(256, 512, 1024, 2048),
                                  conv_dim=256, mask_dim=256, enc_layers=6,
                                  dtype=DT)
    vpd = pd.init(jax.random.PRNGKey(0), feats)
    dt = bench(lambda v, f: pd.apply(v, f), vpd, feats)
    print(f"pixel decoder (6 enc lyr): {dt*1000:8.2f} ms/batch", flush=True)

    # ---- ms_deform_attn_core isolation at encoder shapes ----
    shapes = [(H // 8, W // 8), (H // 16, W // 16), (H // 32, W // 32)]
    Len = sum(h * w for h, w in shapes)
    NH, D, L, P = 8, 32, 3, 4
    value = jnp.asarray(rng.randn(B, Len, NH, D).astype(np.float32)).astype(DT)
    locs = jnp.asarray(rng.rand(B, Len, NH, L, P, 2).astype(np.float32))
    wts = jnp.asarray(rng.rand(B, Len, NH, L, P).astype(np.float32)).astype(DT)
    dt = bench(lambda v, lo, w_: mda.ms_deform_attn_core(v, shapes, lo, w_),
               value, locs, wts)
    print(f"  core (gather) 1 layer:   {dt*1000:8.2f} ms/batch", flush=True)
    if hasattr(mda, "ms_deform_attn_core_packed"):
        dt = bench(lambda v, lo, w_: mda.ms_deform_attn_core_packed(
            v, shapes, lo, w_), value, locs, wts)
        print(f"  core (packed) 1 layer:   {dt*1000:8.2f} ms/batch", flush=True)

    # ---- full meta-arch forward ----
    cfg = get_config("uoais_resnet50")
    model = build_model(cfg)
    vm = model.init(jax.random.PRNGKey(0), img)
    dt = bench(lambda v, a: model.apply(v, a, light=True), vm, img)
    print(f"meta-arch fwd (light):     {dt*1000:8.2f} ms/batch", flush=True)

    # ---- full single-stage pipeline ----
    pred, v1, _, _, _ = build_two_stage_predictor(
        "uoais_resnet50", bf16=True, image_shape=(H, W))
    xyz = jnp.asarray((rng.rand(B, H, W, 3) * 2).astype(np.float32))
    dt = bench(lambda v, a, b: pred._stage1_and_crops(v, a, b, osd=False)[0],
               v1, img, xyz)
    print(f"single-stage pipeline:     {dt*1000:8.2f} ms/batch "
          f"({B/dt:6.2f} img/s)", flush=True)


if __name__ == "__main__":
    main()
