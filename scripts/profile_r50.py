"""R50-family TPU throughput: the UOAIS_ResNet50 configuration (detectron2-style
ResNet50 -> MSDeformAttnPixelDecoder (3 levels + FPN) -> 3-level
MeanShiftTransformerDecoder), single-stage whole-image eval - the reference's
UOAIS_ResNet50 reproduction mode (configs/UOAIS_ResNet50.yaml; the R50 configs
publish whole-image numbers, no crop stage).

Also prints the two-stage variant for completeness. Pipelined-stream timing
recipe (see scripts/profile_breakdown.py): enqueue all iterations, sync once.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unseenobjectswithmeanshift_tpu.pipeline.factory import (
    build_two_stage_predictor,
)

B, H, W = 4, 480, 640
ITERS = 20


def main():
    import sys
    preset = sys.argv[1] if len(sys.argv) > 1 else "uoais_resnet50"
    fast = "fast" in sys.argv[2:]
    if fast:
        # opt-in bf16 pixel decoder (NOT the parity configuration)
        from unseenobjectswithmeanshift_tpu.pipeline import factory
        from unseenobjectswithmeanshift_tpu.config import get_config as _gc

        def _fast_cfg(name):
            cfg = _gc(name)
            cfg.pixel_decoder.fp32 = False
            return cfg

        factory.get_config = _fast_cfg
        preset_tag = preset + " [bf16 pixel decoder]"
    else:
        preset_tag = preset
    pred, v1, v2, cfg, _ = build_two_stage_predictor(
        preset, bf16=True, image_shape=(H, W))
    rng = np.random.RandomState(0)
    img = jnp.asarray((rng.rand(B, H, W, 3) * 255).astype(np.float32))
    xyz = jnp.asarray((rng.rand(B, H, W, 3) * 2).astype(np.float32))

    chk = jax.jit(lambda r: jnp.sum(r))

    # single-stage (refine=False): the published-eval mode for this config.
    # v passed as an ARGUMENT (never close over device arrays in an ad-hoc
    # jit - they bake into the HLO as constants and stall the remote compile)
    def single(v, img_, xyz_):
        labels, _, _, _ = pred._stage1_and_crops(v, img_, xyz_, osd=False)
        return labels

    s1 = jax.jit(single)
    labels = np.asarray(s1(v1, img, xyz))
    assert labels.shape == (B, H, W)
    np.asarray(chk(s1(v1, img, xyz)))
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = s1(v1, img, xyz)
    np.asarray(chk(out))
    dt = (time.perf_counter() - t0) / ITERS
    n_inst = [len([v for v in np.unique(labels[i]) if v >= 2]) for i in range(B)]
    print(f"{preset_tag} single-stage: {dt * 1000:7.2f} ms/batch ({B / dt:6.2f} img/s) "
          f"instances/img {n_inst}", flush=True)

    # two-stage (crop refinement through the same bucketed path)
    from collections import deque

    from unseenobjectswithmeanshift_tpu.pipeline.refine import pick_crop_budget

    s1c = jax.jit(pred._stage1_and_crops, static_argnames=("osd",))
    s2 = jax.jit(pred._stage2_refine, static_argnames=("P",))

    def pop(pending):
        labels_, crops_, perm_, count_ = pending.popleft()
        n = int(count_)
        if n == 0:       # the serving path's early-out (_finish_bucketed)
            return labels_
        return s2(v2, labels_, crops_, perm_,
                  P=pick_crop_budget(perm_.shape[0], n))

    pending = deque(s1c(v1, img, xyz, osd=False) for _ in range(2))
    np.asarray(chk(pop(pending)))
    np.asarray(chk(pop(pending)))
    t0 = time.perf_counter()
    pending, last = deque(), None
    for _ in range(ITERS):
        pending.append(s1c(v1, img, xyz, osd=False))
        if len(pending) > 2:
            last = pop(pending)
    while pending:
        last = pop(pending)
    np.asarray(chk(last))
    dt2 = (time.perf_counter() - t0) / ITERS
    print(f"{preset_tag} two-stage:   {dt2 * 1000:7.2f} ms/batch ({B / dt2:6.2f} img/s)",
          flush=True)


if __name__ == "__main__":
    main()
