"""Micro-profile of stage-1 postprocess + crop-extraction + paste-back on the
TPU, with PIPELINED timing (enqueue all iters, sync once) so the dev tunnel's
~28 ms per-sync RTT is excluded."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unseenobjectswithmeanshift_tpu.pipeline.postprocess import (
    instance_inference, get_confident_instances, combine_masks,
    filter_labels_depth,
)
from unseenobjectswithmeanshift_tpu.pipeline.refine import crop_rois, match_label_crop


def timeit(name, fn, *args, iters=30):
    chk = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32))
                                 for x in jax.tree.leaves(fn(*a))))
    np.asarray(chk(*args))
    t0 = time.perf_counter()
    outs = [chk(*args) for _ in range(iters)]
    np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1000:8.2f} ms/batch")
    return dt


def main():
    B, H, W, Q, C, T = 4, 480, 640, 100, 256, 20
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    pred_logits = jnp.asarray(rng.randn(B, Q, 3).astype(np.float32))
    mask_embed = jnp.asarray(rng.randn(B, Q, C).astype(np.float32)).astype(dt)
    mask_features = jnp.asarray(
        rng.randn(B, H, W, C).astype(np.float32) * 0.1).astype(dt)
    xyz = jnp.asarray((rng.rand(B, H, W, 3) * 2).astype(np.float32))
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

    ii = jax.vmap(lambda l, e, f: instance_inference(
        l, None, num_classes=2, topk=T, mask_embed=e, mask_features=f,
        out_hw=(H, W)))
    timeit("instance_inference", ii, pred_logits, mask_embed, mask_features)
    inst = jax.jit(ii)(pred_logits, mask_embed, mask_features)

    gc = jax.vmap(lambda i: get_confident_instances(
        i, topk=True, score=0.7, num_classes=2, low_threshold=0.4))
    inst2 = jax.jit(gc)(inst)

    cm = jax.vmap(lambda i: combine_masks(gc(i)))
    timeit("get_confident+combine_masks", cm, inst)
    labels = jax.jit(jax.vmap(combine_masks))(inst2)

    fd = jax.vmap(lambda l, z: filter_labels_depth(l, z, 0.5, T + 2))
    timeit("filter_labels_depth", fd, labels, xyz[..., 2])
    labels = jax.jit(fd)(labels, xyz[..., 2])

    cr = jax.vmap(lambda i, l, x: crop_rois(i, l, x, max_instances=T,
                                            crop_size=224, padding=0.25))
    timeit("crop_rois (selector matmuls)", cr, img, labels, xyz)
    crops = jax.jit(cr)(img, labels, xyz)

    labels_crop = jnp.asarray(
        rng.randint(0, 5, size=(B, T, 224, 224)).astype(np.int32))
    ml = jax.vmap(lambda lab, cr_, lc: match_label_crop(
        lc, cr_.mask, cr_.rois, cr_.xyz[..., 2], cr_.present, (H, W),
        overlap_threshold=0.5))
    timeit("match_label_crop (paste)", ml, labels, crops, labels_crop)

    n = [len([v for v in np.unique(np.asarray(labels[i])) if v >= 2])
         for i in range(B)]
    print(f"instances/img: {n}")


if __name__ == "__main__":
    main()
