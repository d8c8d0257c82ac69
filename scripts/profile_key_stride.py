"""A/B the opt-in decoder.key_stride (strided attention keys) on the real TPU:
throughput (pipelined-stream recipe, depth 2) and label agreement vs stride 1
on the same inputs/weights.

Context: the stage-1 kernel streams K = H*W = 307k keys that are bilinear
interpolates of the backbone's stride-8 grid; the crop decoder streams
K = 224^2 = 50k. key_stride=2 drops K 4x in both. See
config.DecoderConfig.key_stride for the opt-in contract (NOT the parity
configuration).
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from collections import deque

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unseenobjectswithmeanshift_tpu.config import get_config
from unseenobjectswithmeanshift_tpu.pipeline.two_stage import TwoStagePredictor

B, H, W = 4, 480, 640
ITERS = 20
DEPTH = 2


def measure(pred, v1, v2, img, xyz):
    s1 = jax.jit(pred._stage1_and_crops, static_argnames=("osd",))
    s2 = jax.jit(pred._stage2_refine, static_argnames=("P",))
    chk = jax.jit(lambda r: jnp.sum(r))

    def pop(pending):
        labels_, crops_, perm_, count_ = pending.popleft()
        P = next(b for b in pred._buckets(perm_.shape[0]) if b >= int(count_))
        return labels_, s2(v2, labels_, crops_, perm_, P=P)

    pending = deque(s1(v1, img, xyz, osd=False) for _ in range(2))
    labels, refined = pop(pending)
    labels, refined = np.asarray(labels), np.asarray(refined)
    np.asarray(chk(pop(pending)[1]))

    t0 = time.perf_counter()
    pending, last = deque(), None
    for _ in range(ITERS):
        pending.append(s1(v1, img, xyz, osd=False))
        if len(pending) > DEPTH:
            last = pop(pending)[1]
    while pending:
        last = pop(pending)[1]
    np.asarray(chk(last))
    dt = (time.perf_counter() - t0) / ITERS
    return dt, labels, refined


def decisive(variables):
    """Scale the mask/class heads so logits are decisive - the trained-model
    regime (a trained segmenter's masks are far from the 0-logit binarization
    threshold; random weights sit ON it and amplify any perturbation). Same
    technique as tests/test_e2e_parity.py."""
    def scale(path, v):
        keys = [getattr(k, "key", "") for k in path]
        if "mask_embed" in keys and "layers_2" in keys:
            return v * 30.0
        if "class_embed" in keys:
            return v * 20.0
        return v
    return jax.tree_util.tree_map_with_path(scale, variables)


def run(ks, make_decisive=False):
    cfg = get_config("tabletop_pretrained")
    cfg_crop = get_config("crop_tabletop_pretrained")
    cfg.decoder.key_stride = ks
    cfg_crop.decoder.key_stride = ks
    pred = TwoStagePredictor(cfg, cfg_crop, dtype=jnp.bfloat16)
    v1, v2 = pred.init(jax.random.PRNGKey(0), (H, W), crop_size=cfg.test.crop_size)
    if make_decisive:
        v1, v2 = decisive(v1), decisive(v2)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    xyz = jnp.asarray((rng.rand(B, H, W, 3) * 2).astype(np.float32))
    dt, labels, refined = measure(pred, v1, v2, img, xyz)
    tag = " [decisive heads]" if make_decisive else ""
    print(f"key_stride={ks}{tag}: {dt * 1000:7.2f} ms/batch  "
          f"({B / dt:6.2f} img/s)", flush=True)
    return dt, labels, refined


def mean_best_iou(a, b):
    """Permutation-invariant SYMMETRIC instance overlap: best-IoU matches in
    BOTH directions (a->b and b->a), averaged - one-directional matching would
    never penalize extra/hallucinated instances on either side. (Refined
    labels are renumbered by depth/size order, so pixel equality is the wrong
    metric - a single added/dropped stage-1 instance shifts every downstream
    label id.)"""
    def one_way(x, y, i):
        ids_x = [v for v in np.unique(x[i]) if v >= 2]
        ids_y = [v for v in np.unique(y[i]) if v >= 2]
        out = []
        for vx in ids_x:
            mx = x[i] == vx
            best = 0.0
            for vy in ids_y:
                my = y[i] == vy
                inter = np.logical_and(mx, my).sum()
                union = np.logical_or(mx, my).sum()
                best = max(best, inter / union if union else 0.0)
            out.append(best)
        return out

    ious = []
    for i in range(a.shape[0]):
        ious += one_way(a, b, i) + one_way(b, a, i)
    return float(np.mean(ious)) if ious else 1.0


if __name__ == "__main__":
    d1, l1, r1 = run(1)
    for ks in (2, 4):
        d, l, r = run(ks)
        print(f"  vs stride 1: {d1 / d:.2f}x speedup; stage-1 pixel agreement "
              f"{np.mean(l == l1):.4f}; refined mean best-IoU "
              f"{mean_best_iou(r1, r):.4f} "
              f"(random weights = worst case: mask logits sit near the "
              f"binarization threshold)", flush=True)
    # quality proxy at the TRAINED-model operating point (decisive heads):
    _, l1d, r1d = run(1, make_decisive=True)
    for ks in (2, 4):
        _, l, r = run(ks, make_decisive=True)
        print(f"  decisive stride {ks} vs 1: stage-1 pixel agreement "
              f"{np.mean(l == l1d):.4f}; refined mean best-IoU "
              f"{mean_best_iou(r1d, r):.4f}", flush=True)
