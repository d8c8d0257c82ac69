"""A/B the opt-in decoder.key_stride (strided attention keys) on the real TPU:
throughput (pipelined-stream recipe, depth 2) and label agreement vs stride 1
on the same inputs/weights.

Context: the stage-1 kernel streams K = H*W = 307k keys that are bilinear
interpolates of the backbone's stride-8 grid; the crop decoder streams
K = 224^2 = 50k. key_stride=2 drops K 4x in both. See
config.DecoderConfig.key_stride for the opt-in contract (NOT the parity
configuration).
"""

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


def run(ks):
    cfg = get_config("tabletop_pretrained")
    cfg_crop = get_config("crop_tabletop_pretrained")
    cfg.decoder.key_stride = ks
    cfg_crop.decoder.key_stride = ks
    pred = TwoStagePredictor(cfg, cfg_crop, dtype=jnp.bfloat16)
    v1, v2 = pred.init(jax.random.PRNGKey(0), (H, W), crop_size=cfg.test.crop_size)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    xyz = jnp.asarray((rng.rand(B, H, W, 3) * 2).astype(np.float32))
    dt, labels, refined = measure(pred, v1, v2, img, xyz)
    print(f"key_stride={ks}: {dt * 1000:7.2f} ms/batch  "
          f"({B / dt:6.2f} img/s)", flush=True)
    return dt, labels, refined


if __name__ == "__main__":
    d1, l1, r1 = run(1)
    for ks in (2, 4):
        d, l, r = run(ks)
        print(f"  vs stride 1: {d1 / d:.2f}x speedup; label agreement "
              f"stage1={np.mean(l == l1):.4f} refined={np.mean(r == r1):.4f} "
              f"(random weights = worst case: mask logits sit near the "
              f"binarization threshold)", flush=True)
