"""Batch-size sweep of the flagship two-stage pipeline on the real chip
(VERDICT r2 item 6: the B=8 HBM cliff). Measures the shipped bucketed
two-graph path with the pipelined-stream recipe at each B, reports ms/batch,
img/s, the crop-budget bucket used, and the device's live/peak HBM after the
run (memory_stats when the backend exposes it) so the B=4 operating point is
justified by data.
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

H, W = 480, 640
ITERS = 20
DEPTH = 2


def hbm_stats():
    try:
        s = jax.local_devices()[0].memory_stats() or {}
        gib = 1024 ** 3
        return (f"live {s.get('bytes_in_use', 0) / gib:.2f} GiB, "
                f"peak {s.get('peak_bytes_in_use', 0) / gib:.2f} GiB "
                f"of {s.get('bytes_limit', 0) / gib:.2f}")
    except Exception as e:  # tunnel backends may not expose memory_stats
        return f"memory_stats unavailable ({type(e).__name__})"


def run(B):
    cfg = get_config("tabletop_pretrained")
    cfg_crop = get_config("crop_tabletop_pretrained")
    pred = TwoStagePredictor(cfg, cfg_crop, dtype=jnp.bfloat16)
    v1, v2 = pred.init(jax.random.PRNGKey(0), (H, W),
                       crop_size=cfg.test.crop_size)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    xyz = jnp.asarray((rng.rand(B, H, W, 3) * 2).astype(np.float32))

    pred._ensure_bucketed_jits()
    s1, s2 = pred._s1_fn, pred._s2_fn
    chk = jax.jit(lambda r: jnp.sum(r))

    def pop(pending):
        labels_, crops_, perm_, count_ = pending.popleft()
        P = next(b for b in pred._buckets(perm_.shape[0]) if b >= int(count_))
        return labels_, s2(v2, labels_, crops_, perm_, P=P), P

    pending = deque(s1(v1, img, xyz, osd=False) for _ in range(2))
    _, refined, P_used = pop(pending)
    np.asarray(refined)
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
    print(f"# B={B}: {dt * 1000:7.2f} ms/batch  ({B / dt:6.2f} img/s)  "
          f"P={P_used}; HBM: {hbm_stats()}", flush=True)
    return B / dt


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}")
    sizes = [int(a) for a in sys.argv[1:]] or [4, 8]
    best = {b: run(b) for b in sizes}
    b0 = sizes[0]
    for b in sizes[1:]:
        print(f"# B={b} vs B={b0}: {best[b] / best[b0]:.3f}x throughput",
              flush=True)
