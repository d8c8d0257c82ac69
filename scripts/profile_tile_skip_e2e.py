"""End-to-end tile-skip A/B on the real chip: the FULL two-stage pipeline
(bench.py configuration) with decoder.tile_skip on/off, at two operating
points:

- random weights (the parity-bench regime): masks are dense, the plan skips
  ~nothing, and the run verifies the opt-in's overhead AND that the label
  images are BIT-IDENTICAL end to end (the tile-skip contract is exactness
  for any inputs - tests/test_tile_skip.py proves it in interpret mode, this
  proves it compiled, through both stages, planner included).
- decisive heads (mask/class heads scaled like tests/test_e2e_parity.py -
  the trained-model regime where mask logits commit): reports the measured
  tile occupancy per stage and the end-to-end speedup that regime buys.

Pipelined-stream timing recipe (see scripts/profile_breakdown.py).
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


def decisive(variables):
    def scale(path, v):
        keys = [getattr(k, "key", "") for k in path]
        if "mask_embed" in keys and "layers_2" in keys:
            return v * 30.0
        if "class_embed" in keys:
            return v * 20.0
        return v
    return jax.tree_util.tree_map_with_path(scale, variables)


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
    return dt, labels, np.asarray(refined)


def run(tile_skip, make_decisive, force_all=False):
    cfg = get_config("tabletop_pretrained")
    cfg_crop = get_config("crop_tabletop_pretrained")
    cfg.decoder.tile_skip = tile_skip
    cfg_crop.decoder.tile_skip = tile_skip
    cfg.decoder.tile_skip_force_all = force_all
    cfg_crop.decoder.tile_skip_force_all = force_all
    pred = TwoStagePredictor(cfg, cfg_crop, dtype=jnp.bfloat16)
    v1, v2 = pred.init(jax.random.PRNGKey(0), (H, W),
                       crop_size=cfg.test.crop_size)
    if make_decisive:
        v1, v2 = decisive(v1), decisive(v2)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    xyz = jnp.asarray((rng.rand(B, H, W, 3) * 2).astype(np.float32))
    dt, labels, refined = measure(pred, v1, v2, img, xyz)
    tag = ("decisive" if make_decisive else "random") + (
        " +skip+ALL" if (tile_skip and force_all) else
        (" +tile_skip" if tile_skip else "          "))
    print(f"# {tag}: {dt * 1000:7.2f} ms/batch  ({B / dt:6.2f} img/s)",
          flush=True)
    return dt, labels, refined


def diff_report(l0, r0, l1, r1, what):
    same = np.array_equal(l0, l1) and np.array_equal(r0, r1)
    print(f"#   -> {what}: labels bit-identical: {same}", flush=True)
    if not same:
        print(f"#      stage-1 diff px: {np.mean(l0 != l1):.2e}  "
              f"stage-2 diff px: {np.mean(r0 != r1):.2e}", flush=True)
    return same


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}")
    for regime in (False, True):
        d0, l0, r0 = run(False, regime)
        d1, l1, r1 = run(True, regime)
        print(f"#   -> speedup {d0 / d1:.2f}x", flush=True)
        diff_report(l0, r0, l1, r1, "dense vs tile_skip")
        # CONTROL: tile_skip graph with the plan forced all-present (plan ops
        # + scalar-prefetch kernel in the graph, ZERO tiles skipped).
        #  - control == tile_skip  but != dense  => drift comes from XLA
        #    scheduling the surrounding graph differently once plan ops are
        #    added (planner exonerated)
        #  - control == dense but != tile_skip   => the certificate skips a
        #    tile it shouldn't (planner hole)
        dc, lc, rc = run(True, regime, force_all=True)
        ctrl_vs_dense = diff_report(l0, r0, lc, rc, "CONTROL(all-present) vs dense")
        ctrl_vs_skip = diff_report(l1, r1, lc, rc, "CONTROL(all-present) vs tile_skip")
        if ctrl_vs_skip and not ctrl_vs_dense:
            print("#   VERDICT: drift reproduced with zero tiles skipped -> "
                  "XLA graph-scheduling difference, planner exonerated",
                  flush=True)
        elif ctrl_vs_dense and not ctrl_vs_skip:
            print("#   VERDICT: drift vanishes when no tiles are skipped -> "
                  "certificate hole, fix the planner margin", flush=True)
        elif ctrl_vs_dense and ctrl_vs_skip:
            print("#   VERDICT: all three bit-identical at this operating "
                  "point", flush=True)
