"""Re-measure every trained-regime claim with a REAL trained checkpoint
(VERDICT r3 item 2).

Round 3's trained-regime numbers were proxies (decisive random heads) because
no trained weights existed. This script loads the synthetic-scene checkpoint
(cli/train_msmformer --dataset synthetic, scripts/eval_synthetic.py is the
learning-capability evidence) and re-runs, on the real chip, on rendered
test-stream scenes at the bench operating point (B=8, 480x640, bf16):

  1. the end-to-end two-stage throughput, dense vs decoder.tile_skip=True,
     with the stage-1/refined label agreement between the two
     (the round-3 open question: does tile skipping cross 40 img/s at REAL
     mask concentration?);
  2. the actual crop-slot occupancy a trained model produces (random weights
     gave 5-8 of 20; the proxy note in bench.py says why that regime can't
     show concentration);
  3. the key_stride=2 quality gate with meaningful weights: the reference
     metric block (Objects/Boundary F, lib/utils/evaluation.py protocol) of
     stride-2 vs stride-1 refined labels against the synthetic GT, plus their
     mutual best-IoU (round 3 recorded best-IoU 0.32 on random weights and
     kept key_stride opt-in -- this is the gate re-run the verdict asked for);
  4. the metric block for stage-1 vs refined labels against GT (does zoom-in
     refinement help, the reference's core claim for the two-stage design,
     ref: lib/fcn/test_utils.py:245-421).

NOT an accuracy-parity claim: the checkpoint is trained on procedural
synthetic scenes, not TOD, and the 87.3 OCID number remains blocked on the
published weights + datasets (README "Accuracy-parity status").

Usage:
  python scripts/eval_trained_regime.py --checkpoint output/synth_r4/checkpoint_00xxxxx \
      [--n-batches 4] [--iters 20] [--skip-key-stride]
"""

import argparse
import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--image-size", type=int, nargs=2, default=(480, 640),
                   help="eval resolution (480 640 = the bench operating "
                        "point; smaller for CPU smoke tests)")
    p.add_argument("--n-batches", type=int, default=4,
                   help="distinct rendered scene batches for the quality "
                        "metrics (throughput uses the first batch)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--skip-key-stride", action="store_true")
    p.add_argument("--crop-checkpoint", default=None,
                   help="optional separately trained crop-network checkpoint "
                        "(cli/train_msmformer --crop); defaults to the "
                        "whole-image weights (fully-convolutional, so they "
                        "run at 224^2 crops)")
    p.add_argument("--scene-style", default="r4", choices=["r4", "ocid"],
                   help="held-out scene statistics: 'ocid' = denser clutter "
                        "(up to ~14 instances, touching/stacking, concave "
                        "composites) - the regime where the bucketed stage-2 "
                        "and the throughput target are really tested")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unseenobjectswithmeanshift_tpu.config import get_config
    from unseenobjectswithmeanshift_tpu.pipeline.two_stage import TwoStagePredictor
    from unseenobjectswithmeanshift_tpu.train.trainer import Trainer
    from unseenobjectswithmeanshift_tpu.data.synthetic_jax import SyntheticDeviceLoader
    from unseenobjectswithmeanshift_tpu.utils import checkpoint_io
    from unseenobjectswithmeanshift_tpu.utils.evaluation import (
        multilabel_metrics, aggregate_metrics, print_metrics)

    B, (H, W) = args.batch, args.image_size
    ITERS, DEPTH = args.iters, 2

    # ---- restore the trained weights ------------------------------------
    def load_variables(path):
        cfg = get_config("tabletop_pretrained")
        trainer = Trainer(cfg, dtype=jnp.bfloat16)
        state = trainer.init_state(jax.random.PRNGKey(0), (H, W), batch_size=1)
        state = checkpoint_io.restore(path, jax.device_get(state))
        # device_put ONCE: orbax restores to HOST numpy, and numpy leaves
        # passed to a jit re-upload the full ~200 MB of weights over the dev
        # tunnel on EVERY call (measured: 16.7 s/batch instead of 0.24)
        return jax.device_put({"params": state.params,
                               "batch_stats": state.batch_stats})

    v1 = load_variables(args.checkpoint)
    v2 = load_variables(args.crop_checkpoint) if args.crop_checkpoint else v1
    print(f"# trained checkpoint: {args.checkpoint}"
          + (f" (crop: {args.crop_checkpoint})" if args.crop_checkpoint
             else " (crop net reuses the whole-image weights)"), flush=True)

    # ---- held-out rendered scenes (never trained on: 'test' stream) -----
    loader = SyntheticDeviceLoader(B, height=H, width=W, max_gt=24,
                                   image_set="test", seed=3, augment=False,
                                   scene_style=args.scene_style)
    batches = []
    for i in range(args.n_batches):
        b = loader.batch_at(i)
        batches.append((jnp.asarray(b["image"]), jnp.asarray(b["xyz"]),
                        np.asarray(b["label_image"])))

    img0, xyz0, gt0 = batches[0]

    # ---- streaming throughput (bench.py recipe) --------------------------
    def measure(pred, w1, w2, img, xyz):
        pred._ensure_bucketed_jits()
        s1, s2 = pred._s1_fn, pred._s2_fn
        chk = jax.jit(lambda r: jnp.sum(r))

        def pop(pending):
            labels_, crops_, perm_, count_ = pending.popleft()
            P = next(b for b in pred._buckets(perm_.shape[0])
                     if b >= int(count_))
            return labels_, s2(w2, labels_, crops_, perm_, P=P), int(count_)

        pending = deque(s1(w1, img, xyz, osd=False) for _ in range(2))
        labels, refined, count = pop(pending)
        labels, refined = np.asarray(labels), np.asarray(refined)
        np.asarray(chk(pop(pending)[1]))
        t0 = time.perf_counter()
        pending, last = deque(), None
        for _ in range(ITERS):
            pending.append(s1(w1, img, xyz, osd=False))
            if len(pending) > DEPTH:
                last = pop(pending)[1]
        while pending:
            last = pop(pending)[1]
        np.asarray(chk(last))
        dt = (time.perf_counter() - t0) / ITERS
        return dt, labels, refined, count

    def build(tile_skip=False, key_stride=1):
        cfg = get_config("tabletop_pretrained")
        cfg_crop = get_config("crop_tabletop_pretrained")
        cfg.decoder.tile_skip = tile_skip
        cfg_crop.decoder.tile_skip = tile_skip
        cfg.decoder.key_stride = key_stride
        cfg_crop.decoder.key_stride = key_stride
        return TwoStagePredictor(cfg, cfg_crop, dtype=jnp.bfloat16)

    dense = build()
    dt_d, lab_d, ref_d, count_d = measure(dense, v1, v2, img0, xyz0)
    n_inst = [len([v for v in np.unique(lab_d[i]) if v >= 2])
              for i in range(B)]
    print(f"# dense:     {dt_d * 1e3:7.2f} ms/batch  ({B / dt_d:6.2f} img/s)  "
          f"occupancy {n_inst} of 20 slots/img (mean {np.mean(n_inst):.1f}, "
          f"{count_d} crops/batch)", flush=True)

    try:
        ts = build(tile_skip=True)
        dt_t, lab_t, ref_t, _ = measure(ts, v1, v2, img0, xyz0)
        print(f"# tile-skip: {dt_t * 1e3:7.2f} ms/batch  ({B / dt_t:6.2f} img/s)  "
              f"{dt_d / dt_t:.2f}x vs dense; s1 pixel agreement "
              f"{np.mean(lab_d == lab_t):.4f}, refined best-IoU "
              f"{mean_best_iou(ref_d, ref_t, min_id=1):.4f}", flush=True)
    except Exception as e:   # transient tunnel/compile failures must not
        print(f"# tile-skip block failed: {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)   # void the remaining blocks

    # ---- quality: metric block vs GT over all batches --------------------
    ms_s1, ms_ref = [], []
    for (img, xyz, gt) in batches:
        _, lab, ref, _ = measure_once(dense, v1, v2, img, xyz)
        for i in range(B):
            ms_s1.append(multilabel_metrics(lab[i], gt[i]))
            ms_ref.append(multilabel_metrics(ref[i], gt[i]))
    print(f"\n# stage-1 labels vs GT ({len(ms_s1)} held-out scenes):")
    print_metrics(aggregate_metrics(ms_s1))
    print(f"\n# two-stage refined labels vs GT:")
    print_metrics(aggregate_metrics(ms_ref))

    # ---- key_stride quality gate -----------------------------------------
    if not args.skip_key_stride:
        ks = build(key_stride=2)
        for attempt in range(3):   # the dev tunnel's remote_compile can
            try:                   # drop a response mid-read; retry
                dt_k, lab_k, ref_k, _ = measure(ks, v1, v2, img0, xyz0)
                break
            except Exception as e:
                print(f"# key_stride attempt {attempt + 1} failed: "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                if attempt == 2:
                    return
                time.sleep(20)
        ms_k = []
        for (img, xyz, gt) in batches:
            _, lab, ref, _ = measure_once(ks, v1, v2, img, xyz)
            for i in range(B):
                ms_k.append(multilabel_metrics(ref[i], gt[i]))
        print(f"\n# key_stride=2: {dt_k * 1e3:7.2f} ms/batch "
              f"({B / dt_k:6.2f} img/s, {dt_d / dt_k:.2f}x vs stride 1); "
              f"refined best-IoU vs stride 1: "
              f"{mean_best_iou(ref_d, ref_k, min_id=1):.4f}")
        print("# key_stride=2 refined labels vs GT (gate: compare F to the "
              "stride-1 block above):")
        print_metrics(aggregate_metrics(ms_k))


def measure_once(pred, w1, w2, img, xyz):
    """One synchronous pass (no timing): labels + refined for quality eval."""
    import jax  # noqa: F811

    import numpy as np  # noqa: F811
    pred._ensure_bucketed_jits()
    out = pred._s1_fn(w1, img, xyz, osd=False)
    labels, crops, perm, count = out
    P = next(b for b in pred._buckets(perm.shape[0]) if b >= int(count))
    refined = pred._s2_fn(w2, labels, crops, perm, P=P)
    return None, np.asarray(labels), np.asarray(refined), int(count)


def mean_best_iou(a, b, min_id=2):
    """Symmetric permutation-invariant instance overlap (same as
    scripts/profile_key_stride.py). min_id: 2 for stage-1 label images
    (combine_masks emits 2..T+1), 1 for refined labels (match_label_crop
    renumbers from 1)."""
    import numpy as np  # noqa: F811

    def one_way(x, y, i):
        ids_x = [v for v in np.unique(x[i]) if v >= min_id]
        ids_y = [v for v in np.unique(y[i]) if v >= min_id]
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
    main()
