"""Re-validate the UCN family's claims with TRAINED embeddings (VERDICT r4
item 5 / round-3 advisor item 1).

The UCN pipeline's published numbers in this repo (48.2 img/s two-stage,
Pallas-FPS seeding label agreement 1.0000) were measured at random weights,
where embeddings collapse to one cluster and stage 2 runs near-empty. This
script loads a synthetic-scene-trained UCN embedding checkpoint
(cli/train_net --dataset synthetic, the same hookup train_msmformer has) and
re-measures, on rendered held-out scenes:

  1. end-to-end two-stage throughput with a LOADED stage 2 (real crop
     occupancy from real clusters);
  2. Pallas-FPS vs XLA-scan seeding: refined-label pixel agreement and
     permutation-invariant best-IoU at trained embeddings (the claim that
     the VMEM FPS kernel is clustering-equivalent, PARITY.md);
  3. the reference metric block (Objects/Boundary F) for stage-1 and
     refined labels vs GT - does zoom-in refinement help the UCN path
     (ref: lib/fcn/test_dataset.py:271-381 test_segnet).

NOT an accuracy-parity claim (synthetic scenes, not TOD/OCID; README
"Accuracy-parity status").

Usage:
  python scripts/eval_ucn_trained.py \
      --checkpoint output_ucn_r5/seg_..._epoch_N.checkpoint \
      [--crop-checkpoint output_ucn_r5_crop/..._crop_epoch_N.checkpoint]
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
    p.add_argument("--crop-checkpoint", default=None,
                   help="separately trained 224^2 crop UCN (train_net --crop); "
                        "defaults to the whole-image weights")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--image-size", type=int, nargs=2, default=(480, 640))
    p.add_argument("--n-batches", type=int, default=4)
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--scene-style", default="r4", choices=["r4", "ocid"])
    p.add_argument("--depth-threshold", type=float, default=0.5,
                   help="OCID protocol 0.5 / OSD 0.8 "
                        "(ref: lib/fcn/test_utils.py:296-299)")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unseenobjectswithmeanshift_tpu.config import get_config
    from unseenobjectswithmeanshift_tpu.pipeline.ucn import UCNPredictor
    from unseenobjectswithmeanshift_tpu.data.synthetic_jax import (
        SyntheticDeviceLoader)
    from unseenobjectswithmeanshift_tpu.utils import checkpoint_io
    from unseenobjectswithmeanshift_tpu.utils.evaluation import (
        multilabel_metrics, aggregate_metrics, print_metrics)
    from eval_trained_regime import mean_best_iou

    B, (H, W) = args.batch, args.image_size

    def build(seeding):
        cfg = get_config("tabletop_pretrained")
        cfg_crop = get_config("crop_tabletop_pretrained")
        for c in (cfg, cfg_crop):
            c.mean_shift.use_pallas = False
            c.mean_shift.use_pallas_seeding = seeding == "fps"
        return UCNPredictor(cfg, cfg_crop, dtype=jnp.bfloat16)

    pred = build("fps")

    def load(path, crop=False):
        S = 224 if crop else None
        v = (pred.network_crop if crop else pred.network).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, S or H, S or W, 3)), jnp.zeros((1, S or H, S or W, 3)))
        restored = checkpoint_io.restore(path, jax.device_get(v))
        return jax.device_put(restored)

    v1 = load(args.checkpoint)
    v2 = load(args.crop_checkpoint, crop=True) if args.crop_checkpoint else v1
    print(f"# UCN trained checkpoint: {args.checkpoint}"
          + (f" (crop: {args.crop_checkpoint})" if args.crop_checkpoint
             else " (crop net reuses whole-image weights)"), flush=True)

    loader = SyntheticDeviceLoader(B, height=H, width=W, max_gt=24,
                                   image_set="test", seed=11, augment=False,
                                   scene_style=args.scene_style)
    batches = []
    for i in range(args.n_batches):
        b = loader.batch_at(i)
        batches.append((jnp.asarray(b["image"]), jnp.asarray(b["xyz"]),
                        np.asarray(b["label_image"])))
    img0, xyz0, _ = batches[0]

    def run_once(pr, img, xyz):
        pr._ensure_bucketed_jits()
        labels, crops, perm, counts = pr._s1_fn(
            v1, img, xyz, depth_threshold=args.depth_threshold,
            first_seed_idx=0)
        n = int(np.asarray(counts)[0])
        P = next(b for b in pr._buckets(perm.shape[0]) if b >= n)
        refined = pr._s2_fn(v2, labels, crops, perm, 0, P=P)
        return np.asarray(labels), np.asarray(refined), n, P

    def throughput(pr, img, xyz):
        pr._ensure_bucketed_jits()
        chk = jax.jit(lambda r: jnp.sum(r))
        DEPTH = 2

        def pop(pending):
            labels_, crops_, perm_, counts_ = pending.popleft()
            n = int(np.asarray(counts_)[0])
            P = next(b for b in pr._buckets(perm_.shape[0]) if b >= n)
            return pr._s2_fn(v2, labels_, crops_, perm_, 0, P=P)

        s1 = lambda: pr._s1_fn(v1, img, xyz,
                               depth_threshold=args.depth_threshold,
                               first_seed_idx=0)
        pending = deque(s1() for _ in range(2))
        np.asarray(chk(pop(pending)))
        np.asarray(chk(pop(pending)))
        t0 = time.perf_counter()
        pending, last = deque(), None
        for _ in range(args.iters):
            pending.append(s1())
            if len(pending) > DEPTH:
                last = pop(pending)
        while pending:
            last = pop(pending)
        np.asarray(chk(last))
        return (time.perf_counter() - t0) / args.iters

    # ---- throughput with loaded weights (FPS seeding, the shipped default)
    lab_f, ref_f, n_crops, P_used = run_once(pred, img0, xyz0)
    dt = throughput(pred, img0, xyz0)
    occ = [len([v for v in np.unique(ref_f[i]) if v >= 1]) for i in range(B)]
    print(f"# two-stage UCN (fps seeding): {dt*1e3:7.2f} ms/batch "
          f"({B/dt:6.2f} img/s)  crops {n_crops} (bucket P={P_used}), "
          f"instances/img {occ}", flush=True)

    # ---- FPS vs XLA-scan seeding at trained embeddings
    pred_x = build("xla")
    lab_x, ref_x, _, _ = run_once(pred_x, img0, xyz0)
    dt_x = throughput(pred_x, img0, xyz0)
    agree_s1 = float(np.mean(lab_f == lab_x))
    agree_ref = float(np.mean(ref_f == ref_x))
    iou = mean_best_iou(ref_f, ref_x, min_id=1)
    print(f"# xla-scan seeding:           {dt_x*1e3:7.2f} ms/batch "
          f"({B/dt_x:6.2f} img/s)  fps speedup {dt_x/dt:.2f}x")
    print(f"# fps-vs-xla at trained embeddings: s1 pixel agreement "
          f"{agree_s1:.4f}, refined {agree_ref:.4f}, "
          f"refined best-IoU {iou:.4f}", flush=True)

    # ---- quality: metric block vs GT
    ms_s1, ms_ref = [], []
    for (img, xyz, gt) in batches:
        lab, ref, _, _ = run_once(pred, img, xyz)
        for i in range(B):
            ms_s1.append(multilabel_metrics(lab[i], gt[i]))
            ms_ref.append(multilabel_metrics(ref[i], gt[i]))
    print(f"\n# UCN stage-1 labels vs GT ({len(ms_s1)} held-out scenes):")
    print_metrics(aggregate_metrics(ms_s1))
    print("\n# UCN two-stage refined labels vs GT:")
    print_metrics(aggregate_metrics(ms_ref))


if __name__ == "__main__":
    main()
