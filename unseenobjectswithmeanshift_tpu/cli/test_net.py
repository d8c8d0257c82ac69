"""Full-dataset evaluation CLI: OCID / OSD -> Objects & Boundary P/R/F.

Mirrors tools/test_net.py + lib/fcn/test_demo.py (the documented reproduction
path, ref: README.md:128-133): loop the dataset, run two-stage inference, score
with multilabel_metrics, print the canonical metric block (before and after
refinement).

TPU-shaped execution (unlike the reference's one synchronous image at a time,
lib/fcn/test_demo.py:99-143): images run in batches of --batch through the
bucketed predictor's software-pipelined stream - stage 1 of batch i+1 is
enqueued before batch i's crop-count sync, so per-batch host round-trips
overlap device work - and the host computes metrics while the device runs.

Usage:
  python -m unseenobjectswithmeanshift_tpu.cli.test_net \
      --dataset ocid_object --root /path/to/OCID \
      --checkpoint msmformer.pth --checkpoint-crop msmformer_crop.pth \
      [--config uoais_resnet50]  # any preset: UCN-backbone, ResNet50, Swin
      [--ucn]   # use the legacy UCN mean-shift pipeline instead of MSMFormer
"""

from __future__ import annotations

import argparse
import time

import numpy as np

# dataset -> default preset; the UOAIS datasets evaluate at the reference's
# DETECTIONS_PER_IMAGE 40 (ref: MSMFormer/configs/UOAIS_UCN.yaml:77)
DEFAULT_PRESET = {
    "ocid_object": "tabletop_pretrained",
    "osd_object": "tabletop_pretrained",
    "tabletop_object": "tabletop_pretrained",
    "ocid_object_uoais": "uoais_ucn",
    "osd_object_uoais": "uoais_ucn",
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="ocid_object",
                   choices=sorted(DEFAULT_PRESET))
    p.add_argument("--root", required=True)
    p.add_argument("--config", default=None,
                   help="config preset for the whole-image network "
                        "(default: per-dataset; see DEFAULT_PRESET)")
    p.add_argument("--crop-config", default=None,
                   help="preset for the crop network (default: paired preset)")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--checkpoint-crop", default=None)
    p.add_argument("--ucn", action="store_true", help="legacy UCN pipeline")
    p.add_argument("--no-refine", action="store_true")
    p.add_argument("--no-depth", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--key-stride", type=int, default=1,
                   help="opt-in fast serving: subsample attention keys "
                        "(NOT the parity configuration; see "
                        "config.DecoderConfig.key_stride)")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--save-mat", default=None,
                   help="directory for per-image .mat result dumps")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..config import get_config
    from ..data.datasets import get_dataset
    from ..data.loader import pad_hw
    from ..utils.evaluation import (
        multilabel_metrics, aggregate_metrics, print_metrics, save_result_mat,
    )

    input_type = "COLOR" if args.no_depth else "RGBD"
    ds_kwargs = {"input_type": input_type}
    if args.dataset == "tabletop_object":
        ds_kwargs["image_set"] = "test"
        ds_kwargs["use_augmentation"] = False
        ds_kwargs["chromatic"] = False
        ds_kwargs["add_noise"] = False
    dataset = get_dataset(args.dataset, args.root, **ds_kwargs)
    n = min(len(dataset), args.limit) if args.limit else len(dataset)
    B = max(1, args.batch)
    print(f"{n} images from {args.dataset}, batch {B}")

    preset = args.config or DEFAULT_PRESET[args.dataset]
    osd = args.dataset.startswith("osd_object")

    if args.ucn:
        if args.key_stride > 1:
            p.error("--key-stride applies to the MSMFormer decoder; the UCN "
                    "pipeline has no attention keys to stride")
        from ..pipeline.ucn import UCNPredictor
        from ..utils.checkpoint import load_torch_state_dict, convert_ucn_checkpoint

        cfg = get_config(preset)
        cfg_crop = get_config(args.crop_config or preset)
        dtype = jnp.bfloat16 if args.bf16 else jnp.float32
        pred = UCNPredictor(cfg, cfg_crop, dtype=dtype)
        if args.checkpoint:
            # device_put once: converters return host numpy; numpy leaves fed
            # to a jit re-upload all weights on every call
            v1 = jax.device_put(convert_ucn_checkpoint(
                load_torch_state_dict(args.checkpoint)))
            v2 = jax.device_put(convert_ucn_checkpoint(load_torch_state_dict(
                args.checkpoint_crop or args.checkpoint)))
        else:
            print("WARNING: random weights")
            v1, v2 = pred.init(jax.random.PRNGKey(0), (480, 640))
        thr = cfg.test.depth_filter_threshold_osd if osd else \
            cfg.test.depth_filter_threshold_ocid
        stream = lambda batches: pred.stream(v1, v2, batches,
                                             depth_threshold=thr)
        if args.no_refine:
            stream = lambda batches: (
                (pred(v1, v2, img, xyz, depth_threshold=thr, refine=False))
                for img, xyz in batches)
    else:
        from ..pipeline.factory import build_two_stage_predictor

        if not args.checkpoint:
            print("WARNING: random weights")
        pred, v1, v2, cfg, _ = build_two_stage_predictor(
            preset, crop_preset=args.crop_config, checkpoint=args.checkpoint,
            checkpoint_crop=args.checkpoint_crop, bf16=args.bf16,
            no_depth=args.no_depth, key_stride=args.key_stride)
        stream = lambda batches: pred.stream(v1, v2, batches, osd=osd)
        if args.no_refine:
            stream = lambda batches: (
                pred(v1, v2, img, xyz, osd=osd, refine=False)
                for img, xyz in batches)

    # assemble fixed-shape [B, H, W, ...] batches (short final batch padded by
    # repetition; extra outputs dropped on the host side)
    shapes = []   # per-batch list of (count, [(h, w), ...])

    def batches():
        for start in range(0, n, B):
            idx = list(range(start, min(start + B, n)))
            count = len(idx)
            while len(idx) < B:
                idx.append(idx[-1])
            samples = [dataset[i] for i in idx]
            # stash the gt labels: the metric loop must not re-read the
            # dataset (a second full image/depth decode per sample would
            # compete with the device-overlap the batching exists for)
            shapes.append((count, [s["label"] for s in samples[:count]]))
            img = np.stack([pad_hw(s["image"]) for s in samples])
            xyz = None
            if samples[0].get("xyz") is not None:
                xyz = jnp.asarray(np.stack([pad_hw(s["xyz"]) for s in samples]))
            yield jnp.asarray(img), xyz

    metrics_all, metrics_refined = [], []
    t_start = time.perf_counter()
    done = 0
    for bi, (labels, refined) in enumerate(stream(batches())):
        count, gt_list = shapes[bi]
        labels = np.asarray(labels)
        refined = np.asarray(refined)
        for j in range(count):
            i = bi * B + j
            gt = gt_list[j]
            h, w = gt.shape
            lab = labels[j, :h, :w]
            ref = refined[j, :h, :w]
            metrics_all.append(multilabel_metrics(lab, gt))
            metrics_refined.append(multilabel_metrics(ref, gt))
            if args.save_mat:
                import os
                os.makedirs(args.save_mat, exist_ok=True)
                save_result_mat(os.path.join(args.save_mat, f"{i:06d}.mat"),
                                lab, ref, filename=f"{args.dataset}/{i:06d}")
        done += count
        if done % (50 // B * B or B) < count:
            dt = (time.perf_counter() - t_start) / done
            print(f"[{done}/{n}] {dt:.3f}s/img (est. full pass "
                  f"{dt * n / 60:.1f} min)")

    wall = time.perf_counter() - t_start
    print("=" * 56)
    print(f"{n} images in {wall:.1f}s ({n / wall:.2f} img/s incl. host metrics)")
    print("=" * 56)
    print_metrics(aggregate_metrics(metrics_all))
    print("=" * 20 + " Refined " + "=" * 27)
    print_metrics(aggregate_metrics(metrics_refined))


if __name__ == "__main__":
    main()
