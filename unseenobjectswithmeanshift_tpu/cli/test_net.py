"""Full-dataset evaluation CLI: OCID / OSD -> Objects & Boundary P/R/F.

Mirrors tools/test_net.py + lib/fcn/test_demo.py (the documented reproduction
path, ref: README.md:128-133): loop the dataset, run two-stage inference, score
with multilabel_metrics, print the canonical metric block (before and after
refinement).

Usage:
  python -m unseenobjectswithmeanshift_tpu.cli.test_net \
      --dataset ocid_object --root /path/to/OCID \
      --checkpoint msmformer.pth --checkpoint-crop msmformer_crop.pth \
      [--ucn]   # use the legacy UCN mean-shift pipeline instead of MSMFormer
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="ocid_object",
                   choices=["ocid_object", "osd_object", "tabletop_object",
                            "ocid_object_uoais", "osd_object_uoais"])
    p.add_argument("--root", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--checkpoint-crop", default=None)
    p.add_argument("--ucn", action="store_true", help="legacy UCN pipeline")
    p.add_argument("--no-refine", action="store_true")
    p.add_argument("--no-depth", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..config import get_config
    from ..data.datasets import get_dataset
    from ..data.loader import pad_hw
    from ..utils.evaluation import multilabel_metrics, aggregate_metrics, print_metrics

    input_type = "COLOR" if args.no_depth else "RGBD"
    ds_kwargs = {"input_type": input_type}
    if args.dataset == "tabletop_object":
        ds_kwargs["image_set"] = "test"
        ds_kwargs["use_augmentation"] = False
        ds_kwargs["chromatic"] = False
        ds_kwargs["add_noise"] = False
    dataset = get_dataset(args.dataset, args.root, **ds_kwargs)
    n = min(len(dataset), args.limit) if args.limit else len(dataset)
    print(f"{n} images from {args.dataset}")

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = get_config("tabletop_pretrained")
    cfg_crop = get_config("crop_tabletop_pretrained")
    osd = args.dataset == "osd_object"

    if args.ucn:
        from ..pipeline.ucn import UCNPredictor
        from ..utils.checkpoint import load_torch_state_dict, convert_ucn_checkpoint

        pred = UCNPredictor(cfg, cfg_crop, dtype=dtype)
        if args.checkpoint:
            v1 = convert_ucn_checkpoint(load_torch_state_dict(args.checkpoint))
            v2 = convert_ucn_checkpoint(load_torch_state_dict(
                args.checkpoint_crop or args.checkpoint))
        else:
            print("WARNING: random weights")
            v1, v2 = pred.init(jax.random.PRNGKey(0), (480, 640))
        thr = cfg.test.depth_filter_threshold_osd if osd else \
            cfg.test.depth_filter_threshold_ocid
        run = lambda img, xyz: pred(v1, v2, img, xyz, depth_threshold=thr,
                                    refine=not args.no_refine)
    else:
        from ..pipeline.two_stage import TwoStagePredictor
        from ..utils.checkpoint import (
            load_torch_state_dict, convert_msmformer_checkpoint,
        )

        pred = TwoStagePredictor(cfg, cfg_crop, dtype=dtype)
        if args.checkpoint:
            v1 = convert_msmformer_checkpoint(load_torch_state_dict(args.checkpoint))
            v2 = convert_msmformer_checkpoint(load_torch_state_dict(
                args.checkpoint_crop or args.checkpoint))
        else:
            print("WARNING: random weights")
            v1, v2 = pred.init(jax.random.PRNGKey(0), (480, 640))
        run = lambda img, xyz: pred(v1, v2, img, xyz, osd=osd,
                                    refine=not args.no_refine)

    metrics_all, metrics_refined = [], []
    t_start = time.perf_counter()
    for i in range(n):
        sample = dataset[i]
        gt = sample["label"]
        h, w = gt.shape
        img = jnp.asarray(pad_hw(sample["image"])[None])
        xyz = None
        if sample.get("xyz") is not None:
            xyz = jnp.asarray(pad_hw(sample["xyz"])[None])
        labels, refined = run(img, xyz)
        labels = np.asarray(labels[0, :h, :w])
        refined = np.asarray(refined[0, :h, :w])
        metrics_all.append(multilabel_metrics(labels, gt))
        metrics_refined.append(multilabel_metrics(refined, gt))
        if (i + 1) % 50 == 0:
            print(f"[{i + 1}/{n}] {(time.perf_counter() - t_start) / (i + 1):.3f}s/img")

    print("=" * 56)
    print(f"{n} images")
    print("=" * 56)
    print_metrics(aggregate_metrics(metrics_all))
    print("=" * 20 + " Refined " + "=" * 27)
    print_metrics(aggregate_metrics(metrics_refined))


if __name__ == "__main__":
    main()
