"""Demo CLI: two-stage MSMFormer inference on a folder of RGB-D images.

Mirrors the flagship entry point tools/test_image_with_ms_transformer.py
(ref: :150-218): glob '*color*' / '*depth*' images plus camera_params.json,
build the whole-image and crop predictors, run fused two-stage inference per
image, save '-label.png' outputs (and optional visualization panels).

Usage:
  python -m unseenobjectswithmeanshift_tpu.cli.demo \
      --imgdir /root/reference/data/demo \
      [--checkpoint msmformer.pth --checkpoint-crop msmformer_crop.pth] \
      [--no-depth] [--vis outdir]
Without checkpoints the model runs with random weights (pipeline smoke test).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

import numpy as np


def build_predictor(args):
    from ..pipeline.factory import build_two_stage_predictor

    preset = getattr(args, "config", None) or (
        "tabletop_pretrained" if not args.no_depth else "tabletop_pretrained_rgb")
    if not args.checkpoint:
        print("WARNING: no checkpoint given - running with random weights")
    pred, v1, v2, cfg, _ = build_two_stage_predictor(
        preset, checkpoint=args.checkpoint, checkpoint_crop=args.checkpoint_crop,
        bf16=args.bf16, no_depth=args.no_depth,
        image_shape=(args.height, args.width),
        key_stride=getattr(args, "key_stride", 1))
    return pred, v1, v2, cfg


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--imgdir", required=True)
    p.add_argument("--config", default=None,
                   help="config preset (tabletop_pretrained, uoais_resnet50, "
                        "tabletop_swin, ...); default picks the flagship "
                        "UCN-backbone preset")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--checkpoint-crop", default=None)
    p.add_argument("--camera-params", default=None)
    p.add_argument("--no-depth", action="store_true")
    p.add_argument("--no-refine", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--key-stride", type=int, default=1,
                   help="opt-in fast serving: subsample attention keys "
                        "(NOT the parity configuration)")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--out", default=None, help="directory for -label.png outputs")
    args = p.parse_args(argv)

    import cv2
    import jax.numpy as jnp
    from ..utils.preprocess import read_sample, pad_to_multiple

    color_files = sorted(glob.glob(os.path.join(args.imgdir, "*color*")))
    depth_files = sorted(glob.glob(os.path.join(args.imgdir, "*depth*")))
    params_file = args.camera_params or os.path.join(args.imgdir, "camera_params.json")
    camera_params = None
    if os.path.exists(params_file):
        with open(params_file) as f:
            camera_params = json.load(f)
    elif depth_files and not args.no_depth:
        # the reference crashes here (test_image_with_ms_transformer.py:127
        # indexes a None); fall back to the TOD synthetic-camera intrinsics
        # instead so depth frames without calibration still run
        from ..data.datasets import fov_intrinsics

        camera_params = fov_intrinsics(args.width, args.height)
        print(f"WARNING: no {params_file}; using default FOV intrinsics "
              f"(fx=fy={camera_params['fx']:.1f})")

    pred, v1, v2, cfg = build_predictor(args)
    input_type = "RGBD" if cfg.use_depth else "COLOR"

    out_dir = args.out or args.imgdir
    os.makedirs(out_dir, exist_ok=True)
    for i, cf in enumerate(color_files):
        df = depth_files[i] if i < len(depth_files) else None
        sample = read_sample(cf, df, camera_params, input_type=input_type)
        img, _ = pad_to_multiple(sample["image"][None], 32)
        xyz = None
        if sample["xyz"] is not None:
            xyz, _ = pad_to_multiple(sample["xyz"][None], 32)
            xyz = jnp.asarray(xyz)
        t0 = time.perf_counter()
        labels, refined = pred(v1, v2, jnp.asarray(img), xyz,
                               refine=not args.no_refine)
        refined = np.asarray(refined[0])
        dt = time.perf_counter() - t0
        print(f"{os.path.basename(cf)}: {dt*1e3:.1f} ms, "
              f"{len(np.unique(refined)) - 1} instances")
        # save binary label visualization (ref: get_network_crop.py save_data)
        label_save = (np.clip(refined, 0, 1) * 255).astype(np.uint8)
        out_path = os.path.join(out_dir, os.path.basename(cf)[:-4] + "-label.png")
        cv2.imwrite(out_path, label_save)
    print("done")


if __name__ == "__main__":
    main()
