"""Held-out evaluation on procedurally generated synthetic scenes.

The learning-capability evidence artifact (VERDICT r3 item 1): load a
training checkpoint (or use random init as the control), run stage-1
inference on N NEVER-TRAINED-ON scenes (the 'test' scene stream is salted
disjointly from 'train', data/synthetic.py), and print the reference metric
block (Objects/Boundary P/R/F + detected@0.75, lib/utils/evaluation.py
protocol).

Usage:
  python scripts/eval_synthetic.py --checkpoint output/checkpoint_0005000 \
      [--n 50] [--image-size 480 640] [--bf16] [--save-viz /tmp/viz]
  python scripts/eval_synthetic.py --random-control [--n 50]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--random-control", action="store_true",
                   help="evaluate the random init instead of a checkpoint")
    p.add_argument("--n", type=int, default=50)
    p.add_argument("--image-size", type=int, nargs=2, default=(480, 640))
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-viz", default=None,
                   help="directory for image/gt/pred triptych PNGs")
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args(argv)
    if not args.checkpoint and not args.random_control:
        p.error("--checkpoint or --random-control required")

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unseenobjectswithmeanshift_tpu.config import get_config
    from unseenobjectswithmeanshift_tpu.train.trainer import Trainer
    from unseenobjectswithmeanshift_tpu.pipeline.two_stage import stage1_labels
    from unseenobjectswithmeanshift_tpu.data.synthetic_jax import (
        SyntheticDeviceLoader)
    from unseenobjectswithmeanshift_tpu.utils import checkpoint_io
    from unseenobjectswithmeanshift_tpu.utils.evaluation import (
        multilabel_metrics, aggregate_metrics, print_metrics)

    H, W = args.image_size
    cfg = get_config("tabletop_pretrained")
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    trainer = Trainer(cfg, dtype=dtype)
    state = trainer.init_state(jax.random.PRNGKey(args.seed), (H, W),
                               batch_size=args.batch)
    tag = "random-control"
    if args.checkpoint:
        state = checkpoint_io.restore(args.checkpoint, jax.device_get(state))
        tag = args.checkpoint
    # device_put ONCE: orbax restores to host numpy; numpy leaves passed to a
    # jit re-upload the full weights over the dev tunnel on every call
    variables = jax.device_put({"params": state.params,
                                "batch_stats": state.batch_stats})

    loader = SyntheticDeviceLoader(args.batch, height=H, width=W,
                                   max_gt=cfg.loss.max_gt_instances,
                                   image_set="test", seed=args.seed,
                                   augment=False)

    def _labels(v, img, xyz):
        out = trainer.model.apply(v, img, xyz, light=True)
        per = {k: out[k] for k in
               ("pred_logits", "pred_masks", "mask_embed", "mask_features")
               if k in out}
        lab, _ = jax.vmap(lambda o, d: stage1_labels(
            cfg, o, d, img.shape[1:3]))(per, xyz)
        return lab

    labels_jit = jax.jit(_labels)

    ms = []
    nb = (args.n + args.batch - 1) // args.batch
    for bi in range(nb):
        batch = loader.batch_at(bi)
        lab = np.asarray(labels_jit(variables, batch["image"], batch["xyz"]))
        gt = np.asarray(batch["label_image"])
        for j in range(min(args.batch, args.n - bi * args.batch)):
            ms.append(multilabel_metrics(lab[j], gt[j]))
            if args.save_viz:
                os.makedirs(args.save_viz, exist_ok=True)
                import cv2
                from unseenobjectswithmeanshift_tpu.config import (
                    UCN_PIXEL_MEANS_BGR)
                im = np.asarray(batch["image"][j])
                im = ((im + np.asarray(UCN_PIXEL_MEANS_BGR) / 255.0) * 255
                      ).clip(0, 255).astype(np.uint8)
                cm = lambda x: cv2.applyColorMap(
                    (x * 37 % 255).astype(np.uint8), cv2.COLORMAP_JET)
                trip = np.concatenate([im, cm(gt[j]), cm(lab[j])], axis=1)
                cv2.imwrite(os.path.join(
                    args.save_viz, f"eval_{bi*args.batch+j:03d}.png"), trip)

    agg = aggregate_metrics(ms)
    print(f"# held-out synthetic eval: {len(ms)} scenes @ {H}x{W}  [{tag}]")
    print_metrics(agg)
    return agg


if __name__ == "__main__":
    main()
