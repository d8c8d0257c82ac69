"""MSMFormer training CLI (Hungarian-matched mask loss on TOD synthetic data).

Mirrors MSMFormer/tabletop_train_net_pretrained.py: AdamW lr 1e-4, batch 4,
71k iterations, backbone lr x0.1, grad clip 0.01, deep supervision; data-parallel
over all local devices via the mesh (replacing detectron2 launch/DDP).
Checkpoints via orbax every --checkpoint-period steps.

Usage:
  python -m unseenobjectswithmeanshift_tpu.cli.train_msmformer \
      --root /path/to/tabletop --iters 71000 --batch 4 \
      [--crop]          # train the 224x224 crop network (SYN_CROP mode)
      [--init-backbone ucn_checkpoint.pth]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=None,
                   help="TOD dataset root; not needed with "
                        "--dataset synthetic")
    p.add_argument("--dataset", default="tabletop_object",
                   choices=["tabletop_object", "synthetic"],
                   help="'synthetic': procedurally generated tabletop scenes "
                        "rendered ON DEVICE (data/synthetic_jax.py) - no "
                        "files needed; the learning-capability path when the "
                        "real TOD data is unavailable")
    p.add_argument("--scene-style", default="r4", choices=["r4", "ocid"],
                   help="synthetic scene statistics: 'ocid' = denser clutter "
                        "(up to ~14 instances, touching/stacked objects, "
                        "concave composites - pushed toward OCID's 20-object "
                        "scenes); 'r4' keeps the round-4 streams")
    p.add_argument("--iters", type=int, default=71000)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--crop", action="store_true")
    p.add_argument("--init-backbone", default=None)
    p.add_argument("--output", default="./output")
    p.add_argument("--checkpoint-period", type=int, default=17500)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--log-period", type=int, default=20)
    p.add_argument("--eval-period", type=int, default=0,
                   help="run the metric block on held-out samples every N iters "
                        "(the reference's TEST.EVAL_PERIOD, ref: "
                        "Base-COCO-InstanceSegmentation.yaml TEST.EVAL_PERIOD; "
                        "0 = disabled, matching every shipped config)")
    p.add_argument("--eval-samples", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--embedding-loss", action="store_true",
                   help="add the UCN metric-learning loss on the backbone "
                        "embedding map (MODEL.EMBEDDING USE_EMBEDDING_LOSS, "
                        "ref: pretrained_meanshiftformer_model.py:316-325). "
                        "For from-scratch training it supplies the direct "
                        "cluster-structure signal the reference gets from its "
                        "separately pretrained frozen UCN backbone")
    p.add_argument("--devices", type=int, default=0,
                   help="mesh over the first N devices (0 = all; useful for "
                        "debugging and small-host CI)")
    p.add_argument("--image-size", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="train at a reduced resolution (default: 224x224 with "
                        "--crop, else the full 480x640)")
    p.add_argument("--resume", action="store_true",
                   help="restore the newest checkpoint_* in --output and "
                        "continue from its iteration (detectron2 "
                        "resume_or_load equivalent)")
    args = p.parse_args(argv)

    import jax

    # persistent compilation cache: train-step compiles take minutes over the
    # dev tunnel; restarts/resumes (and the eval graphs) should not pay twice
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ..config import get_config
    from ..data.datasets import TableTopObject
    from ..data.loader import BatchLoader
    from ..train.trainer import Trainer, pair_bucket
    from ..parallel.mesh import make_mesh, shard_batch, replicate
    from ..utils import checkpoint_io

    cfg = get_config("tabletop_pretrained")
    cfg.solver.base_lr = args.lr
    if args.embedding_loss:
        cfg.loss.use_embedding_loss = True
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    image_hw = tuple(args.image_size) if args.image_size else (
        (224, 224) if args.crop else (480, 640))
    if args.dataset == "synthetic":
        from ..data.synthetic_jax import SyntheticDeviceLoader

        # --crop trains the stage-2 crop network in SYN_CROP mode: full
        # 480x640 scenes rendered on device, each sample a padded square
        # crop around one random object resized to 224^2 - the reference's
        # crop recipe (tabletop_object.py:175-237) and the statistics
        # crop_rois feeds the net at inference (one dominant object filling
        # the frame + partial neighbors). Round 5 measured that the
        # round-4 crop_like mode (distant few-object scenes) trains a net
        # that SHATTERS inference-scale objects (refined F 0.336).
        loader = SyntheticDeviceLoader(
            args.batch, height=image_hw[0], width=image_hw[1],
            max_gt=cfg.loss.max_gt_instances, image_set="train", seed=0,
            syn_crop=args.crop, crop_size=image_hw[0],
            scene_style=args.scene_style)
    else:
        if not args.root:
            raise SystemExit("--root is required for the file-based dataset")
        dataset = TableTopObject(args.root, "train", syn_crop=args.crop,
                                 crop_size=224, seed=0)
        loader = BatchLoader(dataset, args.batch,
                             max_gt=cfg.loss.max_gt_instances)

    trainer = Trainer(cfg, dtype=dtype)
    state = trainer.init_state(jax.random.PRNGKey(0), image_hw,
                               batch_size=args.batch)

    if args.init_backbone:
        from ..utils.checkpoint import load_torch_state_dict, convert_ucn_checkpoint

        bb = convert_ucn_checkpoint(load_torch_state_dict(args.init_backbone))
        params = dict(state.params)
        params["pretrained_backbone"] = bb["params"]
        bs = dict(state.batch_stats)
        bs["pretrained_backbone"] = bb["batch_stats"]
        state = state.replace(params=params, batch_stats=bs)
        print(f"initialized UCN backbone from {args.init_backbone}")

    start_it = 0
    if args.resume:
        latest = checkpoint_io.latest_checkpoint(args.output)
        if latest:
            state = checkpoint_io.restore(latest, jax.device_get(state))
            start_it = int(os.path.basename(latest).split("_")[-1])
            print(f"resumed from {latest} (iteration {start_it})")
        else:
            print(f"--resume: no checkpoint_* under {args.output}, "
                  "starting fresh")

    eval_fn = None
    if args.eval_period > 0:
        from ..pipeline.two_stage import stage1_labels
        from ..utils.evaluation import multilabel_metrics, aggregate_metrics, \
            print_metrics

        # evaluation runs on CLEAN samples (no chromatic/depth-noise
        # augmentation - the reference's eval mappers don't augment either)
        if args.dataset == "synthetic":
            # HELD-OUT scene stream: image_set='test' salts the per-index
            # seed, so these scenes never appear in training. Rendered clean
            # (augment=False) on device, cached to host once.
            from ..data.synthetic_jax import SyntheticDeviceLoader

            vload = SyntheticDeviceLoader(
                1, height=image_hw[0], width=image_hw[1],
                max_gt=cfg.loss.max_gt_instances, image_set="test", seed=0,
                augment=False, syn_crop=args.crop, crop_size=image_hw[0],
                scene_style=args.scene_style)
            val = []
            for i in range(args.eval_samples):
                vb = jax.device_get(vload.batch_at(i))
                val.append({"image": vb["image"][0], "xyz": vb["xyz"][0],
                            "label": vb["label_image"][0]})
        else:
            val = TableTopObject(args.root, "test", syn_crop=args.crop,
                                 crop_size=224, seed=1,
                                 use_augmentation=False,
                                 chromatic=False, add_noise=False)
        n_eval = min(args.eval_samples, len(val))

        def _labels(variables, img, xyz):
            out = trainer.model.apply(variables, img, xyz, light=True)
            per = {k: out[k] for k in
                   ("pred_logits", "pred_masks", "mask_embed", "mask_features")
                   if k in out}
            lab, _ = jax.vmap(lambda o, d: stage1_labels(
                cfg, o, d, img.shape[1:3]))(per, xyz)
            return lab

        labels_jit = jax.jit(_labels)

        def eval_fn(state):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            ms = []
            for i in range(n_eval):
                s = val[i]
                img = jnp.asarray(s["image"][None])
                xyz = jnp.asarray(s["xyz"][None])
                lab = np.asarray(labels_jit(variables, img, xyz))[0]
                ms.append(multilabel_metrics(lab, s["label"]))
            agg = aggregate_metrics(ms)
            print_metrics(agg)
            return agg

    mesh = make_mesh(jax.devices()[:args.devices] if args.devices else None)
    print(f"mesh: {mesh.devices.shape} devices")
    step_fn = trainer.jit_train_step(mesh)
    os.makedirs(args.output, exist_ok=True)
    from ..utils.metrics_log import MetricsLogger
    mlog = MetricsLogger(args.output)

    if args.dataset == "synthetic" and start_it:
        loader.step = start_it      # deterministic resume of the scene stream

    with mesh:
        state = replicate(mesh, state)
        it = start_it
        t0 = time.perf_counter()
        while it < args.iters:
            for batch in loader:
                if it >= args.iters:
                    break
                # pair compaction: the instance count is host data - bucket it
                # so the criterion point-samples ~count pairs, not B*max_gt
                pb = pair_bucket(int(np.sum(batch["gt_valid"])),
                                 batch["gt_valid"].size)
                batch = shard_batch(mesh, batch)
                state, metrics = step_fn(state, batch, jax.random.PRNGKey(it),
                                         pb)
                it += 1
                if it % args.log_period == 0:
                    total = float(metrics["total_loss"])
                    dt = (time.perf_counter() - t0) / args.log_period
                    t0 = time.perf_counter()
                    print(f"iter {it}/{args.iters} loss {total:.4f} "
                          f"ce {float(metrics['loss_ce']):.4f} "
                          f"mask {float(metrics['loss_mask']):.4f} "
                          f"dice {float(metrics['loss_dice']):.4f} "
                          f"({dt:.2f}s/it)", flush=True)
                    mlog.log_train(it, {k: float(v)
                                        for k, v in metrics.items()})
                if eval_fn is not None and it % args.eval_period == 0:
                    mlog.log_eval(it, eval_fn(state))
                if it % args.checkpoint_period == 0 or it == args.iters:
                    path = os.path.join(args.output, f"checkpoint_{it:07d}")
                    checkpoint_io.save(path, state)
                    print(f"saved {path}")
    print("training done")


if __name__ == "__main__":
    main()
