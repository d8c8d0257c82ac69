"""UCN backbone training CLI: metric-learning embedding loss on TOD.

Mirrors tools/train_net.py + lib/fcn/train.py: SGD momentum 0.9, lr 1e-5, batch
16, 16 epochs, MultiStepLR; per-iteration loss/intra/inter prints; per-epoch
orbax snapshots with structured names (the reference's
seg_<infix>_epoch_N.checkpoint.pth convention).

Usage:
  python -m unseenobjectswithmeanshift_tpu.cli.train_net \
      --root /path/to/tabletop --epochs 16 --batch 16 \
      [--crop] [--input RGBD|COLOR|DEPTH] [--fusion add|cat|early] [--sampling]

  # file-free: procedurally generated tabletop scenes rendered on device
  python -m unseenobjectswithmeanshift_tpu.cli.train_net \
      --dataset synthetic --epochs 4 --iters-per-epoch 500 --batch 16
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=None,
                   help="TOD dataset root; not needed with --dataset synthetic")
    p.add_argument("--dataset", default="tabletop_object",
                   choices=["tabletop_object", "synthetic"],
                   help="'synthetic': procedurally generated tabletop scenes "
                        "rendered ON DEVICE (data/synthetic_jax.py), the "
                        "file-free learning-capability path - same hookup "
                        "train_msmformer has (ref: tools/train_net.py:77-160 "
                        "reads TOD from disk only)")
    p.add_argument("--iters-per-epoch", type=int, default=1000,
                   help="epoch length for the endless synthetic stream "
                        "(ignored for the file-based dataset)")
    p.add_argument("--scene-style", default="r4", choices=["r4", "ocid"],
                   help="synthetic scene statistics (see train_msmformer)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute / fp32 params (the train_msmformer "
                        "default recipe; the reference trains UCN in fp32, "
                        "so this stays opt-in here)")
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--lr-milestones", type=int, nargs="*", default=[])
    p.add_argument("--gamma", type=float, default=0.1)
    p.add_argument("--crop", action="store_true")
    p.add_argument("--input", default="RGBD", choices=["RGBD", "COLOR", "DEPTH"])
    p.add_argument("--fusion", default="add", choices=["add", "cat", "early"])
    p.add_argument("--sampling", action="store_true",
                   help="per-cluster pixel sampling (EMBEDDING_SAMPLING)")
    p.add_argument("--output", default="./output_ucn")
    p.add_argument("--log-period", type=int, default=20)
    p.add_argument("--devices", type=int, default=0,
                   help="mesh over the first N devices (0 = all)")
    p.add_argument("--pretrained", default=None,
                   help="orbax snapshot (an *_epoch_N.checkpoint dir) to "
                        "continue from (ref: tools/train_net.py --pretrained)")
    p.add_argument("--start-epoch", type=int, default=0,
                   help="epoch numbering offset when continuing "
                        "(ref: --startepoch)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    from ..config import get_config
    from ..data.datasets import TableTopObject
    from ..data.loader import BatchLoader
    from ..models.segnet import build_segnet
    from ..losses.embedding import embedding_loss
    from ..parallel.mesh import make_mesh, shard_batch, replicate
    from ..utils import checkpoint_io

    cfg = get_config("tabletop_pretrained")
    cfg.backbone.input_type = args.input
    cfg.backbone.fusion_type = args.fusion
    cfg.use_depth = args.input in ("RGBD", "DEPTH")

    image_hw = (224, 224) if args.crop else (480, 640)
    if args.dataset == "synthetic":
        from ..data.synthetic_jax import SyntheticDeviceLoader

        # --crop trains the 224^2 crop embedding net on zoomed-in scenes
        # (the statistics of SYN_CROP RoIs, ref: tabletop_object.py:175-237)
        # --crop: SYN_CROP mode (padded square crops around single objects
        # from full rendered scenes - the reference crop-net recipe)
        loader = SyntheticDeviceLoader(
            args.batch, height=image_hw[0], width=image_hw[1],
            max_gt=cfg.loss.max_gt_instances, image_set="train", seed=0,
            syn_crop=args.crop, crop_size=image_hw[0],
            scene_style=args.scene_style)
        steps_per_epoch = args.iters_per_epoch
    else:
        if not args.root:
            raise SystemExit("--root is required for the file-based dataset")
        dataset = TableTopObject(args.root, "train", input_type=args.input,
                                 syn_crop=args.crop, sampling=args.sampling,
                                 seed=0)
        loader = BatchLoader(dataset, args.batch,
                             max_gt=cfg.loss.max_gt_instances)
        steps_per_epoch = len(dataset) // args.batch

    model = build_segnet(cfg, dtype=jnp.bfloat16 if args.bf16
                         else jnp.float32)
    img0 = jnp.zeros((1, *image_hw, 3))
    xyz0 = img0 if cfg.use_depth else None
    variables = model.init(jax.random.PRNGKey(0), img0, xyz0, train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    if args.pretrained:
        tmpl = jax.device_get({"params": params, "batch_stats": batch_stats})
        restored = checkpoint_io.restore(args.pretrained, tmpl)
        params, batch_stats = restored["params"], restored["batch_stats"]
        print(f"continuing from {args.pretrained}")

    # SGD + momentum + weight decay + MultiStepLR (tools/train_net.py:111-148).
    # The optimizer's step count restarts at 0 on resume, so shift the epoch
    # milestones by --start-epoch: already-passed milestones fold into the
    # initial lr, future ones fire at the right absolute epoch.
    init_lr = args.lr * (args.gamma ** sum(
        1 for m in args.lr_milestones if m <= args.start_epoch))
    boundaries = {(m - args.start_epoch) * steps_per_epoch: args.gamma
                  for m in args.lr_milestones if m > args.start_epoch}
    sched = optax.piecewise_constant_schedule(init_lr, boundaries)
    tx = optax.chain(optax.add_decayed_weights(args.weight_decay),
                     optax.sgd(sched, momentum=args.momentum))
    opt_state = tx.init(params)

    k_max = cfg.loss.max_gt_instances + 1  # clusters = bg + instances

    def train_step(params, batch_stats, opt_state, batch):
        def loss_fn(p):
            feats, mut = model.apply({"params": p, "batch_stats": batch_stats},
                                     batch["image"], batch.get("xyz"), train=True,
                                     mutable=["batch_stats"])
            loss, intra, inter = embedding_loss(
                feats, batch["label_image"], k_max=k_max,
                alpha=cfg.loss.embedding_alpha, delta=cfg.loss.embedding_delta,
                lambda_intra=cfg.loss.embedding_lambda_intra,
                lambda_inter=cfg.loss.embedding_lambda_inter)
            return loss, (intra, inter, mut["batch_stats"])

        (loss, (intra, inter, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, (loss, intra, inter)

    mesh = make_mesh(jax.devices()[:args.devices] if args.devices else None)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    step_fn = jax.jit(train_step, in_shardings=(repl, repl, repl, data),
                      out_shardings=repl)

    os.makedirs(args.output, exist_ok=True)
    from ..utils.metrics_log import MetricsLogger
    mlog = MetricsLogger(args.output)
    infix = f"seg_resnet34_8s_embedding_cosine_{args.input.lower()}"
    if args.input == "RGBD":
        infix += f"_{args.fusion}"
    if args.sampling:
        infix += "_sampling"
    if args.crop:
        infix += "_crop"

    with mesh:
        params = replicate(mesh, params)
        batch_stats = replicate(mesh, batch_stats)
        opt_state = replicate(mesh, opt_state)
        if args.dataset == "synthetic":
            # deterministic resume of the scene stream
            loader.step = args.start_epoch * steps_per_epoch
        for epoch in range(args.start_epoch, args.epochs):
            t0 = time.perf_counter()
            for i, batch in enumerate(loader):
                if i >= steps_per_epoch:
                    break
                batch = shard_batch(mesh, batch)
                params, batch_stats, opt_state, (loss, intra, inter) = step_fn(
                    params, batch_stats, opt_state, batch)
                if (i + 1) % args.log_period == 0:
                    dt = (time.perf_counter() - t0) / (i + 1)
                    print(f"epoch {epoch + 1}/{args.epochs} iter {i + 1} "
                          f"loss {float(loss):.4f} intra {float(intra):.4f} "
                          f"inter {float(inter):.4f} ({dt:.2f}s/it)", flush=True)
                    mlog.log_train(epoch * steps_per_epoch + i + 1,
                                   {"loss": float(loss),
                                    "loss_intra": float(intra),
                                    "loss_inter": float(inter),
                                    "epoch": epoch + 1})
            path = os.path.join(args.output, f"{infix}_epoch_{epoch + 1}.checkpoint")
            checkpoint_io.save(path, {"params": params, "batch_stats": batch_stats})
            print(f"saved {path}")
    print("training done")


if __name__ == "__main__":
    main()
