"""Train-step timing on the real TPU: pair compaction off vs on.

Synthetic flagship-shape batch (B=4, 480x640, bf16 compute), ~6 instances per
image (the OCID average) => 24 valid pairs of 96 slots. Pipelined timing: the
28 ms tunnel sync is amortized over N enqueued steps.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from unseenobjectswithmeanshift_tpu.config import get_config
from unseenobjectswithmeanshift_tpu.train.trainer import Trainer, pair_bucket

B, H, W = 4, 480, 640
cfg = get_config("tabletop_pretrained")
G = cfg.loss.max_gt_instances
rng = np.random.RandomState(0)

trainer = Trainer(cfg, dtype=jnp.bfloat16)
state = trainer.init_state(jax.random.PRNGKey(0), (H, W), batch_size=B)
step = trainer.jit_train_step()

n_inst = 6
gt_masks = np.zeros((B, G, H, W), np.float32)
gt_valid = np.zeros((B, G), bool)
for b in range(B):
    for g in range(n_inst):
        y, x = rng.randint(0, H - 80), rng.randint(0, W - 80)
        gt_masks[b, g, y:y + 80, x:x + 80] = 1
        gt_valid[b, g] = True
batch = {
    "image": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
    "xyz": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
    "gt_labels": jnp.ones((B, G), jnp.int32),
    "gt_masks": jnp.asarray(gt_masks),
    "gt_valid": jnp.asarray(gt_valid),
    "label_image": jnp.zeros((B, H, W), jnp.int32),
}

pb = pair_bucket(int(gt_valid.sum()), B * G)
print(f"valid pairs {int(gt_valid.sum())}/{B * G}, bucket {pb}")

for name, kw in [("no-compaction", {}), (f"pair_budget={pb}", {"pair_budget": pb})]:
    t0 = time.perf_counter()
    s, m = step(state, batch, jax.random.PRNGKey(0), **kw)
    jax.block_until_ready(m["total_loss"])
    print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s "
          f"loss {float(m['total_loss']):.4f}", flush=True)
    N = 5
    t0 = time.perf_counter()
    s2, m2 = state, None
    for i in range(N):
        s2, m2 = step(s2, batch, jax.random.PRNGKey(i), **kw)
    jax.block_until_ready(m2["total_loss"])
    dt = (time.perf_counter() - t0) / N
    print(f"{name}: {dt * 1e3:.0f} ms/step", flush=True)


# ---------------------------------------------------------------------------
# breakdown (VERDICT r3 item 5): where does the step go? forward vs backward,
# model vs criterion, backbone vs decoder - decides whether the fused
# cross-attention kernel needs a custom_vjp or gets a measured rejection.


def timeit(fn, *a, iters=5, **k):
    r = fn(*a, **k)
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
        best = min(best, time.perf_counter() - t0)
    return best


variables = {"params": state.params, "batch_stats": state.batch_stats}


def model_fwd(v, img, xyz):
    return trainer.model.apply(v, img, xyz, train=True,
                               mutable=["batch_stats"])


def full_loss(params, img, xyz):
    out, _ = trainer.model.apply(
        {"params": params, "batch_stats": state.batch_stats},
        img, xyz, train=True, mutable=["batch_stats"])
    total, _ = trainer.criterion(jax.random.PRNGKey(0), out,
                                 batch["gt_labels"], batch["gt_masks"],
                                 batch["gt_valid"], pair_budget=pb)
    return total


def crit_only(out):
    total, _ = trainer.criterion(jax.random.PRNGKey(0), out,
                                 batch["gt_labels"], batch["gt_masks"],
                                 batch["gt_valid"], pair_budget=pb)
    return total


img, xyz = batch["image"], batch["xyz"]
t_fwd = timeit(jax.jit(model_fwd), variables, img, xyz)
out0, _ = jax.jit(model_fwd)(variables, img, xyz)
t_crit = timeit(jax.jit(crit_only), out0)
t_loss_fwd = timeit(jax.jit(full_loss), state.params, img, xyz)
t_grad = timeit(jax.jit(jax.grad(full_loss)), state.params, img, xyz)

# backbone alone (fwd and grad-through)
from unseenobjectswithmeanshift_tpu.models.segnet import SEGNET

bb = SEGNET(network="resnet34_8s", input_type="RGBD", fusion_type="add",
            dtype=jnp.bfloat16)
vb = bb.init(jax.random.PRNGKey(0), img, xyz, train=False)
t_bb = timeit(jax.jit(lambda v, a, b: bb.apply(v, a, b, train=False)),
              vb, img, xyz)
t_bb_g = timeit(jax.jit(jax.grad(
    lambda p, a, b: jnp.sum(bb.apply(
        {"params": p, "batch_stats": vb.get("batch_stats", {})},
        a, b, train=False).astype(jnp.float32)))), vb["params"], img, xyz)

print(f"\n# breakdown (B={B}, {H}x{W}, bf16, pair_budget={pb}):")
print(f"#   model fwd (train=True)     : {t_fwd*1e3:7.1f} ms")
print(f"#   criterion on fwd outputs   : {t_crit*1e3:7.1f} ms")
print(f"#   loss fwd (model+criterion) : {t_loss_fwd*1e3:7.1f} ms")
print(f"#   loss grad (fwd+bwd)        : {t_grad*1e3:7.1f} ms  "
      f"(bwd ~= {(t_grad-t_loss_fwd)*1e3:.1f} ms)")
print(f"#   backbone fwd alone         : {t_bb*1e3:7.1f} ms")
print(f"#   backbone grad alone        : {t_bb_g*1e3:7.1f} ms")
print(f"#   -> decoder+losses fwd ~= {(t_loss_fwd-t_bb)*1e3:.1f} ms, "
      f"decoder+losses bwd ~= {(t_grad-t_loss_fwd-(t_bb_g-t_bb))*1e3:.1f} ms",
      flush=True)
