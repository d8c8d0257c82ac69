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
          f"loss {float(m['total_loss']):.4f}")
    N = 5
    t0 = time.perf_counter()
    s2, m2 = state, None
    for i in range(N):
        s2, m2 = step(s2, batch, jax.random.PRNGKey(i), **kw)
    jax.block_until_ready(m2["total_loss"])
    dt = (time.perf_counter() - t0) / N
    print(f"{name}: {dt * 1e3:.0f} ms/step")
