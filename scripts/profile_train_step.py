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

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from unseenobjectswithmeanshift_tpu.config import get_config
from unseenobjectswithmeanshift_tpu.train.trainer import Trainer, pair_bucket

B, H, W = (int(os.environ.get("PROF_B", 4)),
           int(os.environ.get("PROF_H", 480)),
           int(os.environ.get("PROF_W", 640)))  # env overrides: CPU smoke
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

if os.environ.get("PROF_STEP_ONLY"):   # quick re-measure after a train-path change
    sys.exit(0)


# ---------------------------------------------------------------------------
# breakdown (VERDICT r3 item 5): where does the step go? forward vs backward,
# model vs criterion, backbone vs decoder, and the chunked masked attention in
# isolation - decides whether the fused cross-attention kernel needs a
# custom_vjp or gets a measured rejection.
#
# OOM notes (the first version of this block RESOURCE_EXHAUSTED'd): never hold
# the full decoder outputs (7 aux levels of [B,Q,H,W] masks ~ 3.4 GB fp32) on
# device while also compiling a grad graph; time the backward as
# step - fwd - optimizer instead of jax.grad(full_loss) (the step's
# value_and_grad is the known-fitting formulation).


def timeit(fn, *a, iters=5, **k):
    """Pipelined timing per the verify-skill recipe: enqueue all iters, sync
    once on the last result (block_until_ready does not block over the dev
    tunnel; np.asarray of a dependent scalar does)."""
    r = fn(*a, **k)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a, **k)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


img, xyz = batch["image"], batch["xyz"]
variables = {"params": state.params, "batch_stats": state.batch_stats}


def full_loss(params, img, xyz):
    out, _ = trainer.model.apply(
        {"params": params, "batch_stats": state.batch_stats},
        img, xyz, train=True, mutable=["batch_stats"])
    total, _ = trainer.criterion(jax.random.PRNGKey(0), out,
                                 batch["gt_labels"], batch["gt_masks"],
                                 batch["gt_valid"], pair_budget=pb)
    return total


# scalar-returning fwd: nothing large lives past the jit
t_loss_fwd = timeit(jax.jit(full_loss), state.params, img, xyz)
t_step = timeit(lambda: step(state, batch, jax.random.PRNGKey(0), pb)[1]
                ["total_loss"])

# model fwd without the criterion (reduce outputs to a scalar in-graph)
def model_fwd_scalar(params, img, xyz):
    out, _ = trainer.model.apply(
        {"params": params, "batch_stats": state.batch_stats},
        img, xyz, train=True, mutable=["batch_stats"])
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(out))

t_fwd = timeit(jax.jit(model_fwd_scalar), state.params, img, xyz)

# backbone alone (fwd and grad-through)
from unseenobjectswithmeanshift_tpu.models.segnet import SEGNET

bb = SEGNET(network="resnet34_8s", input_type="RGBD", fusion_type="add",
            dtype=jnp.bfloat16)
vb = bb.init(jax.random.PRNGKey(0), img, xyz, train=False)
t_bb = timeit(jax.jit(lambda v, a, b: jnp.sum(
    bb.apply(v, a, b, train=False).astype(jnp.float32))), vb, img, xyz)
t_bb_g = timeit(jax.jit(jax.grad(
    lambda p, a, b: jnp.sum(bb.apply(
        {"params": p, "batch_stats": vb.get("batch_stats", {})},
        a, b, train=False).astype(jnp.float32)))), vb["params"], img, xyz)

# the chunked masked hypersphere attention in ISOLATION at the exact
# per-layer train shape: fwd and fwd+bwd. x6 layers = its share of the step.
from unseenobjectswithmeanshift_tpu.ops.hypersphere_attention import (
    MhaParams, chunked_masked_meanshift_attention, l2_normalize, split_heads)

E, Hh, Q, K = 256, 8, 100, H * W
r = jax.random.PRNGKey(1)
ks = jax.random.split(r, 12)
mk = lambda i, *s: (jax.random.normal(ks[i], s, jnp.bfloat16) * 0.05)
mha = MhaParams(q_kernel=mk(0, E, E), k_kernel=mk(1, E, E),
                v_kernel=mk(2, E, E), q_bias=mk(3, E), k_bias=mk(4, E),
                v_bias=mk(5, E), out_kernel=mk(6, E, E), out_bias=mk(7, E))
qx = mk(8, B, Q, E)
kx = mk(9, B, K, E)
ml = jax.random.normal(ks[10], (B, Q, K), jnp.float32)


def attn_fwd(p, q, k, m):
    return jnp.sum(chunked_masked_meanshift_attention(
        p, q, k, k, Hh, m).astype(jnp.float32))


t_attn = timeit(jax.jit(attn_fwd), mha, qx, kx, ml)
t_attn_g = timeit(jax.jit(jax.grad(attn_fwd, argnums=(0, 1, 2))),
                  mha, qx, kx, ml)

# the two-pass fixed-max reformulation (single accumulator, no rescale
# chain in the differentiated graph) - the candidate replacement
from unseenobjectswithmeanshift_tpu.ops.hypersphere_attention import (
    chunked_masked_meanshift_attention_twopass)


def attn2_fwd(p, q, k, m):
    return jnp.sum(chunked_masked_meanshift_attention_twopass(
        p, q, k, k, Hh, m).astype(jnp.float32))


t_attn2 = timeit(jax.jit(attn2_fwd), mha, qx, kx, ml)
t_attn2_g = timeit(jax.jit(jax.grad(attn2_fwd, argnums=(0, 1, 2))),
                   mha, qx, kx, ml)

# what the fused inference kernel does for the same work (fwd-only ceiling)
from unseenobjectswithmeanshift_tpu.ops.pallas_attention import (
    fused_masked_hypersphere_attention)

if jax.devices()[0].platform != "cpu":
    qn = l2_normalize(split_heads(
        jnp.einsum("ble,ef->blf", qx, mha.q_kernel) + mha.q_bias, Hh))
    pos = mk(11, K, E)
    # ml passed as an ARGUMENT: closed-over it is a 491 MB HLO literal that
    # the remote compile endpoint rejects (HTTP 413)
    t_fused = timeit(jax.jit(lambda q, b, p, m: jnp.sum(
        fused_masked_hypersphere_attention(
            q, b, p, mha.k_kernel, mha.k_bias, mha.v_kernel, mha.v_bias,
            m).astype(jnp.float32))), qn, kx, pos, ml)
else:
    t_fused = float("nan")

print(f"\n# breakdown (B={B}, {H}x{W}, bf16, pair_budget={pb}):")
print(f"#   train step (fwd+bwd+opt)    : {t_step*1e3:7.1f} ms")
print(f"#   loss fwd (model+criterion)  : {t_loss_fwd*1e3:7.1f} ms   "
      f"-> bwd+opt ~= {(t_step-t_loss_fwd)*1e3:.1f} ms")
print(f"#   model fwd alone             : {t_fwd*1e3:7.1f} ms   "
      f"-> criterion fwd ~= {(t_loss_fwd-t_fwd)*1e3:.1f} ms")
print(f"#   backbone fwd alone          : {t_bb*1e3:7.1f} ms")
print(f"#   backbone fwd+bwd alone      : {t_bb_g*1e3:7.1f} ms")
print(f"#   chunked attn fwd (1 layer)  : {t_attn*1e3:7.1f} ms   "
      f"x6 = {6*t_attn*1e3:.1f} ms")
print(f"#   chunked attn fwd+bwd (1 l.) : {t_attn_g*1e3:7.1f} ms   "
      f"x6 = {6*t_attn_g*1e3:.1f} ms "
      f"({100*6*t_attn_g/t_step:.0f}% of the step)")
print(f"#   two-pass attn fwd (1 layer) : {t_attn2*1e3:7.1f} ms")
print(f"#   two-pass attn fwd+bwd (1 l.): {t_attn2_g*1e3:7.1f} ms   "
      f"x6 = {6*t_attn2_g*1e3:.1f} ms "
      f"(vs online {t_attn_g/max(t_attn2_g,1e-9):.2f}x)")
print(f"#   fused kernel fwd (1 layer)  : {t_fused*1e3:7.1f} ms  "
      f"(inference ceiling for the same contraction)", flush=True)
