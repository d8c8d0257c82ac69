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


def test_embedding_loss_wired_into_trainer(rng):
    """use_embedding_loss adds the metric-learning term to the MSMFormer train
    step (ref: pretrained_meanshiftformer_model.py:316-325): the reported
    embedding_loss must equal the directly-computed loss on the model's
    normalized backbone features, and the total must include it weighted."""
    from unseenobjectswithmeanshift_tpu.losses.embedding import embedding_loss

    cfg = tiny_cfg()
    cfg.loss.use_embedding_loss = True
    cfg.loss.embedding_loss_weight = 2.0
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0), (32, 32), batch_size=2)
    batch = make_batch(rng, 2)
    # per-pixel instance labels consistent with the gt masks (slot i -> i+1)
    lab = np.zeros((2, 32, 32), np.int32)
    lab[:, 4:16, 4:16] = 1
    lab[:, 20:30, 18:30] = 2
    batch["label_image"] = jnp.asarray(lab)

    _, metrics = jax.jit(tr.train_step)(state, batch, jax.random.PRNGKey(3))
    assert "embedding_loss" in metrics
    emb = float(metrics["embedding_loss"])
    assert np.isfinite(emb)

    # oracle: recompute on the model's own features
    outputs = tr.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"], batch["xyz"], train=True,
        mutable=["batch_stats"])[0]
    want, intra, inter = embedding_loss(
        outputs["backbone_features"].astype(jnp.float32), batch["label_image"],
        k_max=cfg.loss.max_gt_instances + 1, alpha=cfg.loss.embedding_alpha,
        delta=cfg.loss.embedding_delta,
        lambda_intra=cfg.loss.embedding_lambda_intra,
        lambda_inter=cfg.loss.embedding_lambda_inter)
    np.testing.assert_allclose(emb, float(want), rtol=1e-5, atol=1e-6)
    assert float(metrics["intra_cluster_loss"]) == pytest.approx(float(intra),
                                                                 abs=1e-6)

    # total includes the weighted term: rerun with weight 0 and compare
    cfg0 = tiny_cfg()
    cfg0.loss.use_embedding_loss = False
    tr0 = Trainer(cfg0)
    _, m0 = jax.jit(tr0.train_step)(state, batch, jax.random.PRNGKey(3))
    np.testing.assert_allclose(
        float(metrics["total_loss"]),
        float(m0["total_loss"]) + cfg.loss.embedding_loss_weight * emb,
        rtol=1e-5)


def test_nonfinite_step_skips_update(rng):
    """A batch that produces a non-finite loss/grad must leave params and
    opt_state untouched and flag skipped_nonfinite=1 (failure handling: one
    bad batch must not poison a 70k-iteration run)."""
    cfg = tiny_cfg()
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0), (32, 32), batch_size=2)
    step = jax.jit(tr.train_step)

    good = make_batch(rng, 2)
    state, m = step(state, good, jax.random.PRNGKey(0))
    assert float(m["skipped_nonfinite"]) == 0.0
    params_before = jax.tree.map(np.asarray, state.params)

    bad = dict(good)
    bad["image"] = good["image"].at[0, 0, 0, 0].set(jnp.nan)
    state2, m2 = step(state, bad, jax.random.PRNGKey(1))
    assert float(m2["skipped_nonfinite"]) == 1.0
    assert int(state2.step) == int(state.step) + 1   # step still advances
    after = jax.tree.map(np.asarray, state2.params)
    jax.tree.map(np.testing.assert_array_equal, params_before, after)

    # and a good batch after the skipped one still trains
    state3, m3 = step(state2, good, jax.random.PRNGKey(2))
    assert float(m3["skipped_nonfinite"]) == 0.0
