"""End-to-end smoke tests of the fused two-stage predictor (random weights, tiny
shapes) - validates shapes, jit-ability, and the no-crop fallback."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unseenobjectswithmeanshift_tpu.config import get_config
from unseenobjectswithmeanshift_tpu.pipeline.two_stage import TwoStagePredictor


@pytest.fixture(scope="module")
def tiny_predictor():
    cfg = get_config("tabletop_pretrained")
    # shrink everything for CPU tests
    cfg.decoder.num_queries = 8
    cfg.decoder.hidden_dim = 32
    cfg.decoder.dim_feedforward = 64
    cfg.decoder.dec_layers = 2
    cfg.decoder.nheads = 4
    cfg.decoder.mask_dim = 32
    cfg.decoder.conv_dim = 16
    cfg.backbone.num_units = 16
    cfg.pixel_decoder.conv_dim = 16
    cfg.pixel_decoder.mask_dim = 32
    cfg.test.max_instances = 4
    cfg.test.crop_size = 32
    pred = TwoStagePredictor(cfg)
    v1, v2 = pred.init(jax.random.PRNGKey(0), (64, 64), crop_size=32)
    return pred, v1, v2


def test_two_stage_shapes_and_determinism(tiny_predictor, rng):
    pred, v1, v2 = tiny_predictor
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    xyz = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    labels, refined = pred(v1, v2, img, xyz)
    assert labels.shape == (1, 64, 64)
    assert refined.shape == (1, 64, 64)
    labels2, refined2 = pred(v1, v2, img, xyz)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(labels2))
    np.testing.assert_array_equal(np.asarray(refined), np.asarray(refined2))
    # label values in range: stage1 in {0, 2..T+1}, refined in {0..}
    lab = np.asarray(labels)
    assert lab.min() >= 0 and lab.max() <= 4 + 1


def test_two_stage_no_refine(tiny_predictor, rng):
    pred, v1, v2 = tiny_predictor
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    xyz = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    labels, refined = pred(v1, v2, img, xyz, refine=False)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(refined))


def test_two_stage_batch(tiny_predictor, rng):
    pred, v1, v2 = tiny_predictor
    img = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    xyz = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    labels, refined = pred(v1, v2, img, xyz)
    assert labels.shape == (2, 64, 64)


def test_bucketed_matches_single_graph(tiny_predictor, rng):
    """The bucketed (compacted stage-2) path must reproduce the single-graph
    path exactly: per-crop compute is independent and the paste-back gates on
    the original present mask."""
    pred, v1, v2 = tiny_predictor
    img = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    xyz = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    labels_b, refined_b = pred(v1, v2, img, xyz)  # bucketed default
    labels_s, refined_s = jax.jit(
        pred._forward, static_argnames=("osd", "refine"))(
        v1, v2, img, xyz, osd=False, refine=True)
    np.testing.assert_array_equal(np.asarray(labels_b), np.asarray(labels_s))
    np.testing.assert_array_equal(np.asarray(refined_b), np.asarray(refined_s))


def test_sharded_serving_matches_single_device(tiny_predictor, rng):
    """DP-sharded inference over an 8-device CPU mesh must match the
    unsharded single-graph path (per-device crop work is device-local)."""
    from unseenobjectswithmeanshift_tpu.parallel.mesh import (
        make_mesh, shard_batch, replicate,
    )

    pred, v1, v2 = tiny_predictor
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    img = jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32))
    xyz = jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32))

    labels_ref, refined_ref = jax.jit(
        pred._forward, static_argnames=("osd", "refine"))(
        v1, v2, img, xyz, osd=False, refine=True)

    mesh = make_mesh()
    with mesh:
        fn = pred.jit_sharded(mesh)
        labels_s, refined_s = fn(replicate(mesh, v1), replicate(mesh, v2),
                                 shard_batch(mesh, img), shard_batch(mesh, xyz))
    np.testing.assert_array_equal(np.asarray(labels_s), np.asarray(labels_ref))
    np.testing.assert_array_equal(np.asarray(refined_s), np.asarray(refined_ref))


def test_sp_sharded_serving_matches_single_device(tiny_predictor, rng):
    """Spatially-sharded (image height over 'sp') single-image inference must
    match the unsharded path - GSPMD inserts the conv halo exchanges and the
    cross-shard reductions; numerics are exact because the partitioned graph
    computes the same sums."""
    from unseenobjectswithmeanshift_tpu.parallel.mesh import (
        make_mesh, replicate, spatial_sharding,
    )

    pred, v1, v2 = tiny_predictor
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    xyz = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))

    labels_ref, refined_ref = jax.jit(
        pred._forward, static_argnames=("osd", "refine"))(
        v1, v2, img, xyz, osd=False, refine=True)

    mesh = make_mesh(axis_name="sp")
    with mesh:
        fn = pred.jit_sharded_sp(mesh)
        sp = spatial_sharding(mesh)
        labels_s, refined_s = fn(replicate(mesh, v1), replicate(mesh, v2),
                                 jax.device_put(img, sp),
                                 jax.device_put(xyz, sp))
    np.testing.assert_array_equal(np.asarray(labels_s), np.asarray(labels_ref))
    np.testing.assert_array_equal(np.asarray(refined_s),
                                  np.asarray(refined_ref))


def test_dp_x_sp_2d_mesh_serving(tiny_predictor, rng):
    """Mixed regime: a 2-D mesh shards batch over 'dp' AND image height over
    'sp' in one jit - the deployment shape for serving many cameras on a pod
    slice. Must equal the unsharded graph."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    pred, v1, v2 = tiny_predictor
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    img = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    xyz = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))

    labels_ref, refined_ref = jax.jit(
        pred._forward, static_argnames=("osd", "refine"))(
        v1, v2, img, xyz, osd=False, refine=True)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    dsp = NamedSharding(mesh, P("dp", "sp"))
    rep = NamedSharding(mesh, P())
    from functools import partial
    with mesh:
        fn = jax.jit(partial(pred._forward, osd=False, refine=True),
                     in_shardings=(rep, rep, dsp, dsp),
                     out_shardings=(dsp, dsp))
        labels_s, refined_s = fn(
            jax.device_put(v1, rep), jax.device_put(v2, rep),
            jax.device_put(img, dsp), jax.device_put(xyz, dsp))
    np.testing.assert_array_equal(np.asarray(labels_s), np.asarray(labels_ref))
    np.testing.assert_array_equal(np.asarray(refined_s),
                                  np.asarray(refined_ref))
