"""UCN legacy pipeline smoke test (tiny backbone, random weights)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unseenobjectswithmeanshift_tpu.config import get_config
from unseenobjectswithmeanshift_tpu.pipeline.ucn import UCNPredictor
from unseenobjectswithmeanshift_tpu.models.resnet import DilatedResNetFCN
from unseenobjectswithmeanshift_tpu.models.segnet import SEGNET


class TinySeg(SEGNET):
    def _make_fcn(self, name):
        return DilatedResNetFCN(layers=(1, 1, 1, 1), block="basic",
                                num_units=self.num_units, output_stride=8,
                                dtype=self.dtype, name=name)


def test_ucn_two_stage_smoke(rng):
    cfg = get_config("tabletop_pretrained")
    cfg.backbone.num_units = 16
    cfg.mean_shift.num_seeds = 12
    cfg.test.max_instances = 4
    cfg.test.crop_size = 32

    pred = UCNPredictor(cfg)
    pred.network = TinySeg(input_type="RGBD", fusion_type="add", num_units=16)
    pred.network_crop = TinySeg(input_type="RGBD", fusion_type="add", num_units=16)
    v1, v2 = pred.init(jax.random.PRNGKey(0), (64, 64), crop_size=32)

    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    xyz = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) + 0.5)
    labels, refined = pred(v1, v2, img, xyz)
    assert labels.shape == (1, 64, 64)
    assert refined.shape == (1, 64, 64)
    lab = np.asarray(labels)
    assert lab.min() >= 0
    # label 0 is the largest cluster by construction
    counts = np.bincount(lab.ravel())
    assert counts[0] == counts.max()


def test_ucn_bucketed_matches_single_graph(rng):
    """Bucketed crop compaction must reproduce the single-graph UCN path."""
    cfg = get_config("tabletop_pretrained")
    cfg.backbone.num_units = 16
    cfg.mean_shift.num_seeds = 12
    cfg.test.max_instances = 4
    cfg.test.crop_size = 32

    pred = UCNPredictor(cfg)
    pred.network = TinySeg(input_type="RGBD", fusion_type="add", num_units=16)
    pred.network_crop = TinySeg(input_type="RGBD", fusion_type="add", num_units=16)
    v1, v2 = pred.init(jax.random.PRNGKey(0), (64, 64), crop_size=32)

    img = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    xyz = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) + 0.5)
    labels_b, refined_b = pred(v1, v2, img, xyz)  # bucketed default
    labels_s, refined_s = jax.jit(
        pred._forward, static_argnames=("refine", "depth_threshold"))(
        v1, v2, img, xyz, depth_threshold=0.8, refine=True, first_seed_idx=0)
    np.testing.assert_array_equal(np.asarray(labels_b), np.asarray(labels_s))
    np.testing.assert_array_equal(np.asarray(refined_b), np.asarray(refined_s))


def test_ucn_sharded_serving_matches_single_device(rng):
    """DP-sharded UCN inference over the 8-device CPU mesh == unsharded
    single-graph path (the reference evaluates UCN one image at a time on one
    GPU; DP eval is the multi-chip equivalent)."""
    import pytest

    from unseenobjectswithmeanshift_tpu.parallel.mesh import (
        make_mesh, replicate, shard_batch,
    )

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")

    cfg = get_config("tabletop_pretrained")
    cfg.backbone.num_units = 16
    cfg.mean_shift.num_seeds = 12
    cfg.test.max_instances = 4
    cfg.test.crop_size = 32

    pred = UCNPredictor(cfg)
    pred.network = TinySeg(input_type="RGBD", fusion_type="add", num_units=16)
    pred.network_crop = TinySeg(input_type="RGBD", fusion_type="add", num_units=16)
    v1, v2 = pred.init(jax.random.PRNGKey(0), (64, 64), crop_size=32)

    img = jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32))
    xyz = jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32) + 0.5)

    from functools import partial
    ref_fn = jax.jit(partial(pred._forward, depth_threshold=0.8, refine=True,
                             first_seed_idx=0))
    labels_ref, refined_ref = ref_fn(v1, v2, img, xyz)

    mesh = make_mesh()
    with mesh:
        fn = pred.jit_sharded(mesh)
        labels_s, refined_s = fn(replicate(mesh, v1), replicate(mesh, v2),
                                 shard_batch(mesh, img), shard_batch(mesh, xyz))
    np.testing.assert_array_equal(np.asarray(labels_s), np.asarray(labels_ref))
    np.testing.assert_array_equal(np.asarray(refined_s),
                                  np.asarray(refined_ref))
