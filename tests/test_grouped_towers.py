"""Grouped two-towers-as-one-conv backbone: exact parity with 'add'/'cat'
fusion (models/segnet.SEGNET.grouped_towers).

The reference runs the two RGBD towers sequentially (lib/networks/SEG.py:
105-110). The grouped variant stacks them into one feature_group_count=2
conv stack (every conv contracts at double width - the MXU-filling lever
measured in scripts/profile_backbone_mfu.py). These tests pin the exactness
contract: fused weights reproduce the two-tower output to float tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unseenobjectswithmeanshift_tpu.models.segnet import SEGNET
from unseenobjectswithmeanshift_tpu.utils.checkpoint import (
    fuse_grouped_towers, fuse_tower_params)


@pytest.mark.parametrize("fusion", ["add", "cat"])
def test_grouped_towers_matches_two_tower(fusion):
    H = W = 48
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
    xyz = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))

    ref = SEGNET(input_type="RGBD", fusion_type=fusion, num_units=8)
    variables = ref.init(jax.random.PRNGKey(0), img, xyz, train=False)
    out_ref = ref.apply(variables, img, xyz, train=False)

    grp = SEGNET(input_type="RGBD", fusion_type=fusion, num_units=8,
                 grouped_towers=True)
    fused = fuse_grouped_towers(jax.device_get(variables))
    out_grp = grp.apply(fused, img, xyz, train=False)

    assert out_grp.shape == out_ref.shape
    np.testing.assert_allclose(np.asarray(out_grp), np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_param_count_matches():
    H = W = 32
    img = jnp.zeros((1, H, W, 3))
    ref = SEGNET(input_type="RGBD", fusion_type="add", num_units=8)
    grp = SEGNET(input_type="RGBD", fusion_type="add", num_units=8,
                 grouped_towers=True)
    v_ref = ref.init(jax.random.PRNGKey(0), img, img, train=False)
    v_grp = grp.init(jax.random.PRNGKey(0), img, img, train=False)
    n = lambda v: sum(x.size for x in jax.tree_util.tree_leaves(v))
    assert n(v_ref) == n(v_grp)
    # and the fused tree is structurally identical to the grouped init
    fused = fuse_grouped_towers(jax.device_get(v_ref))
    jax.tree_util.tree_map(lambda a, b: None, fused, jax.device_get(v_grp))


def test_fuse_tower_params_is_exact_stack():
    a = {"fcn": {"conv1": {"kernel": np.ones((3, 3, 3, 4))}},
         "fcn_depth": {"conv1": {"kernel": np.zeros((3, 3, 3, 4))}}}
    f = fuse_tower_params(a)
    assert f["fcn"]["conv1"]["kernel"].shape == (3, 3, 3, 8)
    np.testing.assert_array_equal(f["fcn"]["conv1"]["kernel"][..., :4], 1.0)
    np.testing.assert_array_equal(f["fcn"]["conv1"]["kernel"][..., 4:], 0.0)
