"""Procedural synthetic tabletop scenes: numpy oracle vs on-device pipeline.

The synthetic generator is the training-data source for the learning-
capability demonstration (no real TOD/OCID data in this environment; see
data/synthetic.py). These tests pin:
- determinism + train/test split disjointness of the scene stream
- geometric parity between the JAX renderer (production) and the numpy
  oracle (same fp32 intersection math)
- the device batch pipeline's contract with Trainer.jit_train_step
  (matching loader.label_image_to_instances semantics)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unseenobjectswithmeanshift_tpu.data.synthetic import (
    SyntheticTabletopDataset, sample_scene_params, render_scene_numpy,
    KIND_NONE)
from unseenobjectswithmeanshift_tpu.data.synthetic_jax import (
    render_scene_batch, stack_scene_params, make_train_batch,
    SyntheticDeviceLoader, augment_depth, augment_xyz, augment_rgb)
from unseenobjectswithmeanshift_tpu.data.datasets import fov_intrinsics
from unseenobjectswithmeanshift_tpu.data.loader import (
    label_image_to_instances)

H, W = 96, 128
INTR = fov_intrinsics(W, H)
IARGS = (float(INTR["fx"]), float(INTR["fy"]),
         float(INTR["x_offset"]), float(INTR["y_offset"]))


def test_scene_params_shapes_and_visibility():
    p = sample_scene_params(np.random.RandomState(0), INTR, height=H, width=W)
    assert p["kinds"].shape == (9,) and p["centers"].shape == (9, 3)
    k = int(np.sum(p["kinds"] != KIND_NONE))
    assert k >= 3
    _, _, label = render_scene_numpy(p, H, W, INTR)
    # pixel-targeted placement: most sampled objects are actually visible
    assert len(np.unique(label)) - 1 >= max(2, k - 2)


def test_deterministic_and_split_disjoint():
    kw = dict(num_scenes=10, height=H, width=W, use_augmentation=False,
              chromatic=False, add_noise=False, seed=3)
    a = SyntheticTabletopDataset(image_set="train", **kw)[2]
    b = SyntheticTabletopDataset(image_set="train", **kw)[2]
    c = SyntheticTabletopDataset(image_set="test", **kw)[2]
    assert np.array_equal(a["label"], b["label"])
    assert np.array_equal(a["image"], b["image"])
    assert not np.array_equal(a["label"], c["label"])


def test_jax_renderer_matches_numpy_oracle():
    ps = [sample_scene_params(np.random.RandomState(i), INTR,
                              height=H, width=W) for i in range(4)]
    rgb_j, dep_j, lab_j = render_scene_batch(
        stack_scene_params(ps), H, W, *IARGS)
    for i in range(4):
        rgb_n, dep_n, lab_n = render_scene_numpy(ps[i], H, W, INTR)
        # identical fp32 math; tolerate a sliver of silhouette pixels where
        # associativity differs
        assert np.mean(np.asarray(lab_j[i]) != lab_n) < 2e-3
        both = (lab_n == np.asarray(lab_j[i]))
        d = np.abs(np.asarray(dep_j[i]) - dep_n)[both]
        assert d.max() < 1e-3
        r = np.abs(np.asarray(rgb_j[i]) - rgb_n)
        # rgb differs where bicubic upsampling differs (table mottle) and on
        # silhouettes; everywhere else it should be close
        assert np.quantile(r, 0.99) < 0.08


def test_make_train_batch_contract():
    loader = SyntheticDeviceLoader(batch_size=2, height=H, width=W,
                                   max_gt=12, seed=1)
    b = loader.batch_at(0)
    assert b["image"].shape == (2, H, W, 3)
    assert b["xyz"].shape == (2, H, W, 3)
    assert b["gt_masks"].shape == (2, 12, H, W)
    assert b["gt_valid"].shape == (2, 12)
    v = np.asarray(b["gt_valid"])
    # valid slots contiguous (the Trainer contract)
    for row in v:
        nz = np.nonzero(row)[0]
        assert row[:len(nz)].all()
    # masks disjoint, label_image consistent with masks
    m = np.asarray(b["gt_masks"])
    assert (m.sum(1) <= 1.0 + 1e-6).all()
    li = np.asarray(b["label_image"])
    for bb in range(2):
        for g in np.nonzero(v[bb])[0]:
            assert np.array_equal(li[bb] == g + 1, m[bb, g] > 0.5)


def test_instances_match_host_loader():
    """Device instance extraction == loader.label_image_to_instances on the
    same (renumber-free) label image."""
    ps = [sample_scene_params(np.random.RandomState(7), INTR,
                              height=H, width=W)]
    _, _, lab = render_scene_batch(stack_scene_params(ps), H, W, *IARGS)
    lab = np.asarray(lab[0])
    mh, lh, vh, rh = label_image_to_instances(lab, 12)
    b = make_train_batch(jax.random.PRNGKey(0), stack_scene_params(ps),
                         H, W, *IARGS, max_gt=12, augment=False)
    # host loader compacts by unique-id order; device compacts by slot order.
    # Slot ids are increasing, so orders agree.
    assert np.array_equal(np.asarray(b["gt_valid"][0]), vh)
    assert np.array_equal(np.asarray(b["gt_masks"][0]), mh)
    assert np.array_equal(np.asarray(b["label_image"][0]), rh)


def test_crop_like_scene_statistics():
    """crop_like mode renders zoomed-in few-object scenes (the stage-2 RoI
    statistics used by `train_msmformer --crop`, ref SYN_CROP:
    tabletop_train_net.py crop recipe): every scene 1-4 instances, objects
    fill a much larger pixel fraction than whole-image framing."""
    crop = SyntheticDeviceLoader(batch_size=4, height=112, width=112,
                                 max_gt=12, seed=5, crop_like=True,
                                 augment=False)
    full = SyntheticDeviceLoader(batch_size=4, height=112, width=112,
                                 max_gt=12, seed=5, crop_like=False,
                                 augment=False)
    bc, bf = crop.batch_at(0), full.batch_at(0)
    vc = np.asarray(bc["gt_valid"]).sum(1)
    assert ((1 <= vc) & (vc <= 4)).all()
    # object pixel coverage: zoomed-in crops are mostly object
    cov_c = np.asarray(bc["gt_masks"]).sum((1, 2, 3)).mean() / (112 * 112)
    cov_f = np.asarray(bf["gt_masks"]).sum((1, 2, 3)).mean() / (112 * 112)
    assert cov_c > 1.5 * cov_f
    # same contract as the whole-image loader (Trainer consumes unchanged)
    assert bc["image"].shape == (4, 112, 112, 3)
    assert bc["gt_masks"].shape == (4, 12, 112, 112)


def test_augment_statistics():
    key = jax.random.PRNGKey(0)
    depth = jnp.full((H, W), 1.2, jnp.float32)
    out = augment_depth(key, depth)
    out = np.asarray(out)
    # multiplicative gamma(1000, 0.001): mean 1, sd ~0.03
    nz = out[out > 0]
    assert abs(nz.mean() / 1.2 - 1.0) < 0.15
    # some ellipse dropout happened (Poisson(10) rarely 0)
    assert (out == 0).sum() > 0
    xyz = jnp.zeros((H, W, 3))
    x2 = np.asarray(augment_xyz(key, xyz, depth))
    assert 0 < np.abs(x2).max() < 0.05
    rgb = jnp.full((H, W, 3), 0.5, jnp.float32)
    r2 = np.asarray(augment_rgb(key, rgb))
    assert r2.shape == rgb.shape and r2.min() >= 0 and r2.max() <= 1


def test_hls_roundtrip():
    from unseenobjectswithmeanshift_tpu.data.synthetic_jax import (
        _rgb_to_hls, _hls_to_rgb)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    h, l, s = _rgb_to_hls(rgb)
    back = _hls_to_rgb(h, l, s)
    assert np.abs(np.asarray(back) - np.asarray(rgb)).max() < 1e-4


def test_ocid_style_scene_statistics():
    """scene_style='ocid' (VERDICT r4 item 6): denser clutter - more
    instances, touching/stacked objects, concave composites spanning several
    primitive slots with one instance id - pushed toward OCID statistics
    (up to 20 instances there, ref: lib/datasets/get_max_num_object.py)."""
    kw = dict(max_objects=14, min_objects=5, height=H, width=W,
              max_slots=20, p_stack=0.3, p_composite=0.25, touching=True)
    counts, multi_slot, elevated = [], 0, 0
    for i in range(30):
        p = sample_scene_params(np.random.RandomState(i), INTR, **kw)
        ids = p["ids"][p["kinds"] != KIND_NONE]
        k = len(np.unique(ids))
        counts.append(k)
        if len(ids) > k:
            multi_slot += 1          # at least one composite
        # stacked objects have feet above the plane: signed distance of the
        # lowest primitive point along n
        n, p0 = p["plane_n"], p["plane_p0"]
        for s in np.nonzero(p["kinds"] != KIND_NONE)[0]:
            h = float((p["centers"][s] - p0) @ n)
            if h > 0.22:             # well above any single object's height
                elevated += 1
    assert np.mean(counts) >= 6.5, np.mean(counts)
    assert max(counts) >= 10
    assert multi_slot >= 5           # composites actually occur
    assert elevated >= 3             # stacking actually occurs


def test_ocid_style_renderer_matches_oracle():
    """The JAX renderer consumes the new ids/composites identically to the
    numpy oracle."""
    kw = dict(max_objects=12, min_objects=6, height=H, width=W,
              max_slots=18, p_stack=0.35, p_composite=0.3, touching=True)
    ps = [sample_scene_params(np.random.RandomState(100 + i), INTR, **kw)
          for i in range(3)]
    rgb_j, dep_j, lab_j = render_scene_batch(
        stack_scene_params(ps), H, W, *IARGS)
    for i in range(3):
        _, dep_n, lab_n = render_scene_numpy(ps[i], H, W, INTR)
        assert np.mean(np.asarray(lab_j[i]) != lab_n) < 2e-3
        both = (lab_n == np.asarray(lab_j[i]))
        assert np.abs(np.asarray(dep_j[i]) - dep_n)[both].max() < 1e-3


def test_r4_streams_bit_identical():
    """The default knobs reproduce the round-4 scene stream draw-for-draw
    (the committed checkpoint's held-out eval must not shift)."""
    p = sample_scene_params(np.random.RandomState(42), INTR,
                            height=H, width=W)
    q = sample_scene_params(np.random.RandomState(42), INTR,
                            height=H, width=W, p_stack=0.0,
                            p_composite=0.0, touching=False)
    for k in p:
        np.testing.assert_array_equal(p[k], q[k])
    # slots are ids 1..placed in order (the legacy labeling contract)
    live = p["kinds"] != KIND_NONE
    assert np.array_equal(p["ids"][live],
                          np.arange(1, int(live.sum()) + 1))


def test_ocid_loader_contract():
    """SyntheticDeviceLoader(scene_style='ocid') keeps the Trainer batch
    contract (composite ids stay within max_gt; masks/label consistent)."""
    loader = SyntheticDeviceLoader(batch_size=2, height=H, width=W,
                                   max_gt=16, seed=9, scene_style="ocid",
                                   augment=False)
    b = loader.batch_at(0)
    v = np.asarray(b["gt_valid"])
    assert v.sum(1).min() >= 5
    m = np.asarray(b["gt_masks"])
    assert (m.sum(1) <= 1.0 + 1e-6).all()
    li = np.asarray(b["label_image"])
    for bb in range(2):
        for g in np.nonzero(v[bb])[0]:
            assert np.array_equal(li[bb] == g + 1, m[bb, g] > 0.5)


def test_syn_crop_device_statistics():
    """Device SYN_CROP (round 5): padded square crops around ONE random
    object from full rendered scenes - crop_rois inference statistics (one
    dominant object filling the frame), the reference's crop-net training
    recipe (tabletop_object.py:175-237). Round 4's crop_like mode produced
    3-4x smaller objects and a crop net that shattered inference crops."""
    S = 64
    loader = SyntheticDeviceLoader(batch_size=4, max_gt=12, seed=21,
                                   syn_crop=True, crop_size=S,
                                   render_hw=(H, W), augment=False)
    full = SyntheticDeviceLoader(batch_size=4, height=H, width=W, max_gt=12,
                                 seed=21, augment=False)
    bc, bf = loader.batch_at(0), full.batch_at(0)
    assert bc["image"].shape == (4, S, S, 3)
    assert bc["xyz"].shape == (4, S, S, 3)
    assert bc["gt_masks"].shape == (4, 12, S, S)
    v = np.asarray(bc["gt_valid"])
    assert (v.sum(1) >= 1).all()
    # the dominant object: largest instance should cover a substantial
    # fraction of the crop (tight box + 0.5-1.0x padding -> object is
    # 1/9..1/4 of the square); whole-image objects are far smaller
    m = np.asarray(bc["gt_masks"])
    dom_c = max(m[b, g].mean() for b in range(4)
                for g in np.nonzero(v[b])[0])
    cov_c = np.mean([m[b, np.nonzero(v[b])[0]].sum(0).mean()
                     for b in range(4)])
    mf = np.asarray(bf["gt_masks"])
    vf = np.asarray(bf["gt_valid"])
    cov_f = np.mean([mf[b, np.nonzero(vf[b])[0]].sum(0).mean()
                     for b in range(4)])
    assert dom_c > 0.08, dom_c
    assert cov_c > 2.0 * cov_f, (cov_c, cov_f)
    # label/mask consistency (Trainer contract)
    li = np.asarray(bc["label_image"])
    for b in range(4):
        for g in np.nonzero(v[b])[0]:
            assert np.array_equal(li[b] == g + 1, m[b, g] > 0.5)


def test_syn_crop_device_geometry():
    """The crop is a true axis-aligned window: nearest-resized label values
    are a subset of the source scene's, xyz depth values come from the
    source, and the chosen object is fully inside the crop (its source
    tight box maps inside the window by construction)."""
    import jax as _jax
    from unseenobjectswithmeanshift_tpu.data.synthetic_jax import (
        _syn_crop_device)

    ps = [sample_scene_params(np.random.RandomState(5), INTR,
                              height=H, width=W)]
    _, dep, lab = render_scene_batch(stack_scene_params(ps), H, W, *IARGS)
    lab0 = np.asarray(lab[0])
    img = jnp.asarray(np.random.RandomState(0).rand(H, W, 3), jnp.float32)
    xyz = jnp.stack([jnp.asarray(dep[0])] * 3, axis=-1)
    img_c, xyz_c, lab_c = _syn_crop_device(
        _jax.random.PRNGKey(3), img, xyz, jnp.asarray(lab[0]), 48, 12)
    lab_c = np.asarray(lab_c)
    assert set(np.unique(lab_c)) <= set(np.unique(lab0))
    assert len([v for v in np.unique(lab_c) if v > 0]) >= 1
    # nearest xyz: every crop value exists in the source
    assert np.isin(np.asarray(xyz_c)[..., 2].ravel(),
                   np.asarray(dep[0]).ravel()).all()
