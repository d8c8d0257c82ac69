"""Native C++ runtime vs the numpy implementations."""

import numpy as np
import pytest

from unseenobjectswithmeanshift_tpu import native
from unseenobjectswithmeanshift_tpu.utils import evaluation as ev
from unseenobjectswithmeanshift_tpu.utils.preprocess import (
    compute_xyz, normalize_image_ucn,
)
from unseenobjectswithmeanshift_tpu.config import UCN_PIXEL_MEANS_BGR


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native build unavailable")
    return l


def test_native_builds(lib):
    assert lib is not None


def test_preprocess_matches_numpy(lib, rng):
    bgr = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
    depth = (rng.rand(24, 32) * 3000).astype(np.uint16)
    img, xyz = native.preprocess_rgbd(bgr, depth, 600.0, 610.0, 16.0, 12.0,
                                      UCN_PIXEL_MEANS_BGR)
    np.testing.assert_allclose(img, normalize_image_ucn(bgr), atol=1e-6)
    ref = compute_xyz((depth / 1000.0).astype(np.float32), 600.0, 610.0, 16.0, 12.0)
    np.testing.assert_allclose(xyz, ref, atol=1e-5)


def test_seg2bmap_matches_numpy(lib, rng):
    for _ in range(5):
        seg = (rng.rand(20, 27) > 0.6)
        np.testing.assert_array_equal(native.seg2bmap(seg), ev.seg2bmap(seg))


def test_boundary_overlap_matches_numpy(lib, rng):
    a = np.zeros((48, 64), bool); a[10:30, 12:40] = True
    b = np.zeros((48, 64), bool); b[12:32, 10:38] = True
    assert native.boundary_overlap(a, b) == ev.boundary_overlap(a, b)


def test_pairwise_stats(lib, rng):
    gt = rng.randint(0, 4, (30, 30)).astype(np.int32)
    pred = rng.randint(0, 3, (30, 30)).astype(np.int32)
    gt_ids = np.array([1, 2, 3])
    pred_ids = np.array([1, 2])
    inter, gs, ps = native.pairwise_mask_stats(pred, gt, gt_ids, pred_ids)
    for i, g in enumerate(gt_ids):
        assert gs[i] == (gt == g).sum()
        for j, p in enumerate(pred_ids):
            assert inter[i, j] == np.logical_and(gt == g, pred == p).sum()
    for j, p in enumerate(pred_ids):
        assert ps[j] == (pred == p).sum()
