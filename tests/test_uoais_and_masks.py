"""UOAIS depth pipeline, RLE codec, NMS, visualization utils."""

import numpy as np
import pytest

from unseenobjectswithmeanshift_tpu.data.uoais import (
    normalize_depth, unnormalize_depth, inpaint_depth, rle_decode, rle_encode,
    ann_to_mask,
)
from unseenobjectswithmeanshift_tpu.utils.masks import (
    nms, combine_masks_np, combine_masks_with_nms,
)
from unseenobjectswithmeanshift_tpu.utils.visualize import (
    label_overlay, features_pca, unnormalize_image,
)


def test_normalize_depth_roundtrip(rng):
    d = (rng.rand(16, 16) * 2000).astype(np.float32)
    n = normalize_depth(d.copy())
    assert n.shape == (16, 16, 3) and n.dtype == np.uint8
    back = unnormalize_depth(n)
    clipped = np.clip(d, 250, 1500)
    assert np.abs(back[..., 0] - clipped).max() < (1500 - 250) / 255 + 1e-3


def test_inpaint_fills_holes(rng):
    d = normalize_depth((rng.rand(32, 32) * 1000 + 300).astype(np.float32))
    d[10:14, 10:14] = 0
    out = inpaint_depth(d)
    assert (out[10:14, 10:14] > 0).all()


def test_rle_roundtrip(rng):
    mask = (rng.rand(13, 17) > 0.6).astype(np.uint8)
    rle = rle_encode(mask)
    back = rle_decode(rle)
    np.testing.assert_array_equal(back, mask)


def test_rle_string_decode_matches_uncompressed():
    # encode a simple mask with pycocotools-style string manually:
    # counts [3, 2, 4] -> LEB128-ish chars
    mask = np.zeros((3, 3), np.uint8)
    # column-major: runs of 3 zeros, 2 ones, 4 zeros
    flat = np.array([0, 0, 0, 1, 1, 0, 0, 0, 0], np.uint8)
    mask = flat.reshape(3, 3, order="F")
    rle = rle_encode(mask)
    assert rle["counts"] == [3, 2, 4]
    np.testing.assert_array_equal(rle_decode(rle), mask)


def test_polygon_ann_to_mask():
    ann = {"segmentation": [[2, 2, 10, 2, 10, 10, 2, 10]]}
    m = ann_to_mask(ann, 16, 16)
    assert m[5, 5] == 1 and m[0, 0] == 0


def test_nms_suppresses_duplicates(rng):
    m1 = np.zeros((16, 16), bool); m1[2:10, 2:10] = True
    m2 = m1.copy()                      # duplicate
    m3 = np.zeros((16, 16), bool); m3[12:16, 12:16] = True
    masks = np.stack([m1, m2, m3])
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms(masks, scores, 0.7)
    assert list(keep) == [0, 2]


def test_combine_masks_with_nms(rng):
    m1 = np.zeros((8, 8), bool); m1[:4] = True
    m2 = np.zeros((8, 8), bool); m2[4:] = True
    lab, score, bbox = combine_masks_with_nms(np.stack([m1, m2]),
                                              np.array([0.9, 0.5]))
    assert set(np.unique(lab)) == {2, 3}
    assert score.max() == 90
    assert bbox.shape == (2, 5)


def test_visualize_utils(rng):
    img = rng.rand(16, 16, 3).astype(np.float32) - 0.4
    rgb = unnormalize_image(img)
    assert rgb.dtype == np.uint8
    lab = np.zeros((16, 16), np.int32); lab[4:8, 4:8] = 1
    over = label_overlay(rgb, lab)
    assert over.shape == rgb.shape
    feats = rng.rand(16, 16, 8).astype(np.float32)
    pca = features_pca(feats)
    assert pca.shape == (16, 16, 3)


def test_ocid_uoais_dataset(tmp_path, rng):
    """OCID_UOAIS reader (ref: lib/datasets/load_OCID_UOAIS.py): COCO RGB
    normalization, table/floor suppression + remap, normalized+inpainted
    3-channel depth."""
    import os
    import cv2
    from unseenobjectswithmeanshift_tpu.data.datasets import get_dataset
    from unseenobjectswithmeanshift_tpu.data.uoais import normalize_depth, inpaint_depth
    from unseenobjectswithmeanshift_tpu.config import (
        COCO_PIXEL_MEAN_RGB, COCO_PIXEL_STD_RGB,
    )

    seq = tmp_path / "ARID20" / "table" / "seq01"
    for sub in ("rgb", "label", "depth"):
        (seq / sub).mkdir(parents=True)
    H, W = 480, 640
    im = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(seq / "rgb" / "0001.png"), im)
    label = np.zeros((H, W), np.uint8)
    label[:50] = 1            # table -> 0
    label[50:80] = 2          # floor in a 'table' sequence -> 0
    label[100:150, 100:150] = 4
    label[200:260, 200:280] = 7
    cv2.imwrite(str(seq / "label" / "0001.png"), label)
    depth = (rng.rand(H, W) * 1000 + 400).astype(np.uint16)
    depth[0:10, 0:10] = 0     # hole for inpainting
    cv2.imwrite(str(seq / "depth" / "0001.png"), depth)

    ds = get_dataset("ocid_object_uoais", str(tmp_path))
    assert len(ds) == 1
    s = ds[0]
    # COCO RGB normalization of the BGR->RGB image
    rgbf = cv2.cvtColor(im, cv2.COLOR_BGR2RGB).astype(np.float32)
    expect = (rgbf - np.asarray(COCO_PIXEL_MEAN_RGB, np.float32)) / np.asarray(
        COCO_PIXEL_STD_RGB, np.float32)
    np.testing.assert_allclose(s["image"], expect, atol=1e-5)
    # labels: 1 and 2 suppressed, remaining remapped contiguously
    assert set(np.unique(s["label"]).tolist()) == {0, 1, 2}
    assert (s["label"][:80] == 0).all()
    assert (s["label"][100:150, 100:150] == 1).all()
    # depth: normalize -> inpaint -> /255, 3 channels, holes filled
    d3 = inpaint_depth(normalize_depth(depth.astype(np.float32))) / 255.0
    np.testing.assert_allclose(s["xyz"], d3, atol=1e-6)
    assert s["xyz"].shape == (H, W, 3)
    assert s["xyz"][5, 5].max() > 0  # hole filled
