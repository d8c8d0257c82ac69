"""Data-layer tests: synthetic TOD-format fixture tree on tmpfs, PCD reader,
augmentations, fixed-shape batching."""

import os
import struct

import numpy as np
import cv2
import pytest

from unseenobjectswithmeanshift_tpu.data.datasets import (
    TableTopObject, OSDObject, remap_labels, fov_intrinsics,
)
from unseenobjectswithmeanshift_tpu.data.loader import (
    BatchLoader, label_image_to_instances, pad_hw,
)
from unseenobjectswithmeanshift_tpu.data.pcd import read_pcd_xyz
from unseenobjectswithmeanshift_tpu.data import augmentation as aug


@pytest.fixture
def tod_tree(tmp_path):
    """Two scenes x 7 views of 64x64 synthetic data in TOD layout."""
    rng = np.random.RandomState(0)
    root = tmp_path / "tod"
    for s in range(2):
        d = root / "training_set" / f"scene_{s:05d}"
        d.mkdir(parents=True)
        for v in range(7):
            rgb = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(d / f"rgb_{v:05d}.jpeg"), rgb)
            depth = (rng.rand(64, 64) * 2000).astype(np.uint16)
            cv2.imwrite(str(d / f"depth_{v:05d}.png"), depth)
            seg = np.zeros((64, 64), np.uint8)
            seg[5:20, 5:20] = 2
            seg[30:50, 30:50] = 3
            seg[0:3, :] = 1          # table
            cv2.imwrite(str(d / f"segmentation_{v:05d}.png"), seg)
    return str(root)


def test_tabletop_dataset(tod_tree):
    ds = TableTopObject(tod_tree, "train", use_augmentation=False,
                        chromatic=False, add_noise=False, seed=0)
    assert len(ds) == 14
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["xyz"].shape == (64, 64, 3)
    # table (1) became background; objects remapped to 1..K-1
    assert set(np.unique(s["label"])) == {0, 1, 2}


def test_tabletop_syn_crop(tod_tree):
    ds = TableTopObject(tod_tree, "train", use_augmentation=False, syn_crop=True,
                        crop_size=32, chromatic=False, add_noise=False, seed=0)
    assert ds.views_per_scene == 5
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["label"].shape == (32, 32)


def test_tabletop_sampling(tod_tree):
    ds = TableTopObject(tod_tree, "train", use_augmentation=False, sampling=True,
                        sampling_num=10, chromatic=False, add_noise=False, seed=0)
    lab = ds[0]["label"]
    # each cluster has at most 10 sampled pixels, the rest are -1
    for v in range(1, lab.max() + 1):
        assert (lab == v).sum() <= 10
    assert (lab == -1).sum() > 0


def test_label_image_to_instances():
    lab = np.zeros((16, 16), np.int32)
    lab[2:6, 2:6] = 1
    lab[8:12, 8:12] = 3
    masks, labels, valid, renum = label_image_to_instances(lab, max_gt=4)
    assert valid.tolist() == [True, True, False, False]
    assert masks[0].sum() == 16 and masks[1].sum() == 16
    assert labels.tolist() == [1, 1, 1, 1]
    # renumbered label image: contiguous cluster ids in slot order
    assert (renum[2:6, 2:6] == 1).all() and (renum[8:12, 8:12] == 2).all()
    assert set(np.unique(renum).tolist()) == {0, 1, 2}


def test_batch_loader(tod_tree):
    ds = TableTopObject(tod_tree, "train", use_augmentation=False,
                        chromatic=False, add_noise=False, seed=0)
    loader = BatchLoader(ds, batch_size=2, max_gt=4)
    batch = next(iter(loader))
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["gt_masks"].shape == (2, 4, 64, 64)
    assert batch["gt_valid"][:, :2].all()
    assert batch["xyz"].shape == (2, 64, 64, 3)


def _write_pcd(path, xyz, kind):
    n = xyz.shape[0]
    header = (f"VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
              f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA {kind}\n")
    with open(path, "wb") as f:
        f.write(header.encode())
        if kind == "ascii":
            for p in xyz:
                f.write((" ".join("%.6f" % v for v in p) + "\n").encode())
        else:
            f.write(xyz.astype("<f4").tobytes())


def test_pcd_reader_ascii_binary(tmp_path, rng):
    xyz = rng.rand(50, 3).astype(np.float32)
    xyz[3, 1] = np.nan
    for kind in ("ascii", "binary"):
        p = str(tmp_path / f"t_{kind}.pcd")
        _write_pcd(p, xyz, kind)
        out = read_pcd_xyz(p)
        ref = np.nan_to_num(xyz)
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_augmentations_run(rng):
    im = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    depth = rng.rand(32, 32).astype(np.float32)
    xyz = rng.rand(32, 32, 3).astype(np.float32)
    r = np.random.RandomState(0)
    assert aug.chromatic_transform(im, rng=r).shape == im.shape
    assert aug.add_noise(im, rng=r).dtype == np.uint8
    assert aug.add_noise_to_depth(depth, rng=r).shape == depth.shape
    d2 = aug.dropout_random_ellipses(depth, rng=r)
    assert (d2 == 0).sum() >= (depth == 0).sum()
    assert aug.add_noise_to_xyz(xyz, depth, rng=r).shape == xyz.shape


def test_fov_intrinsics_matches_reference_formula():
    p = fov_intrinsics(640, 480, 45.0, 0.01)
    # reference: e = 1/tan(fov/2); t = near/e; r = t*ar; alpha = W/(r-l) = W/(2r)
    e = 1 / np.tan(np.radians(22.5))
    t = 0.01 / e
    r = t * (640 / 480)
    alpha = 640 / (2 * r)
    assert abs(p["fx"] - 0.01 * alpha) < 1e-9
    assert p["x_offset"] == 320.0


def test_pad_hw():
    a = np.ones((30, 33, 3))
    assert pad_hw(a, 32).shape == (32, 64, 3)


def test_dataset_statistics_cli_with_view(tod_tree, tmp_path, capsys):
    """dataset_statistics prints the instance histogram and --view writes
    triptych sample visualizations (the view_tabletop_data equivalent)."""
    from unseenobjectswithmeanshift_tpu.cli.dataset_statistics import main

    out = tmp_path / "views"
    main(["--dataset", "tabletop_object", "--root", tod_tree, "--split", "train",
          "--limit", "4", "--view", "2", "--view-out", str(out)])
    text = capsys.readouterr().out
    assert "mean:" in text and "2 instances" in text
    pngs = sorted(out.glob("sample_*.png"))
    assert len(pngs) == 2
    img = cv2.imread(str(pngs[0]))
    assert img.shape == (64, 64 * 3, 3)   # RGB | depth | overlay triptych
