"""End-to-end integration test of the documented reproduction path:
cli/test_net.main over a synthetic TOD test split - batched pipelined stream,
metric block, .mat dumps (ref: README.md:128-133 / tools/test_net.py)."""

import glob
import os

import cv2
import numpy as np
import pytest


@pytest.fixture
def tod_test_tree(tmp_path):
    """One scene x 7 views of 64x64 synthetic data in the TOD test_set layout."""
    rng = np.random.RandomState(0)
    root = tmp_path / "tod"
    d = root / "test_set" / "scene_00000"
    d.mkdir(parents=True)
    for v in range(7):
        cv2.imwrite(str(d / f"rgb_{v:05d}.jpeg"),
                    (rng.rand(64, 64, 3) * 255).astype(np.uint8))
        cv2.imwrite(str(d / f"depth_{v:05d}.png"),
                    (rng.rand(64, 64) * 2000).astype(np.uint16))
        seg = np.zeros((64, 64), np.uint8)
        seg[8:24, 8:24] = 2
        seg[34:52, 30:50] = 3
        cv2.imwrite(str(d / f"segmentation_{v:05d}.png"), seg)
    return str(root)


def _shrink(cfg):
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
    return cfg


def test_test_net_cli_end_to_end(tod_test_tree, tmp_path, monkeypatch, capsys):
    """The full eval CLI: dataset -> batched stream -> canonical metric block
    -> per-image .mat dumps, on random weights (shrunk configs via the
    factory's config hook; the real flagship shapes are bench/TPU territory)."""
    from unseenobjectswithmeanshift_tpu.cli import test_net
    from unseenobjectswithmeanshift_tpu.config import get_config
    from unseenobjectswithmeanshift_tpu.pipeline import factory

    monkeypatch.setattr(factory, "get_config",
                        lambda name: _shrink(get_config(name)))

    mat_dir = tmp_path / "mats"
    test_net.main(["--dataset", "tabletop_object", "--root", tod_test_tree,
                   "--limit", "4", "--batch", "2",
                   "--save-mat", str(mat_dir)])
    out = capsys.readouterr().out
    assert "4 images" in out
    # the canonical metric block prints both pre- and post-refinement
    assert out.count("Objects F-measure") >= 2
    assert out.count("Boundary F-measure") >= 2
    mats = sorted(glob.glob(os.path.join(str(mat_dir), "*.mat")))
    assert len(mats) == 4
    from scipy.io import loadmat
    m = loadmat(mats[0])
    assert "labels" in m and "labels_refined" in m


def test_demo_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """cli/demo.main over a synthetic image folder: glob color/depth pairs,
    run both stages, write -label.png outputs (ref: tools/
    test_image_with_ms_transformer.py folder mode)."""
    from unseenobjectswithmeanshift_tpu.cli import demo
    from unseenobjectswithmeanshift_tpu.config import get_config
    from unseenobjectswithmeanshift_tpu.pipeline import factory

    rng = np.random.RandomState(0)
    imgdir = tmp_path / "frames"
    imgdir.mkdir()
    for i in range(2):
        cv2.imwrite(str(imgdir / f"{i:06d}-color.png"),
                    (rng.rand(64, 64, 3) * 255).astype(np.uint8))
        cv2.imwrite(str(imgdir / f"{i:06d}-depth.png"),
                    (rng.rand(64, 64) * 2000).astype(np.uint16))

    monkeypatch.setattr(factory, "get_config",
                        lambda name: _shrink(get_config(name)))
    out_dir = tmp_path / "out"
    demo.main(["--imgdir", str(imgdir), "--height", "64", "--width", "64",
               "--out", str(out_dir)])
    text = capsys.readouterr().out
    assert "done" in text
    labels = sorted(glob.glob(os.path.join(str(out_dir), "*-label.png")))
    assert len(labels) == 2
    lab = cv2.imread(labels[0], cv2.IMREAD_UNCHANGED)
    assert lab.shape[:2] == (64, 64)


def test_train_msmformer_cli_with_resume(tod_test_tree, tmp_path, monkeypatch,
                                         capsys):
    """train_msmformer.main end-to-end at --image-size 64x64: 2 iterations,
    metrics.jsonl records, an orbax snapshot, then --resume continues from
    the saved iteration (detectron2 resume_or_load semantics)."""
    import json

    from unseenobjectswithmeanshift_tpu import config as config_mod
    from unseenobjectswithmeanshift_tpu.cli import train_msmformer

    real_get = config_mod.get_config

    def small(name):
        cfg = _shrink(real_get(name))
        cfg.loss.train_num_points = 64
        cfg.loss.max_gt_instances = 3
        return cfg

    monkeypatch.setattr(config_mod, "get_config", small)

    # the tod_test_tree fixture only has a test_set; trainers read "train"
    (tmp_path / "tod" / "training_set").symlink_to(
        tmp_path / "tod" / "test_set")

    out = tmp_path / "run"
    # single-device mesh: the full 8-device DP compile is tested in
    # test_trainer; here the subject is the CLI wiring (resume, metrics log)
    args = ["--root", tod_test_tree, "--batch", "2", "--log-period", "1",
            "--checkpoint-period", "2", "--image-size", "64", "64",
            "--devices", "1", "--output", str(out)]
    train_msmformer.main(args + ["--iters", "2"])
    text = capsys.readouterr().out
    assert "iter 2/2" in text
    assert (out / "checkpoint_0000002").exists()
    recs = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert any(r["kind"] == "train" and "total_loss" in r for r in recs)

    train_msmformer.main(args + ["--iters", "4", "--resume"])
    text = capsys.readouterr().out
    assert "resumed from" in text and "iteration 2" in text
    assert "iter 4/4" in text
    assert (out / "checkpoint_0000004").exists()


def test_train_net_cli_end_to_end(tod_test_tree, tmp_path, monkeypatch,
                                  capsys):
    """train_net.main (UCN embedding training): one epoch over the synthetic
    TOD tree, per-epoch orbax snapshot with the reference's structured name,
    metrics.jsonl records, then --pretrained/--start-epoch continues."""
    import json

    from unseenobjectswithmeanshift_tpu import config as config_mod
    from unseenobjectswithmeanshift_tpu.cli import train_net

    real_get = config_mod.get_config

    def small(name):
        cfg = real_get(name)
        cfg.backbone.num_units = 16
        cfg.loss.max_gt_instances = 3
        return cfg

    monkeypatch.setattr(config_mod, "get_config", small)
    if not (tmp_path / "tod" / "training_set").exists():
        (tmp_path / "tod" / "training_set").symlink_to(
            tmp_path / "tod" / "test_set")

    out = tmp_path / "ucn_run"
    args = ["--root", tod_test_tree, "--batch", "2", "--log-period", "1",
            "--devices", "1", "--output", str(out)]
    train_net.main(args + ["--epochs", "1"])
    text = capsys.readouterr().out
    assert "epoch 1/1" in text
    ckpt = out / "seg_resnet34_8s_embedding_cosine_rgbd_add_epoch_1.checkpoint"
    assert ckpt.exists()
    recs = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert any(r["kind"] == "train" and "loss_intra" in r for r in recs)

    train_net.main(args + ["--epochs", "2", "--pretrained", str(ckpt),
                           "--start-epoch", "1"])
    text = capsys.readouterr().out
    assert "continuing from" in text
    assert "epoch 2/2" in text
