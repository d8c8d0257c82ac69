"""Metrics JSONL log + plot_epochs CLI (the generic replacement for the
reference's hardcoded tools/plot_epochs.py)."""

import json
import os

import numpy as np

from unseenobjectswithmeanshift_tpu.utils.metrics_log import (
    MetricsLogger, read_metrics, series,
)


def _fake_run(tmp_path, name, seed):
    rng = np.random.RandomState(seed)
    log = MetricsLogger(str(tmp_path / name))
    for it in range(100, 1100, 100):
        log.log_train(it, {"total_loss": 30.0 * np.exp(-it / 400) + rng.rand(),
                           "loss_ce": rng.rand(), "loss_mask": rng.rand(),
                           "loss_dice": rng.rand()})
        if it % 200 == 0:
            log.log_eval(it, {"Objects F-measure": min(0.9, it / 1200),
                              "Boundary F-measure": min(0.8, it / 1500),
                              "obj_detected_075_percentage": min(0.85, it / 1300)})
    return log.path


def test_logger_roundtrip(tmp_path):
    path = _fake_run(tmp_path, "runA", 0)
    recs = read_metrics(path)
    assert len(recs) == 15
    train = read_metrics(path, kind="train")
    ev = read_metrics(path, kind="eval")
    assert len(train) == 10 and len(ev) == 5
    xs, ys = series(ev, "Objects F-measure")
    assert xs == [200, 400, 600, 800, 1000]
    assert all(0 <= y <= 1 for y in ys)
    # every line is valid standalone JSON (append-only contract)
    with open(path) as f:
        for line in f:
            json.loads(line)


def test_plot_epochs_renders(tmp_path):
    from unseenobjectswithmeanshift_tpu.cli.plot_epochs import main

    a = _fake_run(tmp_path, "rgbd", 0)
    b = _fake_run(tmp_path, "depth", 1)
    out = str(tmp_path / "curves.png")
    main([a, b, "--labels", "RGBD", "DEPTH", "--out", out])
    assert os.path.exists(out) and os.path.getsize(out) > 10_000


def test_plot_epochs_train_only(tmp_path):
    """A run with no eval records still plots (loss panel only)."""
    from unseenobjectswithmeanshift_tpu.cli.plot_epochs import main

    log = MetricsLogger(str(tmp_path / "run"))
    for it in (10, 20, 30):
        log.log_train(it, {"loss": 1.0 / it})
    out = str(tmp_path / "loss.png")
    main([log.path, "--out", out])
    assert os.path.exists(out)


def test_plot_bars_renders(tmp_path):
    from unseenobjectswithmeanshift_tpu.cli.plot_epochs import main

    a = _fake_run(tmp_path, "rgbd", 0)
    b = _fake_run(tmp_path, "depth", 1)
    out = str(tmp_path / "bars.png")
    main([a, b, "--labels", "RGBD", "DEPTH", "--bars", "--out", out])
    assert os.path.exists(out) and os.path.getsize(out) > 10_000
