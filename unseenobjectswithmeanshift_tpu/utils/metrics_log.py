"""Append-only JSONL training/eval metrics log.

The reference tracks per-epoch eval metrics by hand and plots them with
hardcoded arrays (ref: tools/plot_epochs.py); here every trainer appends
machine-readable records to `<output>/metrics.jsonl` and `cli/plot_epochs.py`
renders the same figure from any number of runs.

Record shapes (one JSON object per line):
  {"kind": "train", "iter": N, "total_loss": ..., "loss_ce": ..., ...}
  {"kind": "eval",  "iter": N, "Objects F-measure": ..., ...}
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List


class MetricsLogger:
    """Appends train/eval metric records to <output_dir>/metrics.jsonl."""

    def __init__(self, output_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, filename)

    def _append(self, record: Dict):
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def log_train(self, iteration: int, metrics: Dict):
        self._append({"kind": "train", "iter": int(iteration),
                      **{k: float(v) for k, v in metrics.items()}})

    def log_eval(self, iteration: int, metrics: Dict):
        self._append({"kind": "eval", "iter": int(iteration),
                      **{k: float(v) for k, v in metrics.items()}})


def read_metrics(path: str, kind: str | None = None) -> List[Dict]:
    """Read a metrics.jsonl file; optionally filter by record kind."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if kind is None or rec.get("kind") == kind:
                out.append(rec)
    return out


def series(records: Iterable[Dict], key: str):
    """(iters, values) for one metric key across records that carry it."""
    xs, ys = [], []
    for r in records:
        if key in r:
            xs.append(r["iter"])
            ys.append(r[key])
    return xs, ys
