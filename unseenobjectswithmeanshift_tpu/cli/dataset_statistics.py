"""Dataset statistics: per-image instance counts for any registered dataset.

Mirrors tools/dataset_statistics.py (ref: :20-42): iterate the dataset's ground
truth labels, count foreground instances (table/background masked out by the
dataset's own process_label), and print min/max/mean plus a histogram - used to
pick max_instances / DETECTIONS_PER_IMAGE caps.

Usage:
  python -m unseenobjectswithmeanshift_tpu.cli.dataset_statistics \
      --dataset osd_object --root /path/to/OSD [--split test] [--limit N]
"""

from __future__ import annotations

import argparse
from collections import Counter

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True,
                   help="registry name, e.g. osd_object / ocid_object / tabletop")
    p.add_argument("--root", required=True)
    p.add_argument("--split", default=None,
                   help="image_set for datasets that take one (tabletop)")
    p.add_argument("--limit", type=int, default=0, help="0 = whole dataset")
    args = p.parse_args(argv)

    from ..data.datasets import get_dataset

    # only TableTopObject-style datasets take an image_set; OCID/OSD/UOAIS
    # readers enumerate their single split from disk
    kwargs = {"image_set": args.split} if args.split else {}
    dataset = get_dataset(args.dataset, args.root, **kwargs)
    n = len(dataset)
    if args.limit:
        n = min(n, args.limit)

    counts = []
    for i in range(n):
        label = np.asarray(dataset[i]["label"])
        vals = np.unique(label)
        c = len([v for v in vals if v > 0])
        counts.append(c)
        if i % 200 == 0:
            print(f"{i}/{n} ...", flush=True)

    counts = np.array(counts)
    print(f"images: {len(counts)}")
    print(f"min: {counts.min()}")
    print(f"max: {counts.max()}")
    print(f"mean: {counts.mean():.3f}")
    hist = Counter(counts.tolist())
    for k in sorted(hist):
        print(f"  {k:3d} instances: {hist[k]:5d} images "
              f"({hist[k] / len(counts):.1%})")


if __name__ == "__main__":
    main()
