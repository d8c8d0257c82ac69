"""Fixed-shape batching for TPU training.

Converts label images into padded per-instance mask stacks (the detectron2
Instances + UnseenInstanceDatasetMapper role, ref:
MSMFormer/meanshiftformer/data/dataset_mappers/unseen_instance_dataset_mapper.py)
and assembles static [B, ...] numpy batches. Samples without instances are kept
with an all-invalid mask (the reference drops them in run_step,
tabletop_train_net_pretrained.py:222-229; with the validity-masked criterion
they simply contribute nothing).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def label_image_to_instances(label, max_gt: int):
    """[H, W] int32 label image (0 = background) -> (masks [G, H, W] float32,
    labels [G] int32 (=1, 'object'), valid [G] bool, contiguous, renumbered
    [H, W] label image with instance i in slot i+1 - the contiguous-cluster form
    the embedding loss consumes; background stays 0)."""
    H, W = label.shape
    masks = np.zeros((max_gt, H, W), np.float32)
    valid = np.zeros(max_gt, bool)
    renumbered = np.zeros((H, W), np.int32)
    ids = np.unique(label)
    ids = ids[ids > 0][:max_gt]
    for i, v in enumerate(ids):
        m = label == v
        masks[i] = m
        valid[i] = True
        renumbered[m] = i + 1
    labels = np.ones(max_gt, np.int32)
    return masks, labels, valid, renumbered


def pad_hw(arr, divisor=32):
    """Pad [H, W, ...] bottom/right to a multiple of divisor."""
    h, w = arr.shape[:2]
    ph, pw = (-h) % divisor, (-w) % divisor
    if ph == 0 and pw == 0:
        return arr
    pad = [(0, ph), (0, pw)] + [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, pad)


class BatchLoader:
    """Shuffling batch iterator producing fixed-shape training batches.

    prefetch > 0 (default 2) runs dataset reads + augmentation + collate on a
    background thread with a bounded queue, so host-side input work overlaps
    the device step (the role of the reference's multi-worker detectron2
    loader, ref: tabletop_train_net_pretrained.py:92-101
    build_detection_train_loader). prefetch=0 restores the synchronous path.
    """

    def __init__(self, dataset, batch_size: int, max_gt: int = 24,
                 size_divisibility: int = 32, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_gt = max_gt
        self.div = size_divisibility
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _produce(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        batch = []
        for idx in order:
            batch.append(self.dataset[int(idx)])
            if len(batch) == self.batch_size:
                yield self.collate(batch)
                batch = []
        if batch and not self.drop_last:
            yield self.collate(batch)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch <= 0:
            yield from self._produce()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _END = object()
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in self._produce():
                    if not put(item):
                        return   # consumer abandoned iteration
                put(_END)
            except BaseException as e:  # surface worker errors to the consumer
                put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            t.join()

    def collate(self, samples):
        imgs, xyzs, masks, labels, valids, gt_labels_img = [], [], [], [], [], []
        for s in samples:
            img = pad_hw(s["image"], self.div)
            lab = pad_hw(s["label"], self.div)
            imgs.append(img)
            if s.get("xyz") is not None:
                xyzs.append(pad_hw(s["xyz"], self.div))
            m, l, v, renum = label_image_to_instances(lab, self.max_gt)
            masks.append(m)
            labels.append(l)
            valids.append(v)
            gt_labels_img.append(renum)
        batch = {
            "image": np.stack(imgs),
            "gt_masks": np.stack(masks),
            "gt_labels": np.stack(labels),
            "gt_valid": np.stack(valids),
            "label_image": np.stack(gt_labels_img),
        }
        if xyzs:
            batch["xyz"] = np.stack(xyzs)
        return batch
