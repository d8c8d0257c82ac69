"""Streaming (ROS-style) segmentation service.

Equivalent of ros/test_images_segmentation_transformer.py: a background worker
holds the latest RGB-D frame under a lock, runs the fused two-stage predictor on
it, and publishes (label, refined label, scores, bboxes) to subscribers. The ROS
transport is replaced by plain callables so the service runs anywhere; wiring it
to rospy topics is a thin adapter (subscribe -> feed_frame, publish <- callbacks).
"""

from __future__ import annotations

import threading
import time
from typing import Callable, List, Optional

import numpy as np

from ..utils.preprocess import compute_xyz, normalize_image_ucn, pad_to_multiple


class SegmentationService:
    """Latest-frame-wins streaming segmentation (the reference keeps only the
    newest frame under a lock, ros/...transformer.py:140-155)."""

    def __init__(self, predictor, variables, variables_crop, camera_params,
                 use_depth: bool = True):
        self.predictor = predictor
        self.variables = variables
        self.variables_crop = variables_crop
        self.camera_params = camera_params
        self.use_depth = use_depth
        self._lock = threading.Lock()
        self._frame = None
        self._stop = threading.Event()
        self._subscribers: List[Callable] = []
        self._thread: Optional[threading.Thread] = None

    def subscribe(self, fn: Callable):
        """fn(result_dict) is called after every processed frame."""
        self._subscribers.append(fn)

    def feed_frame(self, bgr_u8: np.ndarray, depth_m: Optional[np.ndarray] = None,
                   frame_id=None):
        """Called by the transport (e.g. a ROS image callback)."""
        with self._lock:
            self._frame = (bgr_u8, depth_m, frame_id)

    def _grab(self):
        with self._lock:
            f = self._frame
            self._frame = None
        return f

    def process_frame(self, bgr_u8, depth_m=None, frame_id=None):
        """Run one frame synchronously; returns the published dict."""
        import jax.numpy as jnp

        image = normalize_image_ucn(bgr_u8)
        img, (h, w) = pad_to_multiple(image[None], 32)
        xyz = None
        if self.use_depth and depth_m is not None:
            p = self.camera_params
            xyz_img = compute_xyz(depth_m.astype(np.float32), p["fx"], p["fy"],
                                  p["x_offset"], p["y_offset"])
            xyz, _ = pad_to_multiple(xyz_img[None], 32)
            xyz = jnp.asarray(xyz)
        labels, refined = self.predictor(self.variables, self.variables_crop,
                                         jnp.asarray(img), xyz)
        result = {
            "label": np.asarray(labels[0, :h, :w]),
            "label_refined": np.asarray(refined[0, :h, :w]),
            "frame_id": frame_id,
        }
        for fn in self._subscribers:
            fn(result)
        return result

    def _loop(self):
        while not self._stop.is_set():
            f = self._grab()
            if f is None:
                time.sleep(0.002)
                continue
            self.process_frame(*f)

    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
