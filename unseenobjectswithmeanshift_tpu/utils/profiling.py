"""Tracing & step timing (aux subsystem; the reference has only wall-clock
AverageMeter prints, lib/fcn/test_dataset.py:22-41 - here we add jax.profiler
traces and proper device-time measurement for the tunneled TPU platform).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


class AverageMeter:
    """(ref: lib/fcn/test_dataset.py:22-41)"""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count

    def __repr__(self):
        return "{:.3f} ({:.3f})".format(self.val, self.avg)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace"):
    """jax.profiler trace scope (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_time(fn, *args, iters: int = 10, warmup: int = 1):
    """Measure device wall time of fn by forcing a tiny host readback per call.

    On the tunneled axon platform block_until_ready does not reliably block and
    full-output downloads measure tunnel bandwidth instead of compute; reducing
    to a scalar inside jit and fetching it is the dependable pattern.
    """
    import jax
    import jax.numpy as jnp

    reduced = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y,
        jax.tree.map(lambda t: jnp.sum(t.astype(jnp.float32)), fn(*a))))
    for _ in range(warmup):
        np.asarray(reduced(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = reduced(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


class StepTimer:
    """Per-iteration timing with rolling averages for training loops."""

    def __init__(self):
        self.data = AverageMeter()
        self.step = AverageMeter()
        self._t = None

    def tic_data(self):
        self._t = time.perf_counter()

    def toc_data(self):
        self.data.update(time.perf_counter() - self._t)
        self._t = time.perf_counter()

    def toc_step(self):
        self.step.update(time.perf_counter() - self._t)

    def __repr__(self):
        return f"data {self.data} step {self.step}"
