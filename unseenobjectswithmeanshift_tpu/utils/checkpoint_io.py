"""Orbax-based checkpoint save/restore for training state.

Replaces the reference's torch.save snapshots (tools/train_net.py:154-160) and
detectron2 DetectionCheckpointer.resume_or_load
(tabletop_train_net_pretrained.py:308-319).
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def save(path: str, state):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def restore(path: str, abstract_state):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, abstract_state)


def latest_checkpoint(directory: str):
    """Find the newest checkpoint_<iter> subdirectory (resume support).
    Strictly checkpoint_ + digits: an interrupted orbax save leaves a
    `*.orbax-checkpoint-tmp` sibling that sorts after the real name and must
    never be selected."""
    import re

    if not os.path.isdir(directory):
        return None
    cands = sorted((d for d in os.listdir(directory)
                    if re.fullmatch(r"checkpoint_\d+", d)),
                   key=lambda d: int(d.split("_")[1]))  # not lexicographic:
    # digit widths may differ (externally created dirs, >7-digit iterations)
    return os.path.join(directory, cands[-1]) if cands else None
