"""Streaming service, orbax checkpoint round-trip, meanshift-seed decoder,
filter_labels_bbox, TTA."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unseenobjectswithmeanshift_tpu.models.decoder import MeanShiftDecoder
from unseenobjectswithmeanshift_tpu.pipeline.postprocess import filter_labels_bbox
from unseenobjectswithmeanshift_tpu.pipeline.tta import tta_flip_semantic
from unseenobjectswithmeanshift_tpu.utils import checkpoint_io


def test_meanshift_seed_decoder(rng):
    dec = MeanShiftDecoder(num_classes=2, hidden_dim=16, num_queries=4, nheads=2,
                           dim_feedforward=16, dec_layers=1, mask_dim=16,
                           in_channels=8, use_meanshift_seeds=True)
    x = jnp.asarray(rng.randn(1, 6, 6, 8).astype(np.float32))
    mf = jnp.asarray(rng.randn(1, 6, 6, 16).astype(np.float32))
    v = dec.init(jax.random.PRNGKey(0), [x], mf)
    out = dec.apply(v, [x], mf)
    assert out["pred_logits"].shape == (1, 4, 3)


def test_filter_labels_bbox():
    lab = np.zeros((20, 20), np.int32)
    lab[2:8, 2:8] = 2
    lab[12:18, 12:18] = 3
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 0, 0]], jnp.int32)
    out = np.asarray(filter_labels_bbox(jnp.asarray(lab), boxes, jnp.int32(1), 5))
    assert (out[2:8, 2:8] == 0).all()
    assert (out[12:18, 12:18] == 3).all()


def test_tta_flip_semantic(rng):
    Q, K, H, W = 4, 2, 8, 8

    def apply_fn(variables, image, xyz=None):
        # symmetric fake model: logits fixed, masks = image mean map
        B = image.shape[0]
        m = jnp.broadcast_to(image.mean(-1)[:, None], (B, Q, H, W))
        logits = jnp.broadcast_to(jnp.asarray([2.0, 1.0, 0.0]), (B, Q, K + 1))
        return {"pred_logits": logits, "pred_masks": m}

    img = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    sem = tta_flip_semantic(apply_fn, None, img)
    assert sem.shape == (1, K, H, W)
    assert np.isfinite(np.asarray(sem)).all()


def test_orbax_roundtrip(tmp_path, rng):
    state = {"params": {"w": jnp.asarray(rng.rand(4, 4).astype(np.float32))},
             "step": jnp.asarray(7)}
    path = str(tmp_path / "ckpt")
    checkpoint_io.save(path, state)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    restored = checkpoint_io.restore(path, abstract)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 7
    assert checkpoint_io.latest_checkpoint(str(tmp_path)) is None  # different prefix


def test_streaming_service_sync(rng):
    """SegmentationService.process_frame with a stub predictor."""
    from unseenobjectswithmeanshift_tpu.pipeline.streaming import SegmentationService

    def fake_predictor(v1, v2, img, xyz=None):
        B, H, W = img.shape[0], img.shape[1], img.shape[2]
        lab = jnp.zeros((B, H, W), jnp.int32)
        return lab, lab

    svc = SegmentationService(fake_predictor, None, None,
                              {"fx": 600.0, "fy": 600.0, "x_offset": 16.0,
                               "y_offset": 16.0})
    got = []
    svc.subscribe(got.append)
    bgr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    depth = rng.rand(32, 32).astype(np.float32)
    result = svc.process_frame(bgr, depth, frame_id="f0")
    assert result["label"].shape == (32, 32)
    assert got and got[0]["frame_id"] == "f0"


def test_latest_checkpoint_ordering(tmp_path):
    """resume picks the NEWEST checkpoint_* (zero-padded names sort
    lexicographically) and its iteration parses from the suffix."""
    import os

    for it in (100, 2000, 350):
        os.makedirs(tmp_path / f"checkpoint_{it:07d}")
    latest = checkpoint_io.latest_checkpoint(str(tmp_path))
    assert latest.endswith("checkpoint_0002000")
    assert int(os.path.basename(latest).split("_")[-1]) == 2000
