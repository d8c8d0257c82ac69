import numpy as np
import jax
import jax.numpy as jnp

from unseenobjectswithmeanshift_tpu.utils.coco_eval import (
    InstanceSegEvaluator, mask_iou_matrix,
)
from unseenobjectswithmeanshift_tpu.models.decoder import StandardTransformerDecoder


def test_mask_iou():
    a = np.zeros((1, 8, 8), bool); a[0, :4] = True
    b = np.zeros((2, 8, 8), bool); b[0, :4] = True; b[1, 2:6] = True
    iou = mask_iou_matrix(a, b)
    assert iou[0, 0] == 1.0
    assert abs(iou[0, 1] - (16 / 48)) < 1e-9


def test_perfect_detections_ap_one():
    ev = InstanceSegEvaluator()
    gts = np.zeros((2, 16, 16), bool)
    gts[0, :8, :8] = True
    gts[1, 8:, 8:] = True
    ev.add_image(gts.copy(), np.array([0.9, 0.8]), gts)
    s = ev.summarize()
    assert abs(s["AP"] - 1.0) < 1e-6
    assert abs(s["AP50"] - 1.0) < 1e-6


def test_false_positive_lowers_ap():
    ev = InstanceSegEvaluator()
    gt = np.zeros((1, 16, 16), bool); gt[0, :8, :8] = True
    fp = np.zeros((16, 16), bool); fp[12:, :4] = True
    ev.add_image(np.stack([gt[0], fp]), np.array([0.6, 0.9]), gt)  # FP scores higher
    s = ev.summarize()
    assert s["AP50"] < 1.0


def test_standard_transformer_decoder_shapes(rng):
    dec = StandardTransformerDecoder(num_classes=2, hidden_dim=32, num_queries=5,
                                     nheads=4, dim_feedforward=32, dec_layers=2,
                                     mask_dim=16, in_channels=16)
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    mf = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    v = dec.init(jax.random.PRNGKey(0), [x], mf)
    out = dec.apply(v, [x], mf)
    assert out["pred_logits"].shape == (1, 5, 3)
    assert out["pred_masks"].shape == (1, 5, 8, 8)
    assert len(out["aux_outputs"]) == 1
