"""Fixed-shape post-processing validated against numpy/torch oracles that follow
the reference's sequential loops (test_utils.py combine_masks,
test_dataset.py filter_labels_depth / crop_rois / match_label_crop)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from unseenobjectswithmeanshift_tpu.pipeline.postprocess import (
    instance_inference, get_confident_instances, combine_masks,
    filter_labels_depth, mask_to_tight_box,
)
from unseenobjectswithmeanshift_tpu.pipeline.refine import crop_rois, match_label_crop


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def np_instance_inference(logits, masks, num_classes, topk):
    e = np.exp(logits - logits.max(-1, keepdims=True))
    scores = (e / e.sum(-1, keepdims=True))[:, :-1]   # [Q, K]
    flat = scores.reshape(-1)
    idx = np.argsort(-flat, kind="stable")[:topk]
    labels = idx % num_classes
    q = idx // num_classes
    m = masks[q]
    pred = m > 0
    probs = 1 / (1 + np.exp(-m))
    mask_scores = (probs * pred).sum((-1, -2)) / (pred.sum((-1, -2)) + 1e-6)
    return pred, flat[idx] * mask_scores, labels


def np_combine_masks(masks, valid):
    """The reference filters first, then labels contiguously from 2
    (test_utils.py combine_masks :93-112)."""
    h, w = masks.shape[-2:]
    out = np.zeros((h, w), np.int32)
    label = 2
    for t in range(masks.shape[0]):
        if valid[t]:
            out[masks[t]] = label
            label += 1
    return out


def np_filter_labels_depth(label, z, threshold):
    out = label.copy()
    for v in np.unique(label):
        if v == 0:
            continue
        mask = label == v
        frac = (z[mask] > 0).sum() / mask.sum()
        if frac < threshold:
            out[label == v] = 0
    return out


def test_instance_inference_matches_oracle(rng):
    Q, K, H, W = 12, 2, 24, 24
    logits = rng.randn(Q, K + 1).astype(np.float32)
    masks = rng.randn(Q, H, W).astype(np.float32) * 2
    inst = instance_inference(jnp.asarray(logits), jnp.asarray(masks), K, topk=5)
    pred, scores, labels = np_instance_inference(logits, masks, K, 5)
    np.testing.assert_array_equal(np.asarray(inst.masks), pred)
    np.testing.assert_allclose(np.asarray(inst.scores), scores, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(inst.classes), labels)


def test_confident_instances_topk_path(rng):
    Q, K = 8, 2
    logits = rng.randn(Q, K + 1).astype(np.float32)
    masks = rng.randn(Q, 8, 8).astype(np.float32)
    inst = instance_inference(jnp.asarray(logits), jnp.asarray(masks), K, topk=6)
    out = get_confident_instances(inst, topk=True, num_classes=K, low_threshold=0.2)
    v = np.asarray(out.valid)
    expect = (np.asarray(inst.classes) == 1) & (np.asarray(inst.scores) > 0.2)
    np.testing.assert_array_equal(v, expect)


def test_combine_masks_overwrite_order(rng):
    T, H, W = 4, 16, 16
    masks = rng.rand(T, H, W) > 0.6
    valid = np.array([True, True, False, True])
    inst_masks = jnp.asarray(masks)
    from unseenobjectswithmeanshift_tpu.pipeline.postprocess import Instances
    inst = Instances(masks=inst_masks, mask_logits=inst_masks.astype(jnp.float32),
                     scores=jnp.ones(T), classes=jnp.ones(T, jnp.int32),
                     valid=jnp.asarray(valid))
    out = np.asarray(combine_masks(inst))
    ref = np_combine_masks(masks, valid)
    np.testing.assert_array_equal(out, ref)


def test_filter_labels_depth_matches_oracle(rng):
    H, W = 32, 32
    label = np.zeros((H, W), np.int32)
    label[2:10, 2:10] = 2
    label[12:20, 12:20] = 3
    label[22:30, 2:10] = 5
    z = rng.rand(H, W).astype(np.float32)
    z[2:10, 2:10] = 0            # label 2 has no valid depth -> dropped
    z[12:16, 12:20] = 0          # label 3 has 50% -> kept at threshold 0.5
    out = np.asarray(filter_labels_depth(jnp.asarray(label), jnp.asarray(z), 0.5,
                                         max_label=8))
    ref = np_filter_labels_depth(label, z, 0.5)
    np.testing.assert_array_equal(out, ref)


def test_mask_to_tight_box():
    m = np.zeros((10, 12), bool)
    m[3:7, 4:9] = True
    x0, y0, x1, y1 = (int(v) for v in mask_to_tight_box(jnp.asarray(m)))
    assert (x0, y0, x1, y1) == (4, 3, 8, 6)


# ---------------------------------------------------------------------------
# crop_rois oracle (torch, mirrors test_dataset.py:62-112)
# ---------------------------------------------------------------------------

def torch_crop_rois(image_hwc, label_hw, xyz_hwc, crop_size=32, padding=0.25):
    H, W = label_hw.shape
    rgb = torch.from_numpy(image_hwc.transpose(2, 0, 1))[None].float()
    dep = torch.from_numpy(xyz_hwc.transpose(2, 0, 1))[None].float()
    lab = torch.from_numpy(label_hw)
    mask_ids = torch.unique(lab)
    mask_ids = mask_ids[mask_ids != 0]
    out = []
    for mid in mask_ids:
        mask = (lab == mid).float()
        nz = mask.nonzero()
        y0, x0 = nz[:, 0].min(), nz[:, 1].min()
        y1, x1 = nz[:, 0].max(), nz[:, 1].max()
        xp = int(torch.round((x1 - x0).float() * padding).item())
        yp = int(torch.round((y1 - y0).float() * padding).item())
        x0 = max(x0 - xp, 0); x1 = min(x1 + xp, W - 1)
        y0 = max(y0 - yp, 0); y1 = min(y1 + yp, H - 1)
        rgb_c = TF.interpolate(rgb[:, :, y0:y1 + 1, x0:x1 + 1], (crop_size, crop_size),
                               mode="bilinear", align_corners=True)[0]
        m_c = TF.interpolate(mask[None, None, y0:y1 + 1, x0:x1 + 1],
                             (crop_size, crop_size), mode="nearest")[0, 0]
        d_c = TF.interpolate(dep[:, :, y0:y1 + 1, x0:x1 + 1], (crop_size, crop_size),
                             mode="bilinear", align_corners=True)[0]
        out.append((int(mid), rgb_c.numpy(), m_c.numpy(), d_c.numpy(),
                    (int(x0), int(y0), int(x1), int(y1))))
    return out


def test_crop_rois_matches_torch_oracle(rng):
    H, W, T, S = 48, 64, 6, 32
    image = rng.rand(H, W, 3).astype(np.float32)
    xyz = rng.rand(H, W, 3).astype(np.float32)
    label = np.zeros((H, W), np.int32)
    label[4:20, 6:30] = 2
    label[25:40, 10:25] = 4   # slot 2 (value 4); slot 1 (value 3) absent
    label[10:35, 40:60] = 7

    crops = crop_rois(jnp.asarray(image), jnp.asarray(label), jnp.asarray(xyz),
                      max_instances=T, crop_size=S)
    ref = torch_crop_rois(image, label, xyz, crop_size=S)

    present = np.asarray(crops.present)
    expected_present = np.zeros(T, bool)
    for mid, *_ in ref:
        expected_present[mid - 2] = True
    np.testing.assert_array_equal(present, expected_present)

    for mid, rgb_c, m_c, d_c, roi in ref:
        t = mid - 2
        np.testing.assert_allclose(np.asarray(crops.rgb[t]).transpose(2, 0, 1),
                                   rgb_c, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(crops.mask[t]), m_c)
        np.testing.assert_allclose(np.asarray(crops.xyz[t]).transpose(2, 0, 1),
                                   d_c, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(crops.rois[t]), np.array(roi))


# ---------------------------------------------------------------------------
# match_label_crop oracle (torch, mirrors test_dataset.py:116-179)
# ---------------------------------------------------------------------------

def torch_match_label_crop(labels_crop, stage1_crop, rois, depth_z, present, hw):
    """labels_crop [T,S,S] int; stage1_crop [T,S,S] float; rois [T,4];
    depth_z [T,S,S]; present [T] bool."""
    T, S, _ = labels_crop.shape
    H, W = hw
    lc = torch.from_numpy(labels_crop.copy()).float()
    idxs = [i for i in range(T) if present[i]]
    # 1. overlap filter
    for i in idxs:
        for mid in torch.unique(lc[i]):
            mask = (lc[i] == mid).float()
            pct = (mask * torch.from_numpy(stage1_crop[i])).sum() / mask.sum()
            if pct < 0.5:
                lc[i][lc[i] == mid] = -1
    # 2. sort by avg depth (descending)
    keyed = []
    for i in idxs:
        if (lc[i] > -1).sum() > 0:
            roi_depth = torch.from_numpy(depth_z[i])[lc[i] > -1]
        else:
            roi_depth = torch.from_numpy(depth_z[i])
        sel = roi_depth[roi_depth > 0]
        avg = sel.mean().item() if len(sel) else float("inf")
        keyed.append((i, avg))
    keyed = sorted(keyed, key=lambda x: x[1], reverse=True)
    order = [k[0] for k in keyed]
    # 3. renumber + paste
    refined = torch.zeros(H, W)
    count = 0
    for i in order:
        mask_ids = torch.unique(lc[i])
        mask_ids = mask_ids[mask_ids != -1]
        lab = torch.zeros_like(lc[i])
        for mid in mask_ids:
            count += 1
            lab[lc[i] == mid] = count
        x0, y0, x1, y1 = (int(v) for v in rois[i])
        oh, ow = y1 - y0 + 1, x1 - x0 + 1
        resized = TF.interpolate(lab[None, None], (oh, ow), mode="nearest")[0, 0]
        hh, ww = resized.nonzero(as_tuple=True)
        refined[y0:y1 + 1, x0:x1 + 1][hh, ww] = resized[hh, ww]
    return refined.numpy().astype(np.int32)


def test_match_label_crop_matches_torch_oracle(rng):
    T, S, H, W = 4, 16, 40, 48
    present = np.array([True, True, False, True])
    labels_crop = np.zeros((T, S, S), np.int32)
    # crop 0: two segments, one well-overlapping, one not
    labels_crop[0, 2:12, 2:12] = 2
    labels_crop[0, 13:16, 13:16] = 3
    # crop 1: one segment
    labels_crop[1, 4:12, 4:12] = 2
    # crop 3: segment covering most of the crop
    labels_crop[3, 1:15, 1:15] = 5
    stage1 = np.zeros((T, S, S), np.float32)
    stage1[0, 2:12, 2:12] = 1     # overlaps labels_crop[0]==2 fully, ==3 not
    stage1[1, 4:12, 4:12] = 1
    stage1[3, 1:15, 1:15] = 1
    rois = np.array([[2, 2, 17, 17], [20, 20, 35, 35], [0, 0, 15, 15],
                     [10, 24, 25, 39]], np.int32)
    depth_z = rng.rand(T, S, S).astype(np.float32) + 0.1
    depth_z[1] += 5.0             # crop 1 is farthest -> pasted first

    out = np.asarray(match_label_crop(
        jnp.asarray(labels_crop), jnp.asarray(stage1), jnp.asarray(rois),
        jnp.asarray(depth_z), jnp.asarray(present), (H, W)))
    ref = torch_match_label_crop(labels_crop, stage1, rois, depth_z, present, (H, W))
    np.testing.assert_array_equal(out, ref)


def test_match_label_crop_overlapping_roi_priority(rng):
    """Two crops with overlapping paste regions: nearest (smallest depth) must win."""
    T, S, H, W = 2, 8, 20, 20
    present = np.array([True, True])
    labels_crop = np.zeros((T, S, S), np.int32)
    labels_crop[0, :, :] = 2
    labels_crop[1, :, :] = 2
    stage1 = np.ones((T, S, S), np.float32)
    rois = np.array([[2, 2, 9, 9], [5, 5, 12, 12]], np.int32)
    depth_z = np.stack([np.full((S, S), 2.0, np.float32),
                        np.full((S, S), 1.0, np.float32)])
    out = np.asarray(match_label_crop(
        jnp.asarray(labels_crop), jnp.asarray(stage1), jnp.asarray(rois),
        jnp.asarray(depth_z), jnp.asarray(present), (H, W)))
    ref = torch_match_label_crop(labels_crop, stage1, rois, depth_z, present, (H, W))
    np.testing.assert_array_equal(out, ref)
    # crop 1 (closer) wins the overlap region
    assert out[8, 8] == out[6, 6]


def test_instance_inference_from_embeds_matches(rng):
    """The light path (mask_embed + mask_features, masks built only for the
    selected top-k queries) must equal the full-masks path exactly."""
    Q, K, H, W, C, T = 12, 2, 16, 16, 8, 5
    logits = rng.randn(Q, K + 1).astype(np.float32)
    me = rng.randn(Q, C).astype(np.float32)
    mf = rng.randn(H, W, C).astype(np.float32)
    masks = np.einsum("qc,hwc->qhw", me, mf)
    full = instance_inference(jnp.asarray(logits), jnp.asarray(masks), K, topk=T)
    light = instance_inference(jnp.asarray(logits), None, K, topk=T,
                               mask_embed=jnp.asarray(me),
                               mask_features=jnp.asarray(mf), out_hw=(H, W))
    np.testing.assert_array_equal(np.asarray(full.masks), np.asarray(light.masks))
    np.testing.assert_allclose(np.asarray(full.scores), np.asarray(light.scores),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(full.classes),
                                  np.asarray(light.classes))
