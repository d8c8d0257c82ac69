"""Loss-stack parity tests against torch oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from unseenobjectswithmeanshift_tpu.losses.point_sample import (
    point_sample, get_uncertain_point_coords_with_randomness,
)
from unseenobjectswithmeanshift_tpu.losses.matcher import (
    batch_dice_cost, batch_sigmoid_ce_cost, hungarian_match,
)
from unseenobjectswithmeanshift_tpu.losses.criterion import (
    loss_labels, sigmoid_ce_loss, dice_loss, SetCriterion,
)
from unseenobjectswithmeanshift_tpu.losses.embedding import embedding_loss


def torch_point_sample(masks, points):
    """ref semantics: F.grid_sample(input, 2*p-1, align_corners=False)."""
    inp = torch.from_numpy(masks)[:, None]                 # [N,1,H,W]
    grid = torch.from_numpy(points)[:, :, None, :]         # [N,P,1,2]
    out = TF.grid_sample(inp, 2.0 * grid - 1.0, align_corners=False)
    return out[:, 0, :, 0].numpy()


def test_point_sample_matches_grid_sample(rng):
    N, H, W, P = 3, 13, 17, 50
    masks = rng.randn(N, H, W).astype(np.float32)
    pts = rng.rand(N, P, 2).astype(np.float32)
    mine = np.asarray(point_sample(jnp.asarray(masks), jnp.asarray(pts)))
    ref = torch_point_sample(masks, pts)
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_point_sample_edge_points():
    # points near the border partially fall into zero padding
    masks = np.ones((1, 4, 4), np.float32)
    pts = np.array([[[0.01, 0.01], [0.99, 0.99], [0.5, 0.5]]], np.float32)
    mine = np.asarray(point_sample(jnp.asarray(masks), jnp.asarray(pts)))
    ref = torch_point_sample(masks, pts)
    np.testing.assert_allclose(mine, ref, atol=1e-6)


def test_batch_costs_match_torch(rng):
    Q, G, P = 7, 4, 64
    inputs = rng.randn(Q, P).astype(np.float32)
    targets = (rng.rand(G, P) > 0.5).astype(np.float32)

    # torch oracle (matcher.py:15-62)
    ti = torch.from_numpy(inputs)
    tt = torch.from_numpy(targets)
    probs = ti.sigmoid()
    num = 2 * torch.einsum("nc,mc->nm", probs, tt)
    den = probs.sum(-1)[:, None] + tt.sum(-1)[None, :]
    ref_dice = (1 - (num + 1) / (den + 1)).numpy()
    pos = TF.binary_cross_entropy_with_logits(ti, torch.ones_like(ti), reduction="none")
    neg = TF.binary_cross_entropy_with_logits(ti, torch.zeros_like(ti), reduction="none")
    ref_ce = ((torch.einsum("nc,mc->nm", pos, tt)
               + torch.einsum("nc,mc->nm", neg, 1 - tt)) / P).numpy()

    np.testing.assert_allclose(np.asarray(batch_dice_cost(jnp.asarray(inputs),
                               jnp.asarray(targets))), ref_dice, atol=1e-5)
    np.testing.assert_allclose(np.asarray(batch_sigmoid_ce_cost(jnp.asarray(inputs),
                               jnp.asarray(targets))), ref_ce, atol=1e-5)


def test_loss_labels_matches_torch_weighted_ce(rng):
    B, Q, K = 2, 6, 2
    logits = rng.randn(B, Q, K + 1).astype(np.float32)
    gt_labels = np.ones((B, 3), np.int32)
    gt_valid = np.array([[True, True, False], [True, False, False]])
    matched = np.array([[2, 4, -1], [1, -1, -1]], np.int32)

    mine = float(loss_labels(jnp.asarray(logits), jnp.asarray(gt_labels),
                             jnp.asarray(gt_valid), jnp.asarray(matched),
                             num_classes=K, eos_coef=0.1))
    # torch oracle (criterion.py:122-138)
    target = np.full((B, Q), K, np.int64)
    target[0, 2] = 1; target[0, 4] = 1; target[1, 1] = 1
    w = torch.tensor([1.0, 1.0, 0.1])
    ref = TF.cross_entropy(torch.from_numpy(logits).permute(0, 2, 1),
                           torch.from_numpy(target), w).item()
    assert abs(mine - ref) < 1e-5


def test_mask_losses_match_torch(rng):
    M, P = 5, 32
    logits = rng.randn(M, P).astype(np.float32)
    labels = (rng.rand(M, P) > 0.5).astype(np.float32)
    valid = np.array([1, 1, 1, 0, 1], np.float32)
    num_masks = 4.0

    mine_ce = float(sigmoid_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                    jnp.asarray(valid), num_masks))
    mine_dice = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels),
                                jnp.asarray(valid), num_masks))
    ti, tt = torch.from_numpy(logits[valid > 0]), torch.from_numpy(labels[valid > 0])
    ref_ce = (TF.binary_cross_entropy_with_logits(ti, tt, reduction="none")
              .mean(1).sum() / num_masks).item()
    probs = ti.sigmoid()
    ref_dice = ((1 - (2 * (probs * tt).sum(-1) + 1)
                 / (probs.sum(-1) + tt.sum(-1) + 1)).sum() / num_masks).item()
    assert abs(mine_ce - ref_ce) < 1e-5
    assert abs(mine_dice - ref_dice) < 1e-5


def test_hungarian_match_picks_obvious_assignment(rng):
    B, Q, G, H, W = 1, 6, 2, 16, 16
    # two gt masks; make queries 1 and 4 clearly match them
    gt_masks = np.zeros((B, G, H, W), np.float32)
    gt_masks[0, 0, :8, :8] = 1
    gt_masks[0, 1, 8:, 8:] = 1
    pred_masks = np.full((B, Q, H, W), -8.0, np.float32)
    pred_masks[0, 1, :8, :8] = 8.0
    pred_masks[0, 4, 8:, 8:] = 8.0
    logits = np.zeros((B, Q, 3), np.float32)
    logits[0, 1, 1] = 5.0
    logits[0, 4, 1] = 5.0
    gt_labels = np.ones((B, G), np.int32)
    gt_valid = np.ones((B, G), bool)

    matched = hungarian_match(jax.random.PRNGKey(0), jnp.asarray(logits),
                              jnp.asarray(pred_masks), jnp.asarray(gt_labels),
                              jnp.asarray(gt_masks), jnp.asarray(gt_valid),
                              num_points=256)
    np.testing.assert_array_equal(np.asarray(matched)[0], [1, 4])


def test_set_criterion_runs_and_is_finite(rng):
    B, Q, G, H, W = 2, 5, 3, 16, 16
    outputs = {
        "pred_logits": jnp.asarray(rng.randn(B, Q, 3).astype(np.float32)),
        "pred_masks": jnp.asarray(rng.randn(B, Q, H, W).astype(np.float32)),
        "aux_outputs": [{
            "pred_logits": jnp.asarray(rng.randn(B, Q, 3).astype(np.float32)),
            "pred_masks": jnp.asarray(rng.randn(B, Q, H, W).astype(np.float32)),
        }],
    }
    gt_masks = (rng.rand(B, G, H, W) > 0.7).astype(np.float32)
    gt_labels = np.ones((B, G), np.int32)
    gt_valid = np.array([[True, True, False], [True, False, False]])
    crit = SetCriterion(num_points=128)
    total, losses = crit(jax.random.PRNGKey(1), outputs, jnp.asarray(gt_labels),
                         jnp.asarray(gt_masks), jnp.asarray(gt_valid))
    assert np.isfinite(float(total))
    assert set(losses) == {"loss_ce", "loss_mask", "loss_dice",
                           "loss_ce_0", "loss_mask_0", "loss_dice_0"}


def torch_embedding_loss(x, labels, alpha, delta, li, le):
    """Oracle following lib/networks/embedding.py semantics (cosine, normalize)."""
    x = torch.from_numpy(x)          # [B,C,H,W]
    cm = torch.from_numpy(labels)[:, None].float()  # [B,1,H,W]
    B, C = x.shape[:2]
    K = int(cm.max().item()) + 1
    means = torch.zeros(B, C, K)
    for k in range(K):
        mask = (cm == k).float()
        means[:, :, k] = (x * mask).sum(dim=[2, 3]) / (mask.sum(dim=[2, 3]) + 1e-10)
    means = TF.normalize(means, p=2, dim=1)
    tiled = torch.zeros_like(x)
    for k in range(K):
        mask = (cm == k).float()
        tiled += mask * means[:, :, k][..., None, None]
    labeled = (cm >= 0).squeeze(1).float()
    d = labeled * (0.5 * (1 - (x * tiled).sum(1)))
    hard = ((d - alpha) > 0).float()
    if hard.sum() > 0:
        w = torch.zeros(B, *d.shape[1:])
        for k in range(K):
            mask = (cm == k).float().squeeze(1)
            nk = ((d > alpha).float() * mask).sum(dim=[1, 2], keepdim=True)
            w += mask * nk
        w = torch.max(w, torch.tensor(50.0)) * K
        intra = (d.pow(2) / w).sum() / B
    else:
        intra = torch.tensor(0.0)
    intra = li * intra
    if K > 1:
        dm = 0.5 * (1 - (means.unsqueeze(2) * means.unsqueeze(3)).sum(1))
        dm = (delta - dm) * (1 - torch.eye(K))
        inter = (dm.clamp(min=0).pow(2)).sum() / (K * (K - 1) / 2 * B)
        inter = le * inter
    else:
        inter = torch.tensor(0.0)
    return float(intra + inter), float(intra), float(inter)


def test_embedding_loss_matches_torch_oracle(rng):
    B, C, H, W = 2, 8, 12, 12
    x = rng.randn(B, C, H, W).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    labels = rng.randint(0, 3, (B, H, W)).astype(np.int32)
    ref = torch_embedding_loss(x, labels, 0.02, 0.5, 1.0, 1.0)
    mine = embedding_loss(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(labels),
                          k_max=6, alpha=0.02, delta=0.5)
    for m, r in zip(mine, ref):
        assert abs(float(m) - r) < 1e-4, (float(m), r)


def test_embedding_loss_grad_finite_with_empty_slots(rng):
    """Regression: k_max > actual cluster count leaves empty slots whose
    spherical means are exactly zero; norm-based normalization had a
    0/0 = nan BACKWARD there, which silently vetoed every train step via the
    trainer's finite-guard (round-4 synthetic run: 350 iters, zero parameter
    movement). The rsqrt-form normalize must give finite grads."""
    B, C, H, W = 2, 8, 12, 12
    x = rng.randn(B, H, W, C).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    labels = rng.randint(0, 3, (B, H, W)).astype(np.int32)  # slots 3..5 empty

    def f(xx):
        loss, _, _ = embedding_loss(xx, jnp.asarray(labels), k_max=6)
        return loss

    g = jax.grad(f)(jnp.asarray(x))
    assert bool(jnp.all(jnp.isfinite(g)))


def test_criterion_factored_matches_dense(rng):
    """Scoring with (mask_embed, mask_features) must match scoring the
    materialized pred_masks = mask_embed @ mask_features (linearity of
    bilinear point sampling)."""
    import jax
    from unseenobjectswithmeanshift_tpu.losses.criterion import SetCriterion

    B, Q, G, H, W, C = 2, 8, 3, 32, 40, 16
    me = jnp.asarray(rng.randn(B, Q, C).astype(np.float32) * 0.3)
    mf = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.3)
    pred_masks = jnp.einsum("bqc,bhwc->bqhw", me, mf)
    pred_logits = jnp.asarray(rng.randn(B, Q, 3).astype(np.float32))
    gt_masks = np.zeros((B, G, H, W), np.float32)
    gt_masks[:, 0, 4:16, 4:20] = 1
    gt_masks[:, 1, 18:30, 22:38] = 1
    gt_masks = jnp.asarray(gt_masks)
    gt_labels = jnp.ones((B, G), jnp.int32)
    gt_valid = jnp.asarray(np.tile([True, True, False], (B, 1)))

    crit = SetCriterion(num_points=64, deep_supervision=False)
    key = jax.random.PRNGKey(0)
    total_d, losses_d = crit(key, {"pred_logits": pred_logits,
                                   "pred_masks": pred_masks},
                             gt_labels, gt_masks, gt_valid)
    total_f, losses_f = crit(key, {"pred_logits": pred_logits,
                                   "pred_masks": pred_masks,
                                   "mask_embed": me, "mask_features": mf},
                             gt_labels, gt_masks, gt_valid)
    np.testing.assert_allclose(float(total_f), float(total_d), rtol=2e-3)
    for k in losses_d:
        np.testing.assert_allclose(float(losses_f[k]), float(losses_d[k]),
                                   rtol=5e-3, atol=1e-4)


def test_criterion_pair_compaction_bit_exact(rng):
    """pair_budget compaction must be BIT-IDENTICAL to the uncompacted loss
    when budget >= the true pair count (the coord draws are shared via
    row_idx/total_rows, so only dead padded slots are skipped)."""
    import jax
    from unseenobjectswithmeanshift_tpu.losses.criterion import SetCriterion

    B, Q, G, H, W = 2, 6, 5, 24, 24
    outputs = {
        "pred_logits": jnp.asarray(rng.randn(B, Q, 3).astype(np.float32)),
        "pred_masks": jnp.asarray(rng.randn(B, Q, H, W).astype(np.float32)),
        "aux_outputs": [{
            "pred_logits": jnp.asarray(rng.randn(B, Q, 3).astype(np.float32)),
            "pred_masks": jnp.asarray(rng.randn(B, Q, H, W).astype(np.float32)),
        }],
    }
    gt_masks = jnp.asarray((rng.rand(B, G, H, W) > 0.7).astype(np.float32))
    gt_labels = jnp.ones((B, G), jnp.int32)
    gt_valid = jnp.asarray(np.array([[True, True, True, False, False],
                                     [True, True, False, False, False]]))
    crit = SetCriterion(num_points=96)
    key = jax.random.PRNGKey(3)
    total_full, losses_full = crit(key, outputs, gt_labels, gt_masks, gt_valid)
    total_c, losses_c = crit(key, outputs, gt_labels, gt_masks, gt_valid,
                             pair_budget=6)  # 5 valid pairs, 10 slots
    assert float(total_c) == float(total_full)
    for k in losses_full:
        assert float(losses_c[k]) == float(losses_full[k]), k


def test_criterion_pair_compaction_factored(rng):
    """Compaction on the factored (mask_embed/mask_features) scoring path."""
    import jax
    from unseenobjectswithmeanshift_tpu.losses.criterion import SetCriterion

    B, Q, G, H, W, C = 2, 8, 4, 32, 40, 16
    me = jnp.asarray(rng.randn(B, Q, C).astype(np.float32) * 0.3)
    mf = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.3)
    pred_logits = jnp.asarray(rng.randn(B, Q, 3).astype(np.float32))
    gt_masks = np.zeros((B, G, H, W), np.float32)
    gt_masks[:, 0, 4:16, 4:20] = 1
    gt_masks[:, 1, 18:30, 22:38] = 1
    gt_masks = jnp.asarray(gt_masks)
    gt_labels = jnp.ones((B, G), jnp.int32)
    gt_valid = jnp.asarray(np.tile([True, True, False, False], (B, 1)))
    outputs = {"pred_logits": pred_logits, "mask_embed": me,
               "mask_features": mf}

    crit = SetCriterion(num_points=64, deep_supervision=False)
    key = jax.random.PRNGKey(0)
    total_full, _ = crit(key, outputs, gt_labels, gt_masks, gt_valid)
    total_c, _ = crit(key, outputs, gt_labels, gt_masks, gt_valid,
                      pair_budget=4)
    assert float(total_c) == float(total_full)
