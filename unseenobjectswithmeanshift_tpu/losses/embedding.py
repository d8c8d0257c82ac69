"""Metric-learning embedding loss for the UCN backbone.

Ref: lib/networks/embedding.py (and its copy MSMFormer/meanshiftformer/embedding.py):
- spherical cluster means (:23-54)
- intra-cluster hinge: weight * (cosine-dist)^2 for pixels farther than alpha from
  their cluster center, with per-cluster hard-negative pixel weighting (:81-117)
- inter-cluster hinge: (delta - pairwise-dist)^2 over cluster-mean pairs (:119-128)

Fixed shape: K_max cluster slots; labels image holds values in {-1, 0..K-1}
(-1 = unlabeled, ignored). cluster k valid iff it has any pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_cluster_means(x, labels, k_max: int, normalize: bool = True):
    """x: [B, H, W, C] embeddings; labels: [B, H, W] int in {-1, 0..k_max-1}.
    Returns [B, K, C] (ref: compute_cluster_mean, embedding.py:23-54)."""
    onehot = jax.nn.one_hot(labels, k_max, dtype=x.dtype, axis=-1)     # [B,H,W,K]
    sums = jnp.einsum("bhwk,bhwc->bkc", onehot, x, precision=jax.lax.Precision.HIGHEST)
    counts = onehot.sum((1, 2))[..., None]                              # [B,K,1]
    means = sums / (counts + 1e-10)
    if normalize:
        # rsqrt-form normalize: empty cluster slots have means EXACTLY zero
        # (the reference's F.normalize(0) = 0, reproduced here), but
        # norm/maximum(norm, eps) has a 0/0 = nan BACKWARD at zero - with
        # k_max slots and fewer objects, empty slots always exist, and one
        # nan leaf made the trainer's finite-guard skip EVERY update (the
        # round-4 synthetic run trained 350 iters with zero parameter
        # movement before this was caught). rsqrt(sq + eps) is finite
        # everywhere and maps 0 -> 0 like F.normalize.
        sq = jnp.sum(jnp.square(means), axis=-1, keepdims=True)
        means = means * jax.lax.rsqrt(sq + 1e-24)
    return means


def embedding_loss(x, labels, k_max: int, alpha: float = 0.02, delta: float = 0.5,
                   lambda_intra: float = 1.0, lambda_inter: float = 1.0,
                   normalize: bool = True):
    """x: [B, H, W, C] L2-normalized embeddings; labels: [B, H, W] int32.

    Returns (loss, intra, inter) exactly as the reference (cosine metric).
    """
    B = x.shape[0]
    K = k_max
    # the reference's K is (batch max label + 1); keep it traced for exact
    # normalization constants (embedding.py:76)
    k_actual = jnp.maximum(jnp.max(labels) + 1, 1).astype(x.dtype)
    means = compute_cluster_means(x, labels, K, normalize)              # [B,K,C]
    onehot = jax.nn.one_hot(labels, K, dtype=x.dtype, axis=-1)          # [B,H,W,K]
    cluster_present = onehot.sum((1, 2)) > 0                            # [B,K]

    # tile means onto pixels (unlabeled pixels get zero vectors)
    tiled = jnp.einsum("bhwk,bkc->bhwc", onehot, means, precision=jax.lax.Precision.HIGHEST)
    labeled = (labels >= 0).astype(x.dtype)                             # [B,H,W]

    intra_d = labeled * 0.5 * (1.0 - jnp.sum(x * tiled, axis=-1))       # [B,H,W]

    # hard-negative mining + per-cluster weighting (:98-114)
    hard = (intra_d - alpha) > 0
    any_hard = jnp.sum(hard.astype(x.dtype)) > 0
    hard_f = (intra_d > alpha).astype(x.dtype)
    n_k = jnp.einsum("bhw,bhwk->bk", hard_f, onehot, precision=jax.lax.Precision.HIGHEST)                    # [B,K]
    weights = jnp.einsum("bhwk,bk->bhw", onehot, n_k, precision=jax.lax.Precision.HIGHEST)
    weights = jnp.maximum(weights, 50.0) * k_actual
    intra = jnp.sum(jnp.square(intra_d) / weights) / B
    intra = jnp.where(any_hard, intra, 0.0) * lambda_intra

    # inter-cluster over slots 0..K_actual-1. Empty clusters within range become
    # zero vectors after normalization (the reference's F.normalize(0) = 0); their
    # pairwise cosine distance is exactly 0.5, so they contribute
    # clamp(delta - 0.5, 0)^2 - zero for the shipped delta = 0.5, reproduced
    # faithfully here by keeping them in the sum.
    in_range = jnp.arange(K, dtype=x.dtype)[None, :] < k_actual         # [1,K]
    pair_valid = in_range[:, :, None] & in_range[:, None, :]
    eye = jnp.eye(K, dtype=bool)[None]
    pair_valid = pair_valid & ~eye
    d = 0.5 * (1.0 - jnp.einsum("bkc,blc->bkl", means, means, precision=jax.lax.Precision.HIGHEST))
    hinge = jnp.clip(delta - d, 0.0, None) * pair_valid
    denom = jnp.maximum(k_actual * (k_actual - 1) / 2, 1.0) * B
    inter = jnp.sum(jnp.square(hinge)) / denom
    inter = jnp.where(k_actual > 1, inter, 0.0) * lambda_inter

    return intra + inter, intra, inter
