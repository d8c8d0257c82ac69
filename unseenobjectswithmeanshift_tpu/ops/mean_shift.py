"""von Mises-Fisher mean-shift clustering on the unit hypersphere, jit-compiled.

TPU-native reimplementation of the reference's non-learned clustering
(ref: lib/utils/mean_shift.py), used by the legacy UCN inference path
(ref: lib/fcn/test_dataset.py:44-59). Everything is fixed-shape and traceable:

- farthest-point ("smart") seed selection  -> lax.scan over num_seeds steps
  (ref: select_smart_seeds, mean_shift.py:128-189)
- seed hill climbing: W = exp(kappa * Z X^T); Z <- normalize(W X)  -> lax.scan
  (ref: seed_hill_climbing_ball, mean_shift.py:79-109). The [S, N] kernel matmuls
  run on the MXU; no per-pixel host loops.
- connected components over seeds at cosine distance <= epsilon -> fori_loop over
  seeds with mode-based label merging (ref: connected_components, mean_shift.py:41-76)
- pixel assignment to the closest updated seed + largest-cluster-becomes-0 relabel
  (ref: mean_shift_smart_init, mean_shift.py:192-229)

Only the 'cosine' metric is implemented - it is the only one the shipped configs use
(cfg.TRAIN.EMBEDDING_METRIC == 'cosine' everywhere).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _normalize(x, axis=-1, eps=1e-12):
    """L2 normalize, matching torch.nn.functional.normalize semantics
    (divides by max(norm, eps))."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def cosine_distance(a, b):
    """0.5 * (1 - a.b) pairwise; a [n,d], b [m,d] -> [n,m]."""
    return 0.5 * (1.0 - a @ b.T)


def select_smart_seeds(X, num_seeds: int, first_seed_idx):
    """Farthest-point seed selection (ref: mean_shift.py:128-189, cosine metric).

    X: [n, d] unit vectors. first_seed_idx: scalar int (the reference draws it
    uniformly at random; pass your own). Returns (seeds [num_seeds, d],
    selected_indices [num_seeds]).
    """
    n, d = X.shape
    first_seed_idx = jnp.asarray(first_seed_idx, jnp.int32)
    seed0 = X[first_seed_idx]
    dist0 = 0.5 * (1.0 - X @ seed0)  # [n]

    def step(carry, _):
        min_dist, = carry
        idx = jnp.argmax(min_dist).astype(jnp.int32)
        seed = X[idx]
        dist = 0.5 * (1.0 - X @ seed)
        return (jnp.minimum(min_dist, dist),), (seed, idx)

    (_,), (seeds_rest, idx_rest) = jax.lax.scan(step, (dist0,), None, length=num_seeds - 1)
    seeds = jnp.concatenate([seed0[None], seeds_rest], axis=0)
    indices = jnp.concatenate([first_seed_idx[None], idx_rest], axis=0)
    return seeds, indices


def seed_hill_climbing(X, Z, kappa: float, max_iters: int = 10):
    """Mean-shift hill climbing of seeds Z on the KDE of X (cosine / vMF kernel).

    Ref: seed_hill_climbing_ball, mean_shift.py:79-109.
    """

    def step(Z, _):
        W = jnp.exp(kappa * (Z @ X.T))          # [S, N] ball kernel
        Z = _normalize(W @ X, axis=1)           # spherical mean update
        return Z, None

    Z, _ = jax.lax.scan(step, Z, None, length=max_iters)
    return Z


def connected_components(Z, epsilon: float):
    """Label seeds whose pairwise cosine distance <= epsilon into components.

    Sequential nearest-neighbour sweep identical to the reference
    (ref: connected_components, mean_shift.py:41-76): for each unlabeled seed i,
    gather all seeds within epsilon; if any of them already has a label, take the
    mode of the existing labels (ties -> smallest label); otherwise open a new one.

    Z: [S, d]. Returns int32 labels [S] in [0, S).
    """
    S = Z.shape[0]
    D = cosine_distance(Z, Z)  # [S, S]
    within = D <= epsilon

    def body(i, carry):
        labels, K = carry
        component = within[i]                              # [S]
        # counts of existing labels among component members
        member_labels = jnp.where(component, labels, -1)   # [S]
        counts = jnp.zeros((S,), jnp.int32).at[jnp.clip(member_labels, 0)].add(
            (member_labels >= 0).astype(jnp.int32)
        )
        has_labeled = jnp.any(counts > 0)
        mode = jnp.argmax(counts).astype(jnp.int32)        # ties -> smallest label
        new_label = jnp.where(has_labeled, mode, K)
        labels = jnp.where(component, new_label, labels)
        K = jnp.where(has_labeled, K, K + 1)
        return (labels, K)

    def outer(i, carry):
        labels, K = carry
        return jax.lax.cond(labels[i] == -1, lambda c: body(i, c), lambda c: c, (labels, K))

    labels0 = jnp.full((S,), -1, jnp.int32)
    labels, _ = jax.lax.fori_loop(0, S, outer, (labels0, jnp.int32(0)))
    return labels


@partial(jax.jit, static_argnames=("num_seeds", "max_iters", "kappa", "epsilon"))
def mean_shift_smart_init(X, kappa: float = 20.0, num_seeds: int = 100,
                          max_iters: int = 10, epsilon: float = 0.04,
                          first_seed_idx=0):
    """Full mean-shift clustering (ref: mean_shift_smart_init, mean_shift.py:192-229).

    X: [n, d] unit vectors. Returns (cluster_labels [n] int32 with the largest
    cluster relabeled 0, selected_indices [num_seeds]).
    """
    seeds, selected_indices = select_smart_seeds(X, num_seeds, first_seed_idx)
    updated_seeds = seed_hill_climbing(X, seeds, kappa, max_iters)
    seed_labels = connected_components(updated_seeds, epsilon)

    distances = cosine_distance(X, updated_seeds)          # [n, S]
    closest = jnp.argmin(distances, axis=1)
    cluster_labels = seed_labels[closest]                  # [n]

    # relabel the largest cluster as 0 (background)
    S = seeds.shape[0]
    counts = jnp.zeros((S,), jnp.int32).at[cluster_labels].add(1)
    label_max = jnp.argmax(counts).astype(jnp.int32)
    cluster_labels = jnp.where(
        label_max != 0,
        jnp.where(cluster_labels == 0, label_max,
                  jnp.where(cluster_labels == label_max, 0, cluster_labels)),
        cluster_labels,
    )
    return cluster_labels, selected_indices


def clustering_features(features, num_seeds: int = 100, kappa: float = 20.0,
                        max_iters: int = 10, epsilon: float = 0.04,
                        first_seed_idx=0):
    """Cluster a batch of embedding maps into label images.

    features: [B, H, W, C] L2-normalized embeddings (NHWC, TPU layout).
    Returns (labels [B, H, W] int32, selected_indices [B, num_seeds]).
    Ref: clustering_features, lib/fcn/test_dataset.py:44-59 (kappa=20 hardcoded there).
    """
    B, H, W, C = features.shape
    X = features.reshape(B, H * W, C)
    fn = partial(mean_shift_smart_init, kappa=kappa, num_seeds=num_seeds,
                 max_iters=max_iters, epsilon=epsilon, first_seed_idx=first_seed_idx)
    labels, indices = jax.vmap(fn)(X)
    return labels.reshape(B, H, W), indices
