"""The jitted mean-shift is validated against a slow numpy oracle that follows the
reference algorithm (lib/utils/mean_shift.py) step by step."""

import numpy as np
import jax.numpy as jnp
import pytest

from unseenobjectswithmeanshift_tpu.ops import mean_shift as ms


# ----------------------------------------------------------------------------
# numpy oracle (loops, mirrors the reference semantics; cosine metric)
# ----------------------------------------------------------------------------

def np_select_smart_seeds(X, num_seeds, first_idx):
    n, d = X.shape
    seeds = np.empty((num_seeds, d), X.dtype)
    indices = np.empty(num_seeds, np.int64)
    distances = np.empty((n, num_seeds), X.dtype)
    seeds[0] = X[first_idx]
    indices[0] = first_idx
    distances[:, 0] = 0.5 * (1 - X @ X[first_idx])
    for i in range(1, num_seeds):
        nearest = distances[:, :i].min(axis=1)
        idx = int(np.argmax(nearest))
        indices[i] = idx
        seeds[i] = X[idx]
        distances[:, i] = 0.5 * (1 - X @ X[idx])
    return seeds, indices


def np_hill_climb(X, Z, kappa, iters):
    for _ in range(iters):
        W = np.exp(kappa * (Z @ X.T))
        Z = W @ X
        Z = Z / np.maximum(np.linalg.norm(Z, axis=1, keepdims=True), 1e-12)
    return Z


def np_connected_components(Z, eps):
    n = Z.shape[0]
    labels = -np.ones(n, np.int64)
    K = 0
    # full pairwise matrix (same contraction order as the jitted version, so that
    # knife-edge comparisons dist ~= eps resolve identically)
    D = 0.5 * (1 - Z @ Z.T)
    for i in range(n):
        if labels[i] != -1:
            continue
        comp = D[i] <= eps
        existing = labels[comp]
        existing = existing[existing != -1]
        if len(existing) > 0:
            vals, counts = np.unique(existing, return_counts=True)
            label = vals[np.argmax(counts)]
        else:
            label = K
            K += 1
        labels[comp] = label
    return labels


def np_mean_shift(X, kappa, num_seeds, iters, eps, first_idx):
    seeds, sel = np_select_smart_seeds(X, num_seeds, first_idx)
    Z = np_hill_climb(X, seeds, kappa, iters)
    seed_labels = np_connected_components(Z, eps)
    dist = 0.5 * (1 - X @ Z.T)
    cluster = seed_labels[np.argmin(dist, axis=1)]
    counts = np.bincount(cluster, minlength=num_seeds)
    label_max = int(np.argmax(counts))
    if label_max != 0:
        i0 = cluster == 0
        im = cluster == label_max
        cluster[i0] = label_max
        cluster[im] = 0
    return cluster, sel


def make_blobs(rng, n_clusters=4, n_per=150, d=16):
    centers = rng.randn(n_clusters, d)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.repeat(centers, n_per, axis=0) + 0.05 * rng.randn(n_clusters * n_per, d)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    gt = np.repeat(np.arange(n_clusters), n_per)
    return X.astype(np.float32), gt


def test_select_smart_seeds_matches_oracle(rng):
    X, _ = make_blobs(rng)
    seeds_j, idx_j = ms.select_smart_seeds(jnp.asarray(X), 16, 0)
    seeds_n, idx_n = np_select_smart_seeds(X, 16, 0)
    np.testing.assert_array_equal(np.asarray(idx_j), idx_n)
    np.testing.assert_allclose(np.asarray(seeds_j), seeds_n, atol=1e-6)


def test_hill_climbing_matches_oracle(rng):
    X, _ = make_blobs(rng)
    Z0 = X[:10]
    Zj = ms.seed_hill_climbing(jnp.asarray(X), jnp.asarray(Z0), kappa=20.0, max_iters=10)
    Zn = np_hill_climb(X.astype(np.float64), Z0.astype(np.float64), 20.0, 10)
    # fp32 kernel vs fp64 oracle drifts slightly over 10 exp(20*x) iterations
    np.testing.assert_allclose(np.asarray(Zj), Zn, atol=5e-4)


def np_connected_components_from_D(D, eps):
    n = D.shape[0]
    labels = -np.ones(n, np.int64)
    K = 0
    for i in range(n):
        if labels[i] != -1:
            continue
        comp = D[i] <= eps
        existing = labels[comp]
        existing = existing[existing != -1]
        if len(existing) > 0:
            vals, counts = np.unique(existing, return_counts=True)
            label = vals[np.argmax(counts)]
        else:
            label = K
            K += 1
        labels[comp] = label
    return labels


def test_connected_components_matches_oracle(rng):
    for trial in range(5):
        Z = rng.randn(30, 8).astype(np.float32)
        Z /= np.linalg.norm(Z, axis=1, keepdims=True)
        lj = np.asarray(ms.connected_components(jnp.asarray(Z), 0.3))
        # oracle consumes the exact distance matrix the kernel sees, so that
        # knife-edge dist ~= eps comparisons resolve identically
        D = np.asarray(ms.cosine_distance(jnp.asarray(Z), jnp.asarray(Z)))
        ln = np_connected_components_from_D(D, 0.3)
        np.testing.assert_array_equal(lj, ln)


def test_full_mean_shift_matches_oracle_and_clusters(rng):
    X, gt = make_blobs(rng, n_clusters=4)
    labels_j, sel_j = ms.mean_shift_smart_init(
        jnp.asarray(X), kappa=20.0, num_seeds=32, max_iters=10, epsilon=0.04,
        first_seed_idx=0)
    labels_n, sel_n = np_mean_shift(X, 20.0, 32, 10, 0.04, 0)
    labels_j = np.asarray(labels_j)
    np.testing.assert_array_equal(np.asarray(sel_j), sel_n)
    np.testing.assert_array_equal(labels_j, labels_n)
    # the clustering actually recovers the 4 blobs (up to permutation)
    assert len(np.unique(labels_j)) == 4
    for c in range(4):
        blob = labels_j[gt == c]
        assert (blob == blob[0]).all()


def test_clustering_features_batch(rng):
    X, _ = make_blobs(rng, n_clusters=3, n_per=48, d=8)
    feat = X.reshape(1, 12, 12, 8)
    labels, sel = ms.clustering_features(jnp.asarray(feat), num_seeds=16)
    assert labels.shape == (1, 12, 12)
    assert sel.shape == (1, 16)
    # label 0 is the largest cluster
    lab = np.asarray(labels).ravel()
    counts = np.bincount(lab)
    assert counts[0] == counts.max()
