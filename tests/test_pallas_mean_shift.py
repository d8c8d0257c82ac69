"""The VMEM-resident mean-shift kernel (interpret mode) against the XLA
formulation it accelerates (ops/mean_shift.py, itself oracle-tested against
numpy reference semantics in test_mean_shift.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from unseenobjectswithmeanshift_tpu.ops.mean_shift import (
    mean_shift_smart_init, select_smart_seeds, seed_hill_climbing,
)
from unseenobjectswithmeanshift_tpu.ops.pallas_mean_shift import (
    mean_shift_seeds_pallas, mean_shift_smart_init_pallas,
)


def clustered_points(rng, n=600, d=16, k=5):
    """Unit vectors around k random directions (realistic clustering input)."""
    centers = rng.randn(k, d)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = centers[rng.randint(0, k, n)] + 0.12 * rng.randn(n, d)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return X.astype(np.float32)


def test_seeds_and_indices_match_xla(rng):
    B, n, d, S, iters = 2, 600, 16, 12, 5
    X = np.stack([clustered_points(rng, n, d) for _ in range(B)])
    seeds_p, idx_p = mean_shift_seeds_pallas(
        jnp.asarray(X), jnp.asarray([3, 77], np.int32), kappa=20.0,
        num_seeds=S, max_iters=iters, chunk=128, interpret=True)
    for b, f0 in enumerate((3, 77)):
        seeds_ref, idx_ref = select_smart_seeds(jnp.asarray(X[b]), S, f0)
        z_ref = seed_hill_climbing(jnp.asarray(X[b]), seeds_ref, 20.0, iters)
        # seed SELECTION is a discrete argmax chain - must match exactly
        np.testing.assert_array_equal(np.asarray(idx_p[b]), np.asarray(idx_ref))
        np.testing.assert_allclose(np.asarray(seeds_p[b]), np.asarray(z_ref),
                                   atol=2e-6)


def test_padded_keys_are_inert(rng):
    """n not divisible by chunk: padded columns must change nothing (they
    duplicate column 0 for the argmax and are masked in hill climbing)."""
    B, n, d, S, iters = 1, 500, 16, 10, 4   # chunk 128 -> pad to 512
    X = clustered_points(rng, n, d)[None]
    seeds_p, idx_p = mean_shift_seeds_pallas(
        jnp.asarray(X), jnp.asarray([0], np.int32), kappa=20.0,
        num_seeds=S, max_iters=iters, chunk=128, interpret=True)
    seeds_ref, idx_ref = select_smart_seeds(jnp.asarray(X[0]), S, 0)
    z_ref = seed_hill_climbing(jnp.asarray(X[0]), seeds_ref, 20.0, iters)
    np.testing.assert_array_equal(np.asarray(idx_p[0]), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(seeds_p[0]), np.asarray(z_ref),
                               atol=2e-6)


def test_full_clustering_matches_xla(rng):
    B, n, d, S = 2, 384, 16, 10
    X = np.stack([clustered_points(rng, n, d, k=4) for _ in range(B)])
    labels_p, idx_p = mean_shift_smart_init_pallas(
        jnp.asarray(X), kappa=20.0, num_seeds=S, max_iters=5,
        epsilon=0.04, first_seed_idx=0, chunk=128, interpret=True)
    for b in range(B):
        labels_ref, idx_ref = mean_shift_smart_init(
            jnp.asarray(X[b]), kappa=20.0, num_seeds=S, max_iters=5,
            epsilon=0.04, first_seed_idx=0)
        np.testing.assert_array_equal(np.asarray(idx_p[b]), np.asarray(idx_ref))
        np.testing.assert_array_equal(np.asarray(labels_p[b]),
                                      np.asarray(labels_ref))


def test_fps_seeds_match_xla(rng):
    """Round-3 seeding-only kernel: the discrete argmax chain must match the
    XLA scan exactly (same formula, same tie-breaking, padded lanes inert)."""
    from unseenobjectswithmeanshift_tpu.ops.pallas_mean_shift import (
        fps_seeds_pallas)

    B, n, d, S = 2, 600, 16, 12   # n=600 pads to 1024
    X = np.stack([clustered_points(rng, n, d) for _ in range(B)])
    seeds_p, idx_p = fps_seeds_pallas(
        jnp.asarray(X), jnp.asarray([3, 77], np.int32), num_seeds=S,
        interpret=True)
    for b, f0 in enumerate((3, 77)):
        seeds_ref, idx_ref = select_smart_seeds(jnp.asarray(X[b]), S, f0)
        np.testing.assert_array_equal(np.asarray(idx_p[b]), np.asarray(idx_ref))
        np.testing.assert_allclose(np.asarray(seeds_p[b]),
                                   np.asarray(seeds_ref), atol=2e-6)


def test_fps_full_clustering_matches_xla(rng):
    from unseenobjectswithmeanshift_tpu.ops.pallas_mean_shift import (
        mean_shift_smart_init_fps)

    B, n, d, S = 2, 512, 16, 10
    X = np.stack([clustered_points(rng, n, d, k=4) for _ in range(B)])
    labels_p, idx_p = mean_shift_smart_init_fps(
        jnp.asarray(X), kappa=20.0, num_seeds=S, max_iters=5,
        epsilon=0.04, first_seed_idx=0, interpret=True)
    for b in range(B):
        labels_ref, idx_ref = mean_shift_smart_init(
            jnp.asarray(X[b]), kappa=20.0, num_seeds=S, max_iters=5,
            epsilon=0.04, first_seed_idx=0)
        np.testing.assert_array_equal(np.asarray(idx_p[b]), np.asarray(idx_ref))
        np.testing.assert_array_equal(np.asarray(labels_p[b]),
                                      np.asarray(labels_ref))
