"""Device-side Jonker-Volgenant LSAP vs scipy (optimal cost + valid permutation)."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from unseenobjectswithmeanshift_tpu.losses.lsap import solve_lsap


def test_lsap_matches_scipy_fuzz(rng):
    for trial in range(30):
        G = rng.randint(1, 12)
        Q = rng.randint(G, 30)
        C = (rng.rand(Q, G) * 10).astype(np.float32)
        mine = np.asarray(solve_lsap(jnp.asarray(C.T), jnp.int32(G)))
        r, c = linear_sum_assignment(C)
        ref_cost = C[r, c].sum()
        my_cost = C[mine, np.arange(G)].sum()
        assert len(set(mine.tolist())) == G          # a valid injective assignment
        assert abs(my_cost - ref_cost) < 1e-4


def test_lsap_padded_rows(rng):
    # only the first n rows are assigned; padding slots return -1
    C = (rng.rand(5, 8) * 3).astype(np.float32)      # [R=5, C=8]
    out = np.asarray(solve_lsap(jnp.asarray(C), jnp.int32(3)))
    assert (out[3:] == -1).all()
    assert len(set(out[:3].tolist())) == 3
    r, c = linear_sum_assignment(C[:3].T)            # scipy on the valid slice
    ref = np.full(3, -1); ref[c] = r
    assert C[np.arange(3), out[:3]].sum() == np.float32(C[np.arange(3), ref].sum())


def test_lsap_square_identity():
    C = np.eye(4, dtype=np.float32) * -5             # diagonal is cheapest
    out = np.asarray(solve_lsap(jnp.asarray(C), jnp.int32(4)))
    np.testing.assert_array_equal(out, [0, 1, 2, 3])
