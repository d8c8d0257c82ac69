"""Exact masked K-tile skipping in the fused cross-attention kernel.

The plan (ops/fused_cross_attention.plan_tile_skip) certifies tiles all-masked
via a sound interval bound on the mask logits me.mf; the kernel elides them.
Correctness contract: output is BIT-IDENTICAL to the full run for any inputs
(a skipped tile contributes exact zeros to the masked accumulator; the
all-masked-row guard is repaired by a full re-run when it fires on an image
with skipped tiles - ref semantics: meanshiftformer_transformer_decoder.py
:970 guard, :1028-1033 mask threshold).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from unseenobjectswithmeanshift_tpu.ops.fused_cross_attention import (
    fused_uoms_cross_attention, fused_uoms_cross_attention_reference,
    mf_tile_bounds, plan_tile_skip,
)
from tests.test_fused_cross_attention import make_inputs

BK, BB = 32, 2


def run_pair(args, present=None, kappa=30.0):
    """(skip-run output, full-run output, plan)."""
    mfT, me = args[2], args[3]
    plan = plan_tile_skip(me, *mf_tile_bounds(mfT, BK), BB)
    out_skip = fused_uoms_cross_attention(
        *args, present=present, tile_plan=plan, kappa=kappa, block_k=BK,
        block_b=BB, interpret=True)
    out_full = fused_uoms_cross_attention(
        *args, present=present, kappa=kappa, block_k=BK, block_b=BB,
        interpret=True)
    return out_skip, out_full, plan


def concentrated_inputs(rng, B=2, Q=10, Cm=24, K=128, masked_channel=0,
                        open_keys=32):
    """me/mf crafted so only the first `open_keys` keys are (certifiably)
    unmasked for every query: channel `masked_channel` of mf is -1 there and
    +1 elsewhere, and every query weights it with -5 (other channels tiny)."""
    args = make_inputs(rng, B=B, Q=Q, Cm=Cm, K=K)
    mf = np.asarray(args[2]).copy() * 0.02
    me = np.asarray(args[3]).copy() * 0.02
    mf[:, masked_channel, :] = 1.0
    mf[:, masked_channel, :open_keys] = -1.0
    me[:, :, masked_channel] = -5.0
    args[2] = jnp.asarray(mf)
    args[3] = jnp.asarray(me)
    return args


def test_plan_skips_nothing_on_dense_masks(rng):
    """Random decisive logits leave every tile occupied - the plan must then
    be the identity (n_present == T) and the output bit-identical."""
    args = make_inputs(rng, B=3, Q=5, K=90)   # batch + key padding too
    out_skip, out_full, plan = run_pair(args)
    T = plan.tile_list.shape[1]
    np.testing.assert_array_equal(np.asarray(out_skip), np.asarray(out_full))
    # occupancy is data-dependent but with decisive random logits every tile
    # has some unmasked key for some query
    assert int(np.asarray(plan.n_present).min()) >= T - 1


def test_tile_skip_bit_identical_concentrated(rng):
    """Concentrated masks: most tiles are certified all-masked and skipped;
    the output must still be bit-identical to the full run."""
    args = concentrated_inputs(rng)
    out_skip, out_full, plan = run_pair(args)
    T = plan.tile_list.shape[1]          # 128/32 = 4 tiles
    npres = np.asarray(plan.n_present)
    assert (npres <= T // 2).all(), f"expected real skipping, got {npres} of {T}"
    np.testing.assert_array_equal(np.asarray(out_skip), np.asarray(out_full))
    ref = fused_uoms_cross_attention_reference(*args)
    np.testing.assert_allclose(np.asarray(out_skip), np.asarray(ref), atol=2e-5)


def test_plan_soundness(rng):
    """Every tile the plan marks unoccupied must be truly all-masked (exact
    numpy logits) for every query - the bound may under-skip, never over."""
    for mk in (concentrated_inputs(rng), make_inputs(rng, B=2, K=96)):
        mf = np.asarray(mk[2], np.float64)     # [B, Cm, K]
        me = np.asarray(mk[3], np.float64)     # [B, Q, Cm]
        plan = plan_tile_skip(mk[3], *mf_tile_bounds(mk[2], BK), BB)
        occ = np.asarray(plan.occ)
        B, K = mf.shape[0], mf.shape[2]
        mlog = np.einsum("bqc,bck->bqk", me, mf)
        for b in range(B):
            for t in range(occ.shape[1]):
                if occ[b, t] == 0:
                    tile = mlog[b, :, t * BK:(t + 1) * BK]
                    assert (tile < 0).all(), (b, t, tile.max())
        # present tiles are compacted first and the tail repeats the last one
        tl = np.asarray(plan.tile_list)
        npres = np.asarray(plan.n_present)
        for blk in range(tl.shape[0]):
            n = npres[blk]
            assert len(set(tl[blk, :n])) == n           # unique present ids
            assert (tl[blk, n:] == tl[blk, n - 1]).all()  # revisit tail


def test_guard_fixup_with_skipped_tiles(rng):
    """A query whose mask removes EVERY key (guard row) on an image that
    skipped tiles triggers the exact full re-run: the guard row must equal
    unmasked attention over ALL keys, skipped ones included."""
    args = concentrated_inputs(rng)
    me = np.asarray(args[3]).copy()
    mf = np.asarray(args[2]).copy()
    # query 0 of image 0: all-masked globally via channel 1 (strictly
    # positive everywhere, weighted -5; other channels zeroed)
    mf[0, 1, :] = np.abs(mf[0, 1, :]) + 0.1
    me[0, 0, :] = 0.0
    me[0, 0, 1] = -5.0
    assert (me[0, 0] @ mf[0] < 0).all()
    args[2] = jnp.asarray(mf)
    args[3] = jnp.asarray(me)
    out_skip, out_full, plan = run_pair(args)
    assert (np.asarray(plan.n_present) < plan.tile_list.shape[1]).all()
    np.testing.assert_array_equal(np.asarray(out_skip), np.asarray(out_full))
    ref = fused_uoms_cross_attention_reference(*args)
    np.testing.assert_allclose(np.asarray(out_skip), np.asarray(ref), atol=2e-5)


def test_tile_skip_with_present_gating(rng):
    """Absent images contribute nothing to the block tile union; present
    images stay bit-identical to the ungated full run."""
    args = concentrated_inputs(rng, B=4)
    present = jnp.asarray(np.array([True, False, True, False]))
    mfT, me = args[2], args[3]
    plan = plan_tile_skip(me, *mf_tile_bounds(mfT, BK), BB, present=present)
    assert (np.asarray(plan.n_present) < plan.tile_list.shape[1]).all()
    out = fused_uoms_cross_attention(
        *args, present=present, tile_plan=plan, block_k=BK, block_b=BB,
        interpret=True)
    full = fused_uoms_cross_attention(*args, block_k=BK, block_b=BB,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(full[0]))
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(full[2]))
    assert np.all(np.asarray(out[1]) == 0) and np.all(np.asarray(out[3]) == 0)


def test_force_all_control(rng):
    """force_all (the drift-control mode): every tile certified present, and
    the kernel output stays bit-identical to the full run on concentrated
    masks (where the normal plan would skip most tiles)."""
    args = concentrated_inputs(rng)
    mfT, me = args[2], args[3]
    plan = plan_tile_skip(me, *mf_tile_bounds(mfT, BK), BB, force_all=True)
    T = plan.tile_list.shape[1]
    assert (np.asarray(plan.n_present) == T).all()
    out = fused_uoms_cross_attention(
        *args, tile_plan=plan, kappa=30.0, block_k=BK, block_b=BB,
        interpret=True)
    out_full = fused_uoms_cross_attention(
        *args, kappa=30.0, block_k=BK, block_b=BB, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_full))
