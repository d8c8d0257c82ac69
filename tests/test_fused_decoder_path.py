"""The decoder's fully-fused inference path (use_pallas + 1-level) must produce
the same outputs as the unfused XLA path - exercised on CPU by forcing the
Pallas kernel into interpret mode."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import unseenobjectswithmeanshift_tpu.models.decoder as decoder_mod
from unseenobjectswithmeanshift_tpu.models.decoder import MeanShiftDecoder
from unseenobjectswithmeanshift_tpu.ops.fused_cross_attention import (
    fused_uoms_cross_attention,
)


def test_fused_decoder_matches_unfused(rng, monkeypatch):
    monkeypatch.setattr(decoder_mod, "fused_uoms_cross_attention",
                        partial(fused_uoms_cross_attention, interpret=True,
                                block_k=64, block_b=2))
    E, NH, Q, L, MD, IC, FF, NC = 32, 4, 6, 2, 24, 16, 48, 2
    h = w = 12
    x = jnp.asarray(rng.randn(2, h, w, IC).astype(np.float32) * 0.5)
    mf = jnp.asarray(rng.randn(2, h, w, MD).astype(np.float32) * 0.5)

    kw = dict(num_classes=NC, hidden_dim=E, num_queries=Q, nheads=NH,
              dim_feedforward=FF, dec_layers=L, mask_dim=MD, in_channels=IC,
              num_feature_levels=1)
    dec = MeanShiftDecoder(**kw, use_pallas=False)
    variables = dec.init(jax.random.PRNGKey(0), [x], mf)
    # make mask logits decisive so the <0 binarization is fp-robust (random
    # weights put them near 0; see test_e2e_parity for the same technique)
    variables = jax.tree_util.tree_map_with_path(
        lambda p, v: v * 20.0 if any(
            getattr(k, "key", None) == "layers_2" for k in p) else v, variables)
    ref = dec.apply(variables, [x], mf)

    dec_fused = MeanShiftDecoder(**kw, use_pallas=True)
    out = dec_fused.apply(variables, [x], mf)

    np.testing.assert_allclose(np.asarray(out["pred_logits"]),
                               np.asarray(ref["pred_logits"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pred_masks"]),
                               np.asarray(ref["pred_masks"]), atol=2e-3)
    assert out["mask_embed"].shape == (2, Q, MD)
    # fused aux outputs carry class logits only (no per-layer mask einsums)
    for a, r in zip(out["aux_outputs"], ref["aux_outputs"]):
        np.testing.assert_allclose(np.asarray(a["pred_logits"]),
                                   np.asarray(r["pred_logits"]), atol=2e-4)
        assert "pred_masks" not in a


def test_fused_decoder_no_input_proj(rng, monkeypatch):
    """in_channels == hidden_dim: input_proj is the identity (reference
    :498-502); the fused path must fold only level_embed."""
    monkeypatch.setattr(decoder_mod, "fused_uoms_cross_attention",
                        partial(fused_uoms_cross_attention, interpret=True,
                                block_k=64, block_b=2))
    E = IC = 32
    h = w = 8
    x = jnp.asarray(rng.randn(1, h, w, IC).astype(np.float32) * 0.5)
    mf = jnp.asarray(rng.randn(1, h, w, 16).astype(np.float32) * 0.5)
    kw = dict(num_classes=2, hidden_dim=E, num_queries=5, nheads=4,
              dim_feedforward=48, dec_layers=2, mask_dim=16, in_channels=IC,
              num_feature_levels=1)
    dec = MeanShiftDecoder(**kw, use_pallas=False)
    variables = dec.init(jax.random.PRNGKey(1), [x], mf)
    variables = jax.tree_util.tree_map_with_path(
        lambda p, v: v * 20.0 if any(
            getattr(k, "key", None) == "layers_2" for k in p) else v, variables)
    ref = dec.apply(variables, [x], mf)
    out = MeanShiftDecoder(**kw, use_pallas=True).apply(variables, [x], mf)
    np.testing.assert_allclose(np.asarray(out["pred_logits"]),
                               np.asarray(ref["pred_logits"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pred_masks"]),
                               np.asarray(ref["pred_masks"]), atol=2e-3)


def test_key_stride_fused_matches_unfused(rng, monkeypatch):
    """Opt-in key_stride (config.DecoderConfig.key_stride): the fused kernel
    over strided key layouts must equal the unfused path's strided-subsample
    formulation exactly; masks stay full-resolution."""
    monkeypatch.setattr(decoder_mod, "fused_uoms_cross_attention",
                        partial(fused_uoms_cross_attention, interpret=True,
                                block_k=32, block_b=2))
    E, NH, Q, L, MD, IC, FF, NC = 32, 4, 6, 2, 24, 16, 48, 2
    h = w = 12
    x = jnp.asarray(rng.randn(2, h, w, IC).astype(np.float32) * 0.5)
    mf = jnp.asarray(rng.randn(2, h, w, MD).astype(np.float32) * 0.5)
    kw = dict(num_classes=NC, hidden_dim=E, num_queries=Q, nheads=NH,
              dim_feedforward=FF, dec_layers=L, mask_dim=MD, in_channels=IC,
              num_feature_levels=1)
    dec = MeanShiftDecoder(**kw, use_pallas=False, key_stride=2)
    variables = dec.init(jax.random.PRNGKey(0), [x], mf)
    variables = jax.tree_util.tree_map_with_path(
        lambda p, v: v * 20.0 if any(
            getattr(k, "key", None) == "layers_2" for k in p) else v, variables)
    ref = dec.apply(variables, [x], mf)
    out = MeanShiftDecoder(**kw, use_pallas=True, key_stride=2).apply(
        variables, [x], mf)

    # masks full-res regardless of key stride
    assert ref["pred_masks"].shape == (2, Q, h, w)
    np.testing.assert_allclose(np.asarray(out["pred_logits"]),
                               np.asarray(ref["pred_logits"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pred_masks"]),
                               np.asarray(ref["pred_masks"]), atol=2e-3)


def test_tile_skip_fused_matches_plain_fused(rng, monkeypatch):
    """decoder.tile_skip=True must be bit-identical to the plain fused path
    (the plan only elides certified-all-masked K tiles; guard fix-up covers
    the degenerate all-masked-query case)."""
    monkeypatch.setattr(decoder_mod, "fused_uoms_cross_attention",
                        partial(fused_uoms_cross_attention, interpret=True))
    monkeypatch.setattr(decoder_mod, "select_blocks", lambda K: (32, 2))
    E, NH, Q, L, MD, IC, FF, NC = 32, 4, 6, 2, 24, 16, 48, 2
    h = w = 12
    x = jnp.asarray(rng.randn(2, h, w, IC).astype(np.float32) * 0.5)
    mf = jnp.asarray(rng.randn(2, h, w, MD).astype(np.float32) * 0.5)
    kw = dict(num_classes=NC, hidden_dim=E, num_queries=Q, nheads=NH,
              dim_feedforward=FF, dec_layers=L, mask_dim=MD, in_channels=IC,
              num_feature_levels=1, use_pallas=True)
    dec = MeanShiftDecoder(**kw)
    variables = dec.init(jax.random.PRNGKey(0), [x], mf)
    variables = jax.tree_util.tree_map_with_path(
        lambda p, v: v * 20.0 if any(
            getattr(k, "key", None) == "layers_2" for k in p) else v, variables)
    ref = dec.apply(variables, [x], mf)
    out = MeanShiftDecoder(**kw, tile_skip=True).apply(variables, [x], mf)
    np.testing.assert_array_equal(np.asarray(out["pred_logits"]),
                                  np.asarray(ref["pred_logits"]))
    np.testing.assert_array_equal(np.asarray(out["pred_masks"]),
                                  np.asarray(ref["pred_masks"]))


def test_fused_multilevel_matches_unfused(rng, monkeypatch):
    """3-level (R50-style) fused path: per-level resized mask features must
    reproduce the unfused path's per-layer logit resize (resize commutes with
    the me contraction), round-robin over levels."""
    monkeypatch.setattr(decoder_mod, "fused_uoms_cross_attention",
                        partial(fused_uoms_cross_attention, interpret=True))
    monkeypatch.setattr(decoder_mod, "select_blocks", lambda K: (32, 2))
    E, NH, Q, L, MD, IC, FF, NC = 32, 4, 6, 4, 24, 16, 48, 2
    hs = [(12, 12), (6, 6), (3, 3)]
    xs = [jnp.asarray(rng.randn(2, h, w, IC).astype(np.float32) * 0.5)
          for h, w in hs]
    mf = jnp.asarray(rng.randn(2, 24, 24, MD).astype(np.float32) * 0.5)
    kw = dict(num_classes=NC, hidden_dim=E, num_queries=Q, nheads=NH,
              dim_feedforward=FF, dec_layers=L, mask_dim=MD, in_channels=IC,
              num_feature_levels=3)
    dec = MeanShiftDecoder(**kw, use_pallas=False)
    variables = dec.init(jax.random.PRNGKey(0), xs, mf)
    variables = jax.tree_util.tree_map_with_path(
        lambda p, v: v * 20.0 if any(
            getattr(k, "key", None) == "layers_2" for k in p) else v, variables)
    ref = dec.apply(variables, xs, mf)
    out = MeanShiftDecoder(**kw, use_pallas=True).apply(variables, xs, mf)
    np.testing.assert_allclose(np.asarray(out["pred_logits"]),
                               np.asarray(ref["pred_logits"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(out["pred_masks"]),
                               np.asarray(ref["pred_masks"]), atol=3e-3)
    # tile_skip composes with the multi-level path (bit-identical to fused)
    out2 = MeanShiftDecoder(**kw, use_pallas=True, tile_skip=True).apply(
        variables, xs, mf)
    np.testing.assert_array_equal(np.asarray(out2["pred_logits"]),
                                  np.asarray(out["pred_logits"]))
    np.testing.assert_array_equal(np.asarray(out2["pred_masks"]),
                                  np.asarray(out["pred_masks"]))
