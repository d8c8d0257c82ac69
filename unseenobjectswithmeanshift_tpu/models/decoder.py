"""MeanShift transformer decoder (MSMFormer) - flax, fixed-shape, jit-friendly.

Re-design of the reference decoders
(ref: MSMFormer/meanshiftformer/modeling/transformer_decoder/
meanshiftformer_transformer_decoder.py):
- PretrainedMeanShiftTransformerDecoder (:697-1048): num_feature_levels=1, used with
  the UCN backbone (the flagship configuration)
- MeanShiftTransformerDecoder (:343-695): num_feature_levels=3, used with the
  ResNet50 + MSDeformAttn pixel decoder
Both are instances of MeanShiftDecoder here (the level count is a config field).

Per layer (post-norm, dropout 0 in all shipped configs):
  cross-attention (hypersphere): tgt2 = MSAttn(q=out+query_pos, k=src+pos, v=src, mask)
                                 out  = LN(out + tgt2)                       (:245-260)
  self-attention  (hypersphere): q = k = out+query_pos, v = out              (:171-181)
  FFN 256->2048->256 relu        out  = LN(out + lin2(relu(lin1(out))))      (:300-304)
  decoder_block_norm:            out  = L2-normalize(out)                    (:989-990)
  prediction heads -> (class logits, mask logits, next attention mask)       (:1012-1035)

The attention mask is sigmoid(interp(mask_logits)) < 0.5 == interp(mask_logits) < 0,
detached, with the all-masked-row guard (:970) folded into bool_mask_to_bias.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.hypersphere_attention import (
    MhaParams, meanshift_attention, chunked_masked_meanshift_attention_twopass,
    bool_mask_to_bias, l2_normalize, split_heads, merge_heads,
)

# masked cross-attention switches to the chunked online-softmax formulation at
# this key count (dense [B, H, Q, K] weights OOM HBM at full-res training)
CHUNKED_ATTENTION_MIN_K = 32768
from ..ops.pallas_attention import (
    masked_hypersphere_attention, fused_masked_hypersphere_attention,
)
from ..ops.fused_cross_attention import (
    fused_uoms_cross_attention, mf_tile_bounds, plan_tile_skip, select_blocks,
)
from ..ops.resize import resize_bilinear
from .position_encoding import position_embedding_sine
from .resnet import default_precision

xavier = nn.initializers.xavier_uniform()
zeros = nn.initializers.zeros


class MultiheadAttention(nn.Module):
    """Multi-head attention with either hypersphere (mean-shift) or standard
    scaled-dot-product core. Params mirror torch nn.MultiheadAttention (packed
    q/k/v kept as separate kernels, flax [in, out] layout)."""

    embed_dim: int
    num_heads: int
    meanshift: bool = True
    kappa: float = 30.0
    use_pallas: bool = False
    tile_skip_force_all: bool = False   # plan_tile_skip control mode
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, mask_bias=None, mask_logits=None,
                 key_base=None, key_pos=None, fused_inputs=None, present=None):
        E = self.embed_dim
        p = MhaParams(
            q_kernel=self.param("q_kernel", xavier, (E, E)),
            k_kernel=self.param("k_kernel", xavier, (E, E)),
            v_kernel=self.param("v_kernel", xavier, (E, E)),
            q_bias=self.param("q_bias", zeros, (E,)),
            k_bias=self.param("k_bias", zeros, (E,)),
            v_bias=self.param("v_bias", zeros, (E,)),
            out_kernel=self.param("out_kernel", xavier, (E, E)),
            out_bias=self.param("out_bias", zeros, (E,)),
        )
        prec = default_precision(self.dtype)
        if self.meanshift and self.use_pallas and fused_inputs is not None:
            # FULLY fused path v2 (ops/fused_cross_attention.py): the kernel
            # streams the 64-ch feature map + mask features and computes the
            # k/v projections (input_proj folded), pos projection, attention
            # mask and the all-masked-row guard in VMEM. Nothing per-layer is
            # materialized in HBM.
            featT, mfT, me, posT, win, cin, mfb = fused_inputs
            dt = query.dtype
            f32 = jnp.float32
            proj = lambda x, w, b: (jnp.einsum(
                "ble,ef->blf", x, w.astype(dt), precision=prec) + b.astype(dt))
            q = l2_normalize(split_heads(proj(query, p.q_kernel, p.q_bias),
                                         self.num_heads))
            if win is not None:
                awk = (win.astype(f32) @ p.k_kernel.astype(f32)).astype(dt)
                awv = (win.astype(f32) @ p.v_kernel.astype(f32)).astype(dt)
            else:
                awk = p.k_kernel.astype(dt)
                awv = p.v_kernel.astype(dt)
            ck = (cin.astype(f32) @ p.k_kernel.astype(f32)
                  + p.k_bias.astype(f32)).astype(dt)
            cv = (cin.astype(f32) @ p.v_kernel.astype(f32)
                  + p.v_bias.astype(f32)).astype(dt)
            # block sizes tuned on the v5e (select_blocks): long-K whole-image
            # shapes want wider K tiles (+2% end to end); the crop shapes keep
            # the defaults (wider/bb=8 variants win in kernel isolation but
            # LOSE ~10 ms in the full stage-2 graph - measured, bench.py)
            K = featT.shape[-1]
            bk, bb = select_blocks(K)
            me_sg = jax.lax.stop_gradient(me)
            # exact masked K-tile skipping: mfb = per-tile mask-feature bounds
            # (computed once per forward); the plan certifies all-masked tiles
            # from THIS layer's mask embed and elides them bit-identically
            plan = (plan_tile_skip(me_sg, mfb[0], mfb[1], bb, present=present,
                                   force_all=self.tile_skip_force_all)
                    if mfb is not None else None)
            out = fused_uoms_cross_attention(
                q, featT, mfT, me_sg, posT.astype(dt),
                awk, awv, p.k_kernel.astype(dt), ck, cv, present=present,
                tile_plan=plan, kappa=self.kappa, block_k=bk, block_b=bb)
            out = merge_heads(l2_normalize(out))
            return proj(out, p.out_kernel, p.out_bias)
        if (self.meanshift and self.use_pallas and mask_logits is not None
                and key_base is not None):
            # FULLY fused path: the kernel streams the raw feature tiles once
            # and computes the k/v projections in VMEM (k gets +pos, v does
            # not, ref: MeanShiftCrossAttentionLayer :250-253)
            dt = query.dtype
            proj = lambda x, w, b: (jnp.einsum(
                "ble,ef->blf", x, w.astype(dt), precision=prec) + b.astype(dt))
            q = l2_normalize(split_heads(proj(query, p.q_kernel, p.q_bias),
                                         self.num_heads))
            out = fused_masked_hypersphere_attention(
                q, key_base, key_pos.astype(dt),
                p.k_kernel.astype(dt), p.k_bias.astype(dt),
                p.v_kernel.astype(dt), p.v_bias.astype(dt),
                jax.lax.stop_gradient(mask_logits), kappa=self.kappa)
            out = merge_heads(l2_normalize(out))
            return proj(out, p.out_kernel, p.out_bias)
        if self.meanshift and self.use_pallas and mask_logits is not None:
            # fused Pallas path: mask derived from raw mask logits inside the
            # kernel; projections + final normalize/out-proj stay in XLA.
            # k/v are projected DIRECTLY into the kernel's streamed layout
            # [B, H, D, K] (K minor) so no full-tensor transpose is ever
            # materialized (the kernel is DMA-bound).
            dt = query.dtype
            H = self.num_heads
            E = self.embed_dim
            D = E // H
            proj = lambda x, w, b: (jnp.einsum(
                "ble,ef->blf", x, w.astype(dt), precision=prec) + b.astype(dt))
            q = split_heads(proj(query, p.q_kernel, p.q_bias), H)
            projT = lambda x, w, b: (
                jnp.einsum("bke,ehd->bhdk", x, w.astype(dt).reshape(E, H, D),
                           precision=prec) + b.astype(dt).reshape(1, H, D, 1))
            kT = projT(key, p.k_kernel, p.k_bias)
            vT = projT(value, p.v_kernel, p.v_bias)
            # k passes RAW - the kernel normalizes tiles in VMEM
            out = masked_hypersphere_attention(
                l2_normalize(q), kT, vT,
                jax.lax.stop_gradient(mask_logits), kappa=self.kappa,
                kv_transposed=True, k_normalized=False)
            out = merge_heads(l2_normalize(out))
            return proj(out, p.out_kernel, p.out_bias)
        if self.meanshift:
            if (mask_bias is None and mask_logits is not None
                    and key.shape[1] >= CHUNKED_ATTENTION_MIN_K):
                # large-K masked cross-attention without the Pallas kernel
                # (training, or CPU eval at full resolution): the dense path's
                # [B, H, Q, K] weights would exceed HBM - use the chunked
                # two-pass fixed-max formulation (fwd+bwd memory O(chunk)).
                # Chosen over the online-softmax variant by an on-chip A/B
                # (scripts/profile_train_step.py: 54.4 vs 98.0 ms/layer
                # fwd+bwd, 1.80x) - same math, exact forward AND gradient
                # (tests/test_hypersphere_attention.py); its single fixed row
                # max keeps den >= 1, so the random-init overflow that rules
                # out the naive fixed-max trick cannot occur here.
                return chunked_masked_meanshift_attention_twopass(
                    p, query, key, value, self.num_heads,
                    mask_logits.reshape(query.shape[0], query.shape[1], -1),
                    kappa=self.kappa, precision=prec)
            if mask_bias is None and mask_logits is not None:
                mask_bias = bool_mask_to_bias(mask_logits < 0)
            out, _ = meanshift_attention(p, query, key, value, self.num_heads,
                                         kappa=self.kappa, mask_bias=mask_bias,
                                         precision=prec)
            return out
        # standard softmax attention (for the non-meanshift baseline decoders)
        dt = query.dtype
        proj = lambda x, w, b: (
            jnp.einsum("ble,ef->blf", x, w.astype(dt), precision=prec) + b.astype(dt))
        q = split_heads(proj(query, p.q_kernel, p.q_bias), self.num_heads)
        k = split_heads(proj(key, p.k_kernel, p.k_bias), self.num_heads)
        v = split_heads(proj(value, p.v_kernel, p.v_bias), self.num_heads)
        dh = E // self.num_heads
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=prec) / jnp.sqrt(
            jnp.asarray(dh, jnp.float32)).astype(dt)
        logits = logits.astype(jnp.float32)
        if mask_bias is not None:
            logits = logits + mask_bias
        attn = jax.nn.softmax(logits, axis=-1).astype(dt)
        out = merge_heads(jnp.einsum("bhqk,bhkd->bhqd", attn, v, precision=prec))
        return proj(out, p.out_kernel, p.out_bias)


class Conv1x1(nn.Module):
    """1x1 conv with nn.Conv-compatible params ([1,1,C,E] kernel + bias) whose
    raw weights are also directly accessible - the fused cross-attention kernel
    folds input_proj into the k/v projections instead of applying it."""

    in_features: int
    features: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (1, 1, self.in_features, self.features))
        self.bias = self.param("bias", zeros, (self.features,))

    def __call__(self, x):
        w = self.kernel[0, 0].astype(self.dtype)
        return (jnp.einsum("...c,cf->...f", x.astype(self.dtype), w,
                           precision=default_precision(self.dtype))
                + self.bias.astype(self.dtype))

    def raw(self):
        return self.kernel[0, 0], self.bias


class MLP(nn.Module):
    """Simple relu MLP (ref: meanshiftformer_transformer_decoder.py:329-341)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out_dim = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out_dim, dtype=self.dtype, kernel_init=xavier,
                         precision=default_precision(self.dtype),
                         name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class MeanShiftDecoder(nn.Module):
    """The MSMFormer transformer decoder over multi-scale features."""

    num_classes: int = 2
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 6                # cfg DEC_LAYERS - 1
    mask_dim: int = 256
    in_channels: int = 64              # channels of the input feature maps
    num_feature_levels: int = 1
    enforce_input_project: bool = False
    use_meanshift_cross_attention: bool = True
    use_meanshift_self_attention: bool = True
    disable_attention_mask: bool = False
    decoder_block_norm: bool = True
    kappa: float = 30.0
    use_pallas: bool = False
    key_stride: int = 1                 # opt-in: subsample attention KEYS (see
    # config.DecoderConfig.key_stride; masks/mask_features stay full-res)
    use_meanshift_seeds: bool = False   # dormant reference path (:552-568,:904-921)
    materialize_masks: bool = True      # False: fused path returns mask_embed only
    tile_skip: bool = False             # exact data-dependent masked K-tile
    # skipping in the fused kernel (ops/fused_cross_attention.plan_tile_skip):
    # bit-identical output, saves time proportional to how much the previous
    # layer's attention masks concentrate (trained weights; random weights
    # skip ~nothing). Inference-only (the fused path already is).
    tile_skip_force_all: bool = False   # control experiment: tile_skip graph
    # (plan ops + scalar-prefetch kernel variant) with every tile certified
    # present - isolates planner-certificate drift from XLA-scheduling drift
    remat: bool = False                 # checkpoint the attention modules (training:
    # the unfused masked attention holds [B, H, Q, K] logits - 3.9 GB fp32 at
    # 480x640 batch 4 - per layer; remat recomputes them in backward instead)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_levels: List[jax.Array], mask_features: jax.Array,
                 present: Optional[jax.Array] = None):
        """x_levels: list of [B, H_l, W_l, C_in] feature maps (length
        num_feature_levels); mask_features: [B, H, W, mask_dim].

        Returns dict with pred_logits [B, Q, num_classes+1], pred_masks
        [B, Q, H, W] and aux_outputs (deep supervision, one per decoder layer).
        """
        assert len(x_levels) == self.num_feature_levels
        E, Q = self.hidden_dim, self.num_queries
        B = x_levels[0].shape[0]
        dt = self.dtype
        prec = default_precision(dt)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=dt, name=name)

        query_feat = self.param("query_feat", nn.initializers.normal(1.0), (Q, E))
        query_embed = self.param("query_embed", nn.initializers.normal(1.0), (Q, E))
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (self.num_feature_levels, E))

        # The fully fused inference path needs the RAW feature maps + projection
        # weights (it folds input_proj/level_embed into the in-kernel k/v
        # projections). Multi-level (R50/Swin) configs fuse too: the reference
        # resizes the mask LOGITS to each level's size (:1028), and bilinear
        # resize is linear so it commutes with the me contraction - resizing
        # the mask FEATURES once per level yields the same attention mask
        # (fp rounding aside; binarization-flip-robust like bf16 itself).
        fused = (self.use_pallas and self.use_meanshift_cross_attention
                 and not self.disable_attention_mask)

        has_proj = self.in_channels != E or self.enforce_input_project
        projs = [Conv1x1(in_features=self.in_channels, features=E, dtype=dt,
                         name=f"input_proj_{l}")
                 for l in range(self.num_feature_levels)] if has_proj else None

        ks = self.key_stride
        if ks > 1 and self.num_feature_levels != 1:
            raise ValueError("key_stride applies to the 1-level (UCN) configs "
                             "only; the R50 pyramid levels are already strided")

        # flatten levels: src (projected + level embed) and positional encodings.
        # key_stride > 1: keys/PE are STRIDED SUBSAMPLES of the full-resolution
        # map (each kept key keeps the exact feature + PE it has at stride 1 -
        # the trained model's key distribution, just fewer of them); mask
        # prediction stays full-resolution.
        srcs, poss, poss_flat, sizes = [], [], [], []
        xs_raw = []
        for l, x in enumerate(x_levels):
            h, w = x.shape[1], x.shape[2]
            pos = position_embedding_sine(h, w, E // 2, dtype=dt)
            if ks > 1:
                x = x[:, ::ks, ::ks]
                pos = pos[::ks, ::ks]
                h, w = x.shape[1], x.shape[2]
            sizes.append((h, w))
            poss_flat.append(pos.reshape(h * w, E))
            if fused:
                xs_raw.append(x)   # the kernel streams the (strided) raw maps
                continue
            poss.append(jnp.broadcast_to(pos.reshape(1, h * w, E), (B, h * w, E)))
            if has_proj:
                x = projs[l](x)
            srcs.append(x.reshape(B, h * w, E) + level_embed[l].astype(dt))

        if fused:
            # per-level K-minor layouts, materialized ONCE per forward (shared
            # by all layers attending that level; the kernel streams K tiles
            # with C on sublanes)
            mfc = mask_features.shape[-1]
            fused_levels = []
            for l, x in enumerate(xs_raw):
                h, w = sizes[l]
                feat_T = x.reshape(B, h * w, -1).astype(dt).transpose(0, 2, 1)
                mf_l = mask_features
                if ks > 1:
                    mf_l = mf_l[:, ::ks, ::ks]
                    if mf_l.shape[1:3] != (h, w):
                        raise ValueError(
                            f"key_stride={ks}: strided mask_features "
                            f"{mf_l.shape[1:3]} do not match the strided "
                            f"feature level ({h}, {w}); key_stride requires "
                            f"mask_features at the feature-map resolution")
                elif mf_l.shape[1:3] != (h, w):
                    # resize(me.mf) == me.resize(mf): one resize per level
                    # replaces the per-layer [B, Q, H, W] logit resize (:1028)
                    mf_l = resize_bilinear(mf_l, (h, w), align_corners=False)
                mf_T = mf_l.reshape(B, h * w, mfc).astype(dt).transpose(0, 2, 1)
                pos_T = poss_flat[l].T
                if has_proj:
                    win, b_in = projs[l].raw()
                    cin = b_in + level_embed[l]
                else:
                    win = None
                    cin = level_embed[l]
                # per-tile mask-feature bounds for tile skipping: mask features
                # are layer-invariant, so ONE reduction serves all layers' plans
                mfb = (mf_tile_bounds(mf_T, select_blocks(mf_T.shape[-1])[0])
                       if self.tile_skip else None)
                fused_levels.append((feat_T, mf_T, pos_T, win, cin, mfb))

        mask_features = mask_features.astype(dt)

        decoder_norm = ln("decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, dtype=dt, kernel_init=xavier,
                               precision=prec, name="class_embed")
        mask_embed = MLP(hidden_dim=E, output_dim=self.mask_dim, num_layers=3,
                         dtype=dt, name="mask_embed")

        def prediction_heads(output, attn_mask_target_size):
            """-> (class logits, full-res mask logits | None, attention-mask
            aux, mask_embed). mask_embed is returned so the criterion can score
            masks in FACTORED form (me x mask_features) - the materialized
            outputs_mask then survives only under stop_gradient (the attention
            mask) and costs no backward memory/compute."""
            d = decoder_norm(output)
            outputs_class = class_embed(d)
            me = mask_embed(d)
            if fused:
                # the kernel computes mask logits per tile from (me, mask
                # features); nothing full-resolution is materialized per layer
                return outputs_class, None, me, me
            outputs_mask = jnp.einsum("bqc,bhwc->bqhw", me, mask_features,
                                      precision=prec)
            if self.disable_attention_mask:
                return outputs_class, outputs_mask, None, me
            # raw mask logits at the next level's size; the attention mask is
            # sigmoid(m) < 0.5 <=> m < 0 (resolved in the attention op / kernel)
            m = outputs_mask
            if self.key_stride > 1:
                # strided subsample == computing me x mask_features at the kept
                # key positions (what the fused kernel does); NOT a resize
                m = m[:, :, ::self.key_stride, ::self.key_stride]
            elif attn_mask_target_size != m.shape[-2:]:
                m = resize_bilinear(m[..., None], attn_mask_target_size,
                                    align_corners=False)[..., 0]
            mask_logits = jax.lax.stop_gradient(m).reshape(B, Q, -1)
            return outputs_class, outputs_mask, mask_logits, me

        if self.use_meanshift_seeds:
            # initialize queries from farthest-point seeds of the last feature
            # map instead of the learned query_feat (the reference's dormant
            # use_meanshift_seeds path, ref :904-921)
            from ..ops.mean_shift import select_smart_seeds

            feat = x_levels[-1]
            X = feat.reshape(B, -1, feat.shape[-1]).astype(jnp.float32)
            seeds = jax.vmap(lambda x: select_smart_seeds(x, Q, 0)[0])(X)
            if seeds.shape[-1] != E:
                seeds = nn.Dense(E, dtype=dt, name="seed_proj")(seeds.astype(dt))
            output = seeds.astype(dt)
        else:
            output = jnp.broadcast_to(query_feat[None].astype(dt), (B, Q, E))
        qpos = jnp.broadcast_to(query_embed[None].astype(dt), (B, Q, E))

        AttnModule = nn.remat(MultiheadAttention) if self.remat else MultiheadAttention

        predictions_class, predictions_mask, predictions_embed = [], [], []
        outputs_class, outputs_mask, head_aux, me = prediction_heads(output, sizes[0])
        predictions_class.append(outputs_class)
        predictions_mask.append(outputs_mask)
        predictions_embed.append(me)

        for i in range(self.dec_layers):
            l = i % self.num_feature_levels
            # cross-attention first (Mask2Former ordering)
            attn = AttnModule(
                embed_dim=E, num_heads=self.nheads,
                meanshift=self.use_meanshift_cross_attention,
                kappa=self.kappa, use_pallas=self.use_pallas,
                tile_skip_force_all=self.tile_skip_force_all, dtype=dt,
                name=f"cross_attn_{i}")
            if fused:
                # head_aux is the previous prediction head's mask embed
                feat_T, mf_T, pos_T, win, cin, mfb = fused_levels[l]
                tgt2 = attn(output + qpos, None, None,
                            fused_inputs=(feat_T, mf_T, head_aux,
                                          pos_T, win, cin, mfb),
                            present=present)
            else:
                tgt2 = attn(output + qpos, srcs[l] + poss[l], srcs[l],
                            mask_logits=None if self.disable_attention_mask
                            else head_aux)
            output = ln(f"cross_norm_{i}")(output + tgt2)

            qk = output + qpos
            tgt2 = AttnModule(
                embed_dim=E, num_heads=self.nheads,
                meanshift=self.use_meanshift_self_attention,
                kappa=self.kappa, dtype=dt, name=f"self_attn_{i}")(qk, qk, output)
            output = ln(f"self_norm_{i}")(output + tgt2)

            # FFN
            tgt2 = nn.Dense(self.dim_feedforward, dtype=dt, kernel_init=xavier,
                            precision=prec, name=f"ffn_lin1_{i}")(output)
            tgt2 = nn.Dense(E, dtype=dt, kernel_init=xavier, precision=prec,
                            name=f"ffn_lin2_{i}")(nn.relu(tgt2))
            output = ln(f"ffn_norm_{i}")(output + tgt2)

            if self.decoder_block_norm:
                output = l2_normalize(output, axis=-1)

            outputs_class, outputs_mask, head_aux, me = prediction_heads(
                output, sizes[(i + 1) % self.num_feature_levels])
            predictions_class.append(outputs_class)
            predictions_mask.append(outputs_mask)
            predictions_embed.append(me)

        if fused:
            # Final-layer masks only; the per-layer (aux) full-resolution mask
            # einsums are inference dead weight. mask_embed lets callers build
            # masks for just the top-k selected queries (instance_inference);
            # with materialize_masks=False even the final full-Q einsum is
            # skipped (the pipeline computes masks for the top-k selection).
            out = {
                "pred_logits": predictions_class[-1],
                "mask_embed": head_aux,
                "aux_outputs": [{"pred_logits": c} for c in predictions_class[:-1]],
            }
            if self.materialize_masks:
                out["pred_masks"] = jnp.einsum("bqc,bhwc->bqhw", head_aux,
                                               mask_features, precision=prec)
            return out
        return {
            "pred_logits": predictions_class[-1],
            "pred_masks": predictions_mask[-1],
            "mask_embed": predictions_embed[-1],
            "aux_outputs": [
                {"pred_logits": c, "pred_masks": m, "mask_embed": e}
                for c, m, e in zip(predictions_class[:-1], predictions_mask[:-1],
                                   predictions_embed[:-1])
            ],
        }


class StandardTransformerDecoder(nn.Module):
    """DETR-style baseline decoder (ref: maskformer_transformer_decoder.py
    StandardTransformerDecoder + transformer_decoder/transformer.py): queries
    start at zero, standard (non-meanshift, unmasked) cross/self attention over
    the last feature level, post-norm, deep supervision."""

    num_classes: int = 2
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 6
    mask_dim: int = 256
    in_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_levels, mask_features):
        E, Q = self.hidden_dim, self.num_queries
        x = x_levels[-1]
        B, h, w, _ = x.shape
        dt = self.dtype
        prec = default_precision(dt)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=dt, name=name)

        query_embed = self.param("query_embed", nn.initializers.normal(1.0), (Q, E))
        pos = position_embedding_sine(h, w, E // 2, dtype=dt)
        pos = jnp.broadcast_to(pos.reshape(1, h * w, E), (B, h * w, E))
        if self.in_channels != E:
            x = nn.Conv(E, (1, 1), dtype=dt, precision=prec, name="input_proj")(x)
        src = x.reshape(B, h * w, E)

        mask_features = mask_features.astype(dt)
        decoder_norm = ln("decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, dtype=dt, kernel_init=xavier,
                               precision=prec, name="class_embed")
        mask_embed = MLP(hidden_dim=E, output_dim=self.mask_dim, num_layers=3,
                         dtype=dt, name="mask_embed")

        qpos = jnp.broadcast_to(query_embed[None].astype(dt), (B, Q, E))
        output = jnp.zeros((B, Q, E), dt)   # DETR queries start at zero

        preds_class, preds_mask = [], []
        for i in range(self.dec_layers):
            qk = output + qpos
            tgt2 = MultiheadAttention(embed_dim=E, num_heads=self.nheads,
                                      meanshift=False, dtype=dt,
                                      name=f"self_attn_{i}")(qk, qk, output)
            output = ln(f"self_norm_{i}")(output + tgt2)
            tgt2 = MultiheadAttention(embed_dim=E, num_heads=self.nheads,
                                      meanshift=False, dtype=dt,
                                      name=f"cross_attn_{i}")(
                output + qpos, src + pos, src)
            output = ln(f"cross_norm_{i}")(output + tgt2)
            tgt2 = nn.Dense(self.dim_feedforward, dtype=dt, kernel_init=xavier,
                            precision=prec, name=f"ffn_lin1_{i}")(output)
            tgt2 = nn.Dense(E, dtype=dt, kernel_init=xavier, precision=prec,
                            name=f"ffn_lin2_{i}")(nn.relu(tgt2))
            output = ln(f"ffn_norm_{i}")(output + tgt2)

            d = decoder_norm(output)
            preds_class.append(class_embed(d))
            me = mask_embed(d)
            preds_mask.append(jnp.einsum("bqc,bhwc->bqhw", me, mask_features,
                                         precision=prec))

        return {
            "pred_logits": preds_class[-1],
            "pred_masks": preds_mask[-1],
            "aux_outputs": [
                {"pred_logits": c, "pred_masks": m}
                for c, m in zip(preds_class[:-1], preds_mask[:-1])
            ],
        }


# decoder registry (replaces detectron2's TRANSFORMER_DECODER_REGISTRY)
DECODERS = {
    "PretrainedMeanShiftTransformerDecoder": MeanShiftDecoder,
    "MeanShiftTransformerDecoder": MeanShiftDecoder,       # 3-level via config
    "MultiScaleMaskedTransformerDecoder": MeanShiftDecoder,  # meanshift flags off
    "StandardTransformerDecoder": StandardTransformerDecoder,
}
