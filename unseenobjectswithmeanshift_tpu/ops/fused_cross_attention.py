"""Fully-fused hypersphere cross-attention - everything from the feature map to
the attention output in ONE Pallas TPU kernel.

The MSMFormer decoder cross-attends 100 queries against the FULL-resolution
feature map (480x640 = 307k keys per image; the UCN backbone upsamples to input
size, ref: lib/networks/resnet_dilated.py Resnet34_8s.forward). The unfused
formulation materializes, PER LAYER, the 256-d key sum (src+pos), the k and v
projections and the [B, Q, K] attention-mask logits in HBM - ~2.5 GB of traffic
per layer at batch 4. This kernel streams the 64-channel normalized feature map
and the mask-feature map (in K-minor layout, materialized ONCE per forward and
shared by all 6 layers) and computes per K-tile in VMEM:

  kT = (Win Wk)^T fT + Wk^T posT + ck        (input_proj FOLDED into the k/v
  vT = (Win Wv)^T fT + cv                     projection: f is 64-d, not 256-d)
  k^ = per-head L2 normalize(kT)              ([H, D, bk]: head/dim on sublanes)
  mask_logit = me @ mfT                       (the reference's einsum("bqc,bchw")
                                               + sigmoid<0.5 threshold, ref:
                                               meanshiftformer_transformer_decoder.py:1028-1033)
  p_u = exp2(c'*s - c'), s = q.k^             (fixed max: logits <= kappa by
                                               construction - softmax is shift
                                               invariant, no running max)
  p_m = p_u * (mask_logit >= 0)
  acc_m += p_m @ [v | 1] ; acc_u += p_u @ [v | 1]

Every per-head operation is ONE batched 3D dot (Mosaic's per-op overhead is
what limited a per-head-unrolled variant), and the l-sums ride the pv matmuls
as an appended all-ones v row - the MXU computes them for free.

The unmasked accumulator implements the reference's all-masked-row guard
(ref :970: rows whose mask removes every key attend to everything) EXACTLY and
online: at finalize, rows with sum(p_m) == 0 take acc_u / l_u.

The positional-encoding projection (Wk^T posT, batch-shared) is computed once
per K tile with the batch looped INSIDE the kernel, so it is never materialized
in HBM and never recomputed per image.

Semantics (q/k normalization, kappa scaling, mask threshold, guard) mirror
hypersphere_attention (ref: attention_util.py:30-82) - validated against
fused_uoms_cross_attention_reference and the torch oracle in
tests/test_fused_cross_attention.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634


def _round_up(x, m):
    return -(-x // m) * m


def _kernel(present_ref, qn_ref, me_ref, fT_ref, mfT_ref, posT_ref, awkT_ref,
            awvT_ref, wkT_ref, ck_ref, cv_ref, out_ref, accm, accu,
            *, kappa: float, num_heads: int, head_dim: int, bc: int,
            kv_len: int, block_k: int):
    kb = pl.program_id(1)
    nkb = pl.num_programs(1)
    H, D = num_heads, head_dim
    E = H * D
    padded = kv_len % block_k != 0

    @pl.when(kb == 0)
    def _init():
        accm[:] = jnp.zeros_like(accm)
        accu[:] = jnp.zeros_like(accu)

    # batch-shared positional projection for this K tile: [E, bk] fp32
    PT = jax.lax.dot_general(wkT_ref[:], posT_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    PT = PT + ck_ref[:].astype(jnp.float32)        # ck folds input-proj consts

    if padded:
        k_idx = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        pad_f = (k_idx < kv_len).astype(fT_ref.dtype)   # [1, bk] 1=real key

    cb = pl.program_id(0)
    for b in range(bc):
        @pl.when(present_ref[cb * bc + b] != 0)
        def _one_image(b=b):
            fT = fT_ref[b]                          # [C, bk]
            mfT = mfT_ref[b]                        # [Cm, bk]
            me = me_ref[b]                          # [Qp, Cm]
            # k/v projections in VMEM (input_proj folded into awkT/awvT)
            kT = jax.lax.dot_general(awkT_ref[:], fT, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) + PT
            vT = jax.lax.dot_general(awvT_ref[:], fT, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            vT = vT + cv_ref[:].astype(jnp.float32)  # [E, bk]

            # per-head L2 normalize over D (leading-dim view [H, D, bk] is free)
            kh = kT.reshape(H, D, block_k)
            inv = jax.lax.rsqrt(jnp.sum(kh * kh, axis=1, keepdims=True) + 1e-24)
            khn = (kh * inv).astype(fT.dtype)       # [H, D, bk]

            # attention-mask logits: masked iff me . mf < 0  (sigmoid < 0.5)
            mlog = jax.lax.dot_general(me, mfT, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            mask_f = (mlog >= 0).astype(fT.dtype)   # [Qp, bk]
            if padded:
                mask_f = mask_f * pad_f

            q = qn_ref[b]                           # [H, Qp, D]
            s = jax.lax.dot_general(q, khn, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            c = kappa * LOG2E
            # exp2(c*s - c) in [0, 1]: exact fixed-max softmax weights
            p_u = jnp.exp2(c * s - c).astype(fT.dtype)   # [H, Qp, bk]
            if padded:
                p_u = p_u * pad_f
            p_m = p_u * mask_f                      # mask shared across heads

            # [v | ones]: column D of the pv product is the softmax denominator
            v1 = jnp.concatenate(
                [vT.reshape(H, D, block_k).astype(fT.dtype),
                 jnp.ones((H, 1, block_k), fT.dtype)], axis=1)   # [H, D+1, bk]
            accm[b] = accm[b] + jax.lax.dot_general(
                p_m, v1, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # [H, Qp, D+1]

            # The unmasked (guard) accumulator is only consumed by queries whose
            # mask removed EVERY key. Once every query has unmasked mass
            # (min l_m > 0, including this tile), no query can end all-masked,
            # so the second pv matmul is skipped for all remaining tiles -
            # data-dependent and exact.
            need_guard = jnp.min(accm[b][:, :, D]) <= 0.0

            @pl.when(need_guard)
            def _guard_acc():
                accu[b] = accu[b] + jax.lax.dot_general(
                    p_u, v1, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)

    @pl.when(kb == nkb - 1)
    def _finalize():
        l_m = accm[:, :, :, D:D + 1]                # ones-row sums
        l_u = accu[:, :, :, D:D + 1]
        guard = l_m <= 0.0                          # all keys masked -> attend all
        num = jnp.where(guard, accu[:, :, :, :D], accm[:, :, :, :D])
        den = jnp.where(guard, l_u, l_m)
        out_ref[:] = (num / jnp.maximum(den, 1e-30)).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("kappa", "block_k", "block_b", "interpret"))
def fused_uoms_cross_attention(qn, featT, mfT, me, posT, awk, awv, wk, ck, cv,
                               present=None, kappa: float = 30.0,
                               block_k: int = 1024, block_b: int = 4,
                               interpret: bool = False):
    """qn: [B, H, Q, D] L2-normalized projected queries; featT: [B, C, K]
    K-minor flattened (normalized) feature map; mfT: [B, Cm, K] K-minor mask
    features; me: [B, Q, Cm] mask-embed output of the previous layer;
    posT: [E, K] positional encoding (batch-shared, K-minor); awk/awv: [C, E]
    feature->k/v kernels (input_proj folded); wk: [E, E] pos->k kernel;
    ck/cv: [E] constants (level_embed / biases folded); present: optional [B]
    bool - batch entries marked absent SKIP all compute (their output is zero;
    used for empty RoI-crop slots whose results are discarded downstream).
    Returns [B, H, Q, D] UN-normalized attention output with the
    all-masked-row guard applied (caller L2-normalizes and applies the out
    projection)."""
    B, H, Q, D = qn.shape
    C, K = featT.shape[1], featT.shape[2]
    Cm = mfT.shape[1]
    E = awk.shape[1]
    Qp = _round_up(max(Q, 8), 8)
    Kp = _round_up(K, block_k)
    bc = min(block_b, B)
    Bp = _round_up(B, bc)

    if Qp != Q:
        qn = jnp.pad(qn, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
        me = jnp.pad(me, ((0, 0), (0, Qp - Q), (0, 0)))
    if Kp != K:
        featT = jnp.pad(featT, ((0, 0), (0, 0), (0, Kp - K)))
        mfT = jnp.pad(mfT, ((0, 0), (0, 0), (0, Kp - K)))
        posT = jnp.pad(posT, ((0, 0), (0, Kp - K)))
    if Bp != B:
        qn = jnp.pad(qn, ((0, Bp - B), (0, 0), (0, 0), (0, 0)))
        me = jnp.pad(me, ((0, Bp - B), (0, 0), (0, 0)))
        featT = jnp.pad(featT, ((0, Bp - B), (0, 0), (0, 0)))
        mfT = jnp.pad(mfT, ((0, Bp - B), (0, 0), (0, 0)))

    # transposed weights so every in-kernel product is K-minor
    awkT = awk.T
    awvT = awv.T
    wkT = wk.T
    ck2 = ck.reshape(E, 1)
    cv2 = cv.reshape(E, 1)
    if present is None:
        present_i = jnp.ones((Bp,), jnp.int32)
    else:
        present_i = jnp.pad(present.astype(jnp.int32), (0, Bp - B))
    grid = (Bp // bc, Kp // block_k)

    out = pl.pallas_call(
        partial(_kernel, kappa=float(kappa), num_heads=H, head_dim=D, bc=bc,
                kv_len=K, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bp,), lambda c, kb: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bc, H, Qp, D), lambda c, kb: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, Qp, Cm), lambda c, kb: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, C, block_k), lambda c, kb: (c, 0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, Cm, block_k), lambda c, kb: (c, 0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, block_k), lambda c, kb: (0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, C), lambda c, kb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, C), lambda c, kb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, E), lambda c, kb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 1), lambda c, kb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 1), lambda c, kb: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc, H, Qp, D), lambda c, kb: (c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, H, Qp, D), qn.dtype),
        scratch_shapes=[
            pltpu.VMEM((bc, H, Qp, D + 1), jnp.float32),  # masked acc (+l col)
            pltpu.VMEM((bc, H, Qp, D + 1), jnp.float32),  # unmasked acc (+l col)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(present_i, qn, me, featT, mfT, posT, awkT, awvT, wkT, ck2, cv2)
    return out[:B, :, :Q, :]


def fused_uoms_cross_attention_reference(qn, featT, mfT, me, posT, awk, awv, wk,
                                         ck, cv, kappa: float = 30.0):
    """Pure-JAX oracle with identical semantics (fp32 math)."""
    f32 = jnp.float32
    feat = featT.transpose(0, 2, 1)       # [B, K, C]
    mf = mfT.transpose(0, 2, 1)           # [B, K, Cm]
    pos = posT.T                          # [K, E]
    k = (jnp.einsum("bkc,ce->bke", feat.astype(f32), awk.astype(f32))
         + jnp.einsum("ke,ef->kf", pos.astype(f32), wk.astype(f32))[None]
         + ck.astype(f32))
    v = jnp.einsum("bkc,ce->bke", feat.astype(f32), awv.astype(f32)) + cv.astype(f32)
    B, K, E = k.shape
    H = qn.shape[1]
    D = E // H
    kh = k.reshape(B, K, H, D).transpose(0, 2, 1, 3)      # [B, H, K, D]
    vh = v.reshape(B, K, H, D).transpose(0, 2, 1, 3)
    kn = kh / jnp.sqrt(jnp.sum(kh * kh, axis=-1, keepdims=True) + 1e-24)
    mlog = jnp.einsum("bqc,bkc->bqk", me.astype(f32), mf.astype(f32))
    masked = mlog < 0                                      # [B, Q, K]
    unmask = jnp.all(masked, axis=-1, keepdims=True)       # guard
    bias = jnp.where(masked & ~unmask, -jnp.inf, 0.0)[:, None]
    logits = kappa * jnp.einsum("bhqd,bhkd->bhqk", qn.astype(f32), kn)
    attn = jax.nn.softmax(logits + bias, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, vh).astype(qn.dtype)
