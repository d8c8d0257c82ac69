"""Fused masked hypersphere attention - Pallas TPU kernel (flash-attention style).

The flagship MSMFormer configuration cross-attends 100 queries against the FULL-
resolution feature map (480x640 = 307,200 keys; the UCN backbone upsamples to
input size, ref: lib/networks/resnet_dilated.py Resnet34_8s.forward). A naive XLA
formulation materializes [B, 8, 100, 307200] logits + attention weights in HBM
(~2.5 GB fp32 per image per layer) - this kernel streams K in blocks with an
online softmax so nothing bigger than a [128, block_k] tile ever leaves VMEM.

Fusions beyond standard flash attention:
- the attention mask is derived INSIDE the kernel from the previous layer's mask
  logits: masked where interp(mask_logits) < 0, i.e. sigmoid < 0.5
  (ref: meanshiftformer_transformer_decoder.py:1028-1033), shared across heads
- the all-masked-row guard (ref :970) enters as a per-query 'unmask' bit
- kappa scaling (ref: attention_util.py:30-82); q/k are pre-normalized outside
  (cheap elementwise), the output L2-normalization also happens outside on the
  tiny [B, Q, E] result.

Grid: (batch, num_k_blocks); each step processes ALL heads so the (head-shared)
mask tile is read once. Accumulators live in VMEM scratch across the K sweep.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(qn_ref, kT_ref, vT_ref, mask_ref, unmask_ref, out_ref,
                  l_scr, acc_scr, *, kappa: float, num_heads: int,
                  kv_len: int, block_k: int):
    """Online-softmax sweep over K blocks with a FIXED max: logits are
    kappa * cos(q, k) <= kappa by construction, so exp(s - kappa) is always in
    [0, 1] and no running-max bookkeeping is needed (exact, not approximate -
    softmax is shift invariant). All heads are processed by batched dots so the
    (head-shared) mask tile is materialized once per step.

    DMA-minimizing fusions: k arrives RAW and TRANSPOSED [H, D, bk] (K minor -
    a D=32-minor layout wastes 4x tile bandwidth) and is L2-normalized on the
    tile in VMEM; the mask is the raw mask-logits tile, compared against 0 here
    (masked iff logit < 0 <=> sigmoid < 0.5) - neither a normalized-k copy nor
    a bias tensor ever exists in HBM."""
    kb = pl.program_id(1)
    nkb = pl.num_programs(1)

    @pl.when(kb == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # per-key mask, shared across heads; padded keys (k_idx >= kv_len) masked
    mask_tile = mask_ref[0].astype(jnp.float32)          # [Qp, bk]
    unmask = unmask_ref[0].astype(jnp.float32)           # [Qp, 1]
    k_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, mask_tile.shape, 1)
    masked = ((mask_tile < 0) & (unmask < 0.5)) | (k_idx >= kv_len)

    q = qn_ref[0]                                        # [H, Qp, D] normalized
    kT = kT_ref[0].astype(jnp.float32)                   # [H, D, bk] raw
    vT = vT_ref[0]                                       # [H, D, bk]
    # in-tile L2 normalization of k over D
    inv = jax.lax.rsqrt(jnp.sum(kT * kT, axis=1, keepdims=True) + 1e-24)
    kn = (kT * inv).astype(q.dtype)
    s = jax.lax.dot_general(q, kn, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)   # [H, Qp, bk]
    p = jnp.where(masked[None], 0.0, jnp.exp(kappa * s - kappa))  # <= 1, exact
    l_scr[:] = l_scr[:] + jnp.sum(p, axis=-1)                      # [H, Qp]
    pv = jax.lax.dot_general(p.astype(vT.dtype), vT,
                             (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)   # [H, Qp, D]
    acc_scr[:] = acc_scr[:] + pv

    @pl.when(kb == nkb - 1)
    def _finalize():
        l = l_scr[:][:, :, None]
        out_ref[0] = (acc_scr[:] / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


def _round_up(x, m):
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("kappa", "block_k", "interpret",
                                   "kv_transposed", "k_normalized"))
def masked_hypersphere_attention(qn, k, v, mask_logits, kappa: float = 30.0,
                                 block_k: int = 1024, interpret: bool = False,
                                 kv_transposed: bool = False,
                                 k_normalized: bool = True):
    """qn: [B, H, Q, D] L2-normalized per head. k and v are [B, H, K, D], or
    [B, H, D, K] when kv_transposed=True (the layout the kernel streams -
    producing them transposed straight from the projections avoids two
    full-tensor transposes). k may be RAW (k_normalized=False): the kernel
    L2-normalizes tiles in VMEM, saving a full normalized copy in HBM.
    mask_logits: [B, Q, K] (attend iff >= 0; fully-negative rows are unmasked -
    the decoder's degenerate-mask guard). Returns [B, H, Q, D] UN-normalized
    attention output (caller applies the final L2 normalization).

    Note: the kernel always normalizes k tiles; passing k_normalized=True is
    harmless (normalizing twice is idempotent) but wasteful - prefer raw k.
    """
    B, H, Q, D = qn.shape
    K = k.shape[3] if kv_transposed else k.shape[2]
    Qp = _round_up(max(Q, 8), 8)
    Kp = _round_up(K, block_k)

    if Qp != Q:
        qn = jnp.pad(qn, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
        mask_logits = jnp.pad(mask_logits, ((0, 0), (0, Qp - Q), (0, 0)))

    # all-masked-row guard over the REAL keys (tiny [B, Q] reduction)
    unmask = jnp.all(mask_logits[..., :K] < 0, axis=-1)[..., None]
    unmask = unmask.astype(jnp.float32)                  # [B, Qp, 1]

    if kv_transposed:
        knT, vT = k, v
        if Kp != K:
            knT = jnp.pad(knT, ((0, 0), (0, 0), (0, 0), (0, Kp - K)))
            vT = jnp.pad(vT, ((0, 0), (0, 0), (0, 0), (0, Kp - K)))
            mask_logits = jnp.pad(mask_logits, ((0, 0), (0, 0), (0, Kp - K)))
    else:
        if Kp != K:
            k = jnp.pad(k, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
            mask_logits = jnp.pad(mask_logits, ((0, 0), (0, 0), (0, Kp - K)))
        # stream K as the minor axis (see kernel docstring)
        knT = k.transpose(0, 1, 3, 2)                    # [B, H, D, Kp]
        vT = v.transpose(0, 1, 3, 2)

    nkb = Kp // block_k
    grid = (B, nkb)

    out = pl.pallas_call(
        partial(_flash_kernel, kappa=float(kappa), num_heads=H, kv_len=K,
                block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, Qp, D), lambda b, kb: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, D, block_k), lambda b, kb: (b, 0, 0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, D, block_k), lambda b, kb: (b, 0, 0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qp, block_k), lambda b, kb: (b, 0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qp, 1), lambda b, kb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Qp, D), lambda b, kb: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), qn.dtype),
        scratch_shapes=[
            pltpu.VMEM((H, Qp), jnp.float32),       # running sum
            pltpu.VMEM((H, Qp, D), jnp.float32),    # accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(qn, knT, vT, mask_logits, unmask)
    return out[:, :, :Q, :]


def masked_hypersphere_attention_reference(qn, kn, v, mask_logits,
                                           kappa: float = 30.0):
    """Pure-JAX oracle with identical semantics (tests compare against this and
    against the torch oracle)."""
    K = kn.shape[2]
    masked = mask_logits < 0                                     # [B, Q, K]
    unmask = jnp.all(masked, axis=-1, keepdims=True)
    bias = jnp.where(masked & ~unmask, NEG_INF, 0.0)[:, None]    # [B, 1, Q, K]
    logits = kappa * jnp.einsum("bhqd,bhkd->bhqk", qn, kn,
                                precision=jax.lax.Precision.HIGHEST)
    attn = jax.nn.softmax(logits.astype(jnp.float32) + bias, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Fully fused variant: k/v PROJECTIONS inside the kernel.
#
# The decoder's cross-attention reads the flattened feature map three times per
# layer in the unfused form (k-proj, v-proj, then the kernel re-reads both
# projections) - at stage-2 scale (80 crops x 50k keys x 256) that is ~10 GB of
# HBM traffic per layer. Here the kernel streams the SOURCE tiles once and
# computes k = (src + pos) @ Wk, v = src @ Wv per tile in VMEM (the reference
# adds positional encodings to keys but not values,
# ref: MeanShiftCrossAttentionLayer forward_post :250-253).
# ---------------------------------------------------------------------------


def _fused_flash_kernel(qn_ref, base_ref, pos_ref, wk_ref, bk_ref, wv_ref,
                        bv_ref, mask_ref, unmask_ref, out_ref, l_scr, acc_scr,
                        *, kappa: float, num_heads: int, head_dim: int,
                        kv_len: int, block_k: int):
    kb = pl.program_id(1)
    nkb = pl.num_programs(1)
    H, D = num_heads, head_dim

    @pl.when(kb == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    mask_tile = mask_ref[0].astype(jnp.float32)          # [Qp, bk]
    unmask = unmask_ref[0].astype(jnp.float32)           # [Qp, 1]
    k_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, mask_tile.shape, 1)
    masked = ((mask_tile < 0) & (unmask < 0.5)) | (k_idx >= kv_len)

    base = base_ref[0]                                   # [bk, E]
    pos = pos_ref[:]                                     # [bk, E]
    keyin = base + pos
    k_all = jax.lax.dot_general(keyin, wk_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    k_all = k_all + bk_ref[:].astype(jnp.float32)        # [bk, H*D]
    v_all = jax.lax.dot_general(base, wv_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    v_all = (v_all + bv_ref[:].astype(jnp.float32)).astype(base.dtype)

    for h in range(H):
        kh = k_all[:, h * D:(h + 1) * D]                 # [bk, D] fp32
        inv = jax.lax.rsqrt(jnp.sum(kh * kh, axis=1, keepdims=True) + 1e-24)
        knh = (kh * inv).astype(qn_ref.dtype)
        q = qn_ref[0, h]                                 # [Qp, D]
        s = jax.lax.dot_general(q, knh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [Qp, bk]
        p = jnp.where(masked, 0.0, jnp.exp(kappa * s - kappa))
        l_scr[h] = l_scr[h] + jnp.sum(p, axis=-1)
        vh = v_all[:, h * D:(h + 1) * D]                 # [bk, D]
        pv = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[h] = acc_scr[h] + pv

    @pl.when(kb == nkb - 1)
    def _finalize():
        l = l_scr[:][:, :, None]
        out_ref[0] = (acc_scr[:] / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("kappa", "block_k", "interpret"))
def fused_masked_hypersphere_attention(qn, base, pos, wk, bk, wv, bv,
                                       mask_logits, kappa: float = 30.0,
                                       block_k: int = 1024,
                                       interpret: bool = False):
    """qn: [B, H, Q, D] normalized projected queries; base: [B, K, E] flattened
    features (+ level embed); pos: [K, E] positional encoding (batch-shared);
    wk/wv: [E, H*D] projection kernels; bk/bv: [H*D] biases;
    mask_logits: [B, Q, K]. Returns [B, H, Q, D] un-normalized output."""
    B, H, Q, D = qn.shape
    K = base.shape[1]
    E = base.shape[2]
    Qp = _round_up(max(Q, 8), 8)
    Kp = _round_up(K, block_k)

    if Qp != Q:
        qn = jnp.pad(qn, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
        mask_logits = jnp.pad(mask_logits, ((0, 0), (0, Qp - Q), (0, 0)))
    unmask = jnp.all(mask_logits[..., :K] < 0, axis=-1)[..., None]
    unmask = unmask.astype(jnp.float32)

    if Kp != K:
        base = jnp.pad(base, ((0, 0), (0, Kp - K), (0, 0)))
        pos = jnp.pad(pos, ((0, Kp - K), (0, 0)))
        mask_logits = jnp.pad(mask_logits, ((0, 0), (0, 0), (0, Kp - K)))

    out = pl.pallas_call(
        partial(_fused_flash_kernel, kappa=float(kappa), num_heads=H,
                head_dim=D, kv_len=K, block_k=block_k),
        grid=(B, Kp // block_k),
        in_specs=[
            pl.BlockSpec((1, H, Qp, D), lambda b, kb: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, E), lambda b, kb: (b, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, E), lambda b, kb: (kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, H * D), lambda b, kb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H * D,), lambda b, kb: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, H * D), lambda b, kb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H * D,), lambda b, kb: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qp, block_k), lambda b, kb: (b, 0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qp, 1), lambda b, kb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Qp, D), lambda b, kb: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), qn.dtype),
        scratch_shapes=[
            pltpu.VMEM((H, Qp), jnp.float32),
            pltpu.VMEM((H, Qp, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(qn, base, pos, wk, bk, wv, bv, mask_logits, unmask)
    return out[:, :, :Q, :]
