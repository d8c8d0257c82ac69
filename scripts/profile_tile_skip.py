"""Masked K-tile skipping: occupancy sweep on the real chip.

The skip plan elides K tiles certified all-masked for every query (exact;
tests/test_tile_skip.py). Random weights leave every tile occupied, so the
sweep constructs CONCENTRATED mask embeds/features - channel 0 of the mask
features is +1 on the closed region and -1 on the open region, every query
weights it -5 (ref mask semantics: masked iff me.mf < 0,
meanshiftformer_transformer_decoder.py:1028-1033) - and runs the REAL planner
(plan_tile_skip) + kernel at the flagship stage-1 shape. Reported per
occupancy rho: measured present-tile fraction, per-layer ms (plan + kernel),
speedup vs the full kernel, and a projected two-stage img/s assuming both
stages' decoders skip at rho (non-decoder wall from bench.py held fixed).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unseenobjectswithmeanshift_tpu.ops.fused_cross_attention import (
    fused_uoms_cross_attention, mf_tile_bounds, plan_tile_skip, select_blocks,
)

# measured on the chip (bench.py, scripts/profile_glue.py round 2):
# 127.2 ms/batch full pipeline, of which the 12 decoder layers (6 stage-1 at
# 5.7 ms + 6 crop at 7.3 ms) are kernel time; the rest is backbones + glue.
FULL_MS = 127.2
DEC_MS = 6 * 5.7 + 6 * 7.3
B_IMGS = 4


def concentrated(rng, B, K, Cm, Q, open_frac, block_k):
    """mask features/embeds whose open (unmasked) region is the first
    open_frac of K, tile-aligned; remaining channels carry small noise."""
    mf = rng.randn(B, Cm, K).astype(np.float32) * 0.02
    me = rng.randn(B, Q, Cm).astype(np.float32) * 0.02
    n_open = int(round(open_frac * K / block_k)) * block_k
    n_open = max(block_k, min(K, n_open))
    mf[:, 0, :] = 1.0
    mf[:, 0, :n_open] = -1.0
    me[:, :, 0] = -5.0
    return mf, me


def bench(B=4, K=307200, iters=30, layers=6):
    H, Q, D, C, Cm, E = 8, 100, 32, 64, 256, 256
    bk, bb = select_blocks(K)
    T = -(-K // bk)
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    base = dict(
        qn=jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32)).astype(dt),
        featT=jnp.asarray(rng.randn(B, C, K).astype(np.float32) * .3).astype(dt),
        posT=jnp.asarray(rng.randn(E, K).astype(np.float32) * .3).astype(dt),
        awk=jnp.asarray(rng.randn(C, E).astype(np.float32) * .2).astype(dt),
        awv=jnp.asarray(rng.randn(C, E).astype(np.float32) * .2).astype(dt),
        wk=jnp.asarray(rng.randn(E, E).astype(np.float32) * .1).astype(dt),
        ck=jnp.asarray(rng.randn(E).astype(np.float32) * .1).astype(dt),
        cv=jnp.asarray(rng.randn(E).astype(np.float32) * .1).astype(dt),
    )

    from functools import partial

    @partial(jax.jit, static_argnames=("skip",))
    def run(qn, featT, mfT, me, posT, awk, awv, wk, ck, cv, skip=True):
        # `layers` chained (plan + kernel) calls like the decoder: the plan is
        # rebuilt per layer from me (mask embeds change per layer); the
        # mf bounds are layer-invariant and hoisted like the decoder does
        mfb = mf_tile_bounds(mfT, bk) if skip else None
        out = qn
        for _ in range(layers):
            plan = (plan_tile_skip(me, mfb[0], mfb[1], bb)
                    if skip else None)
            out = fused_uoms_cross_attention(
                out, featT, mfT, me, posT, awk, awv, wk, ck, cv,
                tile_plan=plan, block_k=bk, block_b=bb)
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-6)
        return jnp.sum(out.astype(jnp.float32))

    def time_one(mf, me, skip):
        args = dict(base, mfT=jnp.asarray(mf).astype(dt),
                    me=jnp.asarray(me).astype(dt))
        np.asarray(run(**args, skip=skip))
        t0 = time.perf_counter()
        outs = [run(**args, skip=skip) for _ in range(iters)]
        np.asarray(outs[-1])
        return (time.perf_counter() - t0) / iters * 1000 / layers  # ms/layer

    print(f"# flagship stage-1 kernel shape: B={B} K={K} bk={bk} T={T}; "
          f"{layers} chained layers, per-layer ms shown")
    print(f"# {'rho':>6} {'present':>9} {'full':>8} {'skip':>8} "
          f"{'speedup':>8} {'proj img/s':>11}")
    for rho in (1.0, 0.5, 0.25, 0.125):
        mf, me = concentrated(rng, B, K, Cm, Q, rho, bk)
        plan = plan_tile_skip(jnp.asarray(me), *mf_tile_bounds(jnp.asarray(mf), bk), bb)
        frac = float(np.asarray(plan.n_present).mean()) / T
        t_full = time_one(mf, me, skip=False)
        t_skip = time_one(mf, me, skip=True)
        # projection: every decoder layer (both stages) scales by the same
        # per-layer ratio; non-decoder wall unchanged
        proj = B_IMGS / ((FULL_MS - DEC_MS + DEC_MS * t_skip / t_full) / 1000)
        print(f"# {rho:6.3f} {frac:8.1%} {t_full:7.2f} {t_skip:7.2f} "
              f"{t_full / t_skip:7.2f}x {proj:10.1f}")
    # dense random masks: planner overhead must be ~zero (no regression)
    mf = rng.randn(B, Cm, K).astype(np.float32) * .3
    me = rng.randn(B, Q, Cm).astype(np.float32)
    t_full = time_one(mf, me, skip=False)
    t_skip = time_one(mf, me, skip=True)
    print(f"# dense random masks (bench regime): full {t_full:.2f} skip "
          f"{t_skip:.2f} ms/layer (overhead {(t_skip / t_full - 1):+.1%})")


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}")
    bench()
