"""Fused cross-attention kernel on the real TPU: correctness vs reference +
per-layer timing at flagship (stage-1) and crop (stage-2) shapes."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, iters=5):
    import jax
    r = fn(*args)
    np.asarray(r.ravel()[0:1])
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(r.ravel()[0:1])
        best = min(best, time.perf_counter() - t0)
    return best, r


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from unseenobjectswithmeanshift_tpu.ops.fused_cross_attention import (
        fused_uoms_cross_attention, fused_uoms_cross_attention_reference,
    )
    from functools import partial

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    f0 = jax.jit(lambda x: x + 1.0)
    floor, _ = timed(f0, (jnp.zeros((8, 128), dt),))
    print(f"sync floor: {floor*1000:.2f} ms")

    def run(B, K, tag, check=False, block_k=1024, block_b=4):
        H, Q, D, C, Cm, E = 8, 100, 32, 64, 256, 256
        qn = rng.randn(B, H, Q, D).astype(np.float32)
        qn /= np.linalg.norm(qn, axis=-1, keepdims=True)
        args = [
            jnp.asarray(qn).astype(dt),
            jnp.asarray(rng.randn(B, C, K).astype(np.float32) * 0.3).astype(dt),
            jnp.asarray(rng.randn(B, Cm, K).astype(np.float32) * 0.3).astype(dt),
            jnp.asarray(rng.randn(B, Q, Cm).astype(np.float32) * 2).astype(dt),
            jnp.asarray(rng.randn(E, K).astype(np.float32) * 0.3).astype(dt),
            jnp.asarray(rng.randn(C, E).astype(np.float32) * 0.2).astype(dt),
            jnp.asarray(rng.randn(C, E).astype(np.float32) * 0.2).astype(dt),
            jnp.asarray(rng.randn(E, E).astype(np.float32) * 0.1).astype(dt),
            jnp.asarray(rng.randn(E).astype(np.float32) * 0.1).astype(dt),
            jnp.asarray(rng.randn(E).astype(np.float32) * 0.1).astype(dt),
        ]
        fn = jax.jit(partial(fused_uoms_cross_attention, kappa=30.0,
                             block_k=block_k, block_b=block_b))
        t, out = timed(fn, args)
        print(f"{tag}: {1000*(t - floor):8.2f} ms  (block_k={block_k}, bb={block_b})")
        if check:
            ref = fused_uoms_cross_attention_reference(*args)
            err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
            rel = err / (np.abs(np.asarray(ref)).max() + 1e-9)
            print(f"   max abs err vs fp32 reference: {err:.4e} (rel {rel:.2e})")

    run(2, 30720, "check shape (B=2, K=30720)", check=True)
    run(4, 307200, "stage-1 layer (B=4, K=307200)")
    run(4, 307200, "stage-1 layer", block_k=2048)
    run(4, 307200, "stage-1 layer", block_k=512)
    run(4, 307200, "stage-1 layer bb=2", block_b=2)
    run(80, 50176, "stage-2 layer (B=80, K=50176)")
    run(80, 50176, "stage-2 layer bb=8", block_b=8)


if __name__ == "__main__":
    main()
