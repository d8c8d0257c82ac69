"""Decoder microbench v2: pipelined timing (sync once at the end) to factor out
the dev-tunnel's per-call latency."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from unseenobjectswithmeanshift_tpu.ops.pallas_attention import (
        masked_hypersphere_attention,
    )

    dtype = jnp.bfloat16
    B, H, W, C = 4, 480, 640, 64
    E, Q, NH, D = 256, 100, 8, 32
    K = H * W
    rng = np.random.RandomState(0)

    # 0. dispatch/tunnel latency floor: trivial op
    x0 = jnp.zeros((8, 128), dtype)
    f0 = jax.jit(lambda x: x + 1)
    dt = timeit(f0, x0, iters=100)
    print(f"latency floor (tiny op):   {dt*1000:8.3f} ms")

    src = jnp.asarray(rng.rand(B, K, E).astype(np.float32)).astype(dtype)
    wk = jnp.asarray(rng.rand(E, NH, D).astype(np.float32)).astype(dtype)
    fp = jax.jit(lambda s, w: jnp.einsum("bke,ehd->bhdk", s, w))
    dt = timeit(fp, src, wk)
    print(f"one projT (K={K}):      {dt*1000:8.2f} ms")

    fp2 = jax.jit(lambda s, w: jnp.einsum("bke,ehd->bhkd", s, w))
    dt = timeit(fp2, src, wk)
    print(f"one proj (K-major out):    {dt*1000:8.2f} ms")

    qn = jnp.asarray(rng.rand(B, NH, Q, D).astype(np.float32)).astype(dtype)
    kT = jnp.asarray(rng.rand(B, NH, D, K).astype(np.float32)).astype(dtype)
    vT = jnp.asarray(rng.rand(B, NH, D, K).astype(np.float32)).astype(dtype)
    ml = jnp.asarray(rng.randn(B, Q, K).astype(np.float32)).astype(dtype)
    fk = jax.jit(lambda q, k, v, m: masked_hypersphere_attention(
        q, k, v, m, kv_transposed=True, k_normalized=False))
    dt = timeit(fk, qn, kT, vT, ml)
    print(f"pallas attn kernel:        {dt*1000:8.2f} ms")

    for bk in (2048, 4096):
        fkb = jax.jit(lambda q, k, v, m: masked_hypersphere_attention(
            q, k, v, m, kv_transposed=True, k_normalized=False, block_k=bk))
        dt = timeit(fkb, qn, kT, vT, ml)
        print(f"pallas attn (block_k={bk}): {dt*1000:8.2f} ms")

    me = jnp.asarray(rng.rand(B, Q, 256).astype(np.float32)).astype(dtype)
    mask_feat = jnp.asarray(rng.rand(B, H, W, 256).astype(np.float32)).astype(dtype)
    fm = jax.jit(lambda a, b: jnp.einsum("bqc,bhwc->bqhw", a, b))
    dt = timeit(fm, me, mask_feat)
    print(f"mask einsum (full res):    {dt*1000:8.2f} ms")

    fs = jax.jit(lambda a, b: a + b)
    pos = jnp.asarray(rng.rand(B, K, E).astype(np.float32)).astype(dtype)
    dt = timeit(fs, src, pos)
    print(f"key add (srcs+poss):       {dt*1000:8.2f} ms")


if __name__ == "__main__":
    main()
