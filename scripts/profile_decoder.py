"""Decoder-internals microbench on the real TPU."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10):
    import jax
    out = fn(*args)
    leaves = jax.tree.leaves(out)
    np.asarray(leaves[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        leaves = jax.tree.leaves(out)
        np.asarray(leaves[0].ravel()[0:1])
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from unseenobjectswithmeanshift_tpu.models.decoder import MeanShiftDecoder
    from unseenobjectswithmeanshift_tpu.models.resnet import DilatedResNetFCN
    from unseenobjectswithmeanshift_tpu.ops.pallas_attention import (
        masked_hypersphere_attention,
    )

    dtype = jnp.bfloat16
    B, H, W, C = 4, 480, 640, 64
    E, Q, NH, D = 256, 100, 8, 32
    K = H * W
    rng = np.random.RandomState(0)

    feat = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(dtype)
    mask_feat = jnp.asarray(rng.rand(B, H, W, 256).astype(np.float32)).astype(dtype)

    # 1. single tower
    tower = DilatedResNetFCN(layers=(3, 4, 6, 3), block="basic", num_units=64,
                             output_stride=8, dtype=dtype)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    vt = tower.init(jax.random.PRNGKey(0), img)
    f1 = jax.jit(lambda v, x: tower.apply(v, x))
    dt = timeit(f1, vt, img)
    print(f"single tower:            {dt*1000:8.2f} ms  ({dt/B*1000:6.2f} ms/img)")

    # 1b. single tower without the final upsample (output at 60x80)
    tower_nu = DilatedResNetFCN(layers=(3, 4, 6, 3), block="basic", num_units=64,
                                output_stride=8, dtype=dtype, upsample=False)
    vtn = tower_nu.init(jax.random.PRNGKey(0), img)
    f1n = jax.jit(lambda v, x: tower_nu.apply(v, x))
    dt = timeit(f1n, vtn, img)
    print(f"single tower (no upsample): {dt*1000:8.2f} ms  ({dt/B*1000:6.2f} ms/img)")

    # 2. full decoder
    dec = MeanShiftDecoder(num_classes=2, hidden_dim=E, num_queries=Q, nheads=NH,
                           dim_feedforward=2048, dec_layers=6, mask_dim=256,
                           in_channels=C, num_feature_levels=1, use_pallas=True,
                           dtype=dtype)
    vd = dec.init(jax.random.PRNGKey(0), [feat], mask_feat)
    fd = jax.jit(lambda v, x, m: dec.apply(v, x, m)["pred_masks"])
    dt = timeit(fd, vd, [feat], mask_feat)
    print(f"decoder (full):          {dt*1000:8.2f} ms  ({dt/B*1000:6.2f} ms/img)")

    # 3. one k/v projection pass (the projT einsum into [B,H,D,K])
    src = jnp.asarray(rng.rand(B, K, E).astype(np.float32)).astype(dtype)
    wk = jnp.asarray(rng.rand(E, NH, D).astype(np.float32)).astype(dtype)
    fp = jax.jit(lambda s, w: jnp.einsum("bke,ehd->bhdk", s, w))
    dt = timeit(fp, src, wk)
    print(f"one projT (K={K}):     {dt*1000:8.2f} ms")

    # 4. the pallas attention kernel alone
    qn = jnp.asarray(rng.rand(B, NH, Q, D).astype(np.float32)).astype(dtype)
    kT = jnp.asarray(rng.rand(B, NH, D, K).astype(np.float32)).astype(dtype)
    vT = jnp.asarray(rng.rand(B, NH, D, K).astype(np.float32)).astype(dtype)
    ml = jnp.asarray(rng.randn(B, Q, K).astype(np.float32)).astype(dtype)
    fk = jax.jit(lambda q, k, v, m: masked_hypersphere_attention(
        q, k, v, m, kv_transposed=True, k_normalized=False))
    dt = timeit(fk, qn, kT, vT, ml)
    print(f"pallas attn kernel:      {dt*1000:8.2f} ms")

    # 5. prediction-head mask einsum at full res
    me = jnp.asarray(rng.rand(B, Q, 256).astype(np.float32)).astype(dtype)
    fm = jax.jit(lambda a, b: jnp.einsum("bqc,bhwc->bqhw", a, b))
    dt = timeit(fm, me, mask_feat)
    print(f"mask einsum (full res):  {dt*1000:8.2f} ms")

    # 6. key sum materialization (srcs + poss)
    pos = jnp.asarray(rng.rand(B, K, E).astype(np.float32)).astype(dtype)
    fs = jax.jit(lambda a, b: a + b)
    dt = timeit(fs, src, pos)
    print(f"key add (srcs+poss):     {dt*1000:8.2f} ms")


if __name__ == "__main__":
    main()
