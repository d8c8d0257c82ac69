"""Where does the decoder's non-kernel time go? Time the decoder at
dec_layers 0/1/6 and the fused kernel alone, at stage-1 (B=4, 480x640) and
crop (P=32, 224x224) shapes. glue = decoder(6) - decoder(0) - 6*kernel."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from unseenobjectswithmeanshift_tpu.models.decoder import MeanShiftDecoder
from unseenobjectswithmeanshift_tpu.ops.fused_cross_attention import fused_uoms_cross_attention


def timeit(name, fn, *args, iters=20):
    chk = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32))
                                 for x in jax.tree.leaves(fn(*a))))
    np.asarray(chk(*args)); t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = chk(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


rng = np.random.RandomState(0)
for tag, Bv, Hv, Wv in [("stage1", 4, 480, 640), ("crop", 32, 224, 224)]:
    print(f"== {tag}: B={Bv} {Hv}x{Wv}")
    feat = jnp.asarray(rng.rand(Bv, Hv, Wv, 64).astype(np.float32)).astype(jnp.bfloat16)
    ts = {}
    for L in (0, 1, 6):
        dec = MeanShiftDecoder(in_channels=64, mask_dim=64, hidden_dim=256,
                               num_queries=100, nheads=8, dim_feedforward=2048,
                               dec_layers=L, num_feature_levels=1,
                               materialize_masks=False, use_pallas=True,
                               dtype=jnp.bfloat16)
        v = dec.init(jax.random.PRNGKey(0), [feat], feat)
        ts[L] = timeit(f"decoder dec_layers={L} (light)",
                       lambda vv, f: dec.apply(vv, [f], f), v, feat)
    # kernel alone at this shape
    Hh, Q, D, C, Cm, E, K = 8, 100, 32, 64, 256, 256, Hv * Wv
    q = rng.randn(Bv, Hh, Q, D).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    kargs = [jnp.asarray(q).astype(jnp.bfloat16),
             jnp.asarray(rng.randn(Bv, C, K).astype(np.float32) * .3).astype(jnp.bfloat16),
             jnp.asarray(rng.randn(Bv, Cm, K).astype(np.float32) * .3).astype(jnp.bfloat16),
             jnp.asarray(rng.randn(Bv, Q, Cm).astype(np.float32) * 2).astype(jnp.bfloat16),
             jnp.asarray(rng.randn(E, K).astype(np.float32) * .3).astype(jnp.bfloat16),
             jnp.asarray(rng.randn(C, E).astype(np.float32) * .2).astype(jnp.bfloat16),
             jnp.asarray(rng.randn(C, E).astype(np.float32) * .2).astype(jnp.bfloat16),
             jnp.asarray(rng.randn(E, E).astype(np.float32) * .1).astype(jnp.bfloat16),
             jnp.asarray(rng.randn(E).astype(np.float32) * .1).astype(jnp.bfloat16),
             jnp.asarray(rng.randn(E).astype(np.float32) * .1).astype(jnp.bfloat16)]
    tk = timeit("fused kernel x1", lambda *a: fused_uoms_cross_attention(*a), *kargs)
    print(f"  per-layer total {(ts[6] - ts[0]) / 6:.2f} ms; kernel {tk:.2f}; "
          f"glue/layer {(ts[6] - ts[0]) / 6 - tk:.2f}; prep+heads(L=0) {ts[0]:.2f}")
