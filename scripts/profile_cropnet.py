"""Crop-network split: backbone vs decoder vs kernel at the production bucket."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from unseenobjectswithmeanshift_tpu.config import get_config
from unseenobjectswithmeanshift_tpu.models.segnet import SEGNET, l2_normalize
from unseenobjectswithmeanshift_tpu.models.meta_arch import MSMFormer

def timeit(name, fn, *args, iters=30):
    chk = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32))
                                 for x in jax.tree.leaves(fn(*a))))
    np.asarray(chk(*args)); t0 = time.perf_counter()
    out = None
    for _ in range(iters): out = chk(*args)
    np.asarray(out)
    print(f"{name:38s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)

cfg = get_config("crop_tabletop_pretrained")
P, S = 32, 224
model = MSMFormer(cfg=cfg, dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
rgb = jnp.asarray(rng.rand(P, S, S, 3).astype(np.float32))
dep = jnp.asarray((rng.rand(P, S, S, 3) * 2).astype(np.float32))
pres = jnp.ones((P,), bool)
v = model.init(jax.random.PRNGKey(0), rgb[:1], dep[:1])

b = cfg.backbone
bb = SEGNET(network=b.network, input_type=b.input_type, fusion_type=b.fusion_type,
            num_units=b.num_units, normalize=b.normalize, dtype=jnp.bfloat16)
vb = {"params": v["params"]["pretrained_backbone"],
      "batch_stats": v["batch_stats"]["pretrained_backbone"]}
timeit("crop backbone (SEGNET x2 towers)", lambda vv, r, d: bb.apply(vv, r, d), vb, rgb, dep)
timeit("crop full net (light)", lambda vv, r, d, p: model.apply(vv, r, d, light=True, present=p),
       v, rgb, dep, pres)

# fused kernel at crop shapes
from unseenobjectswithmeanshift_tpu.ops.fused_cross_attention import fused_uoms_cross_attention
Bk, Hh, Q, D, C, Cm, E = P, 8, 100, 32, 64, 256, 256
K = S * S
kargs = [jnp.asarray(rng.randn(Bk, Hh, Q, D).astype(np.float32)).astype(jnp.bfloat16),
         jnp.asarray(rng.randn(Bk, C, K).astype(np.float32) * .3).astype(jnp.bfloat16),
         jnp.asarray(rng.randn(Bk, Cm, K).astype(np.float32) * .3).astype(jnp.bfloat16),
         jnp.asarray(rng.randn(Bk, Q, Cm).astype(np.float32) * 2).astype(jnp.bfloat16),
         jnp.asarray(rng.randn(E, K).astype(np.float32) * .3).astype(jnp.bfloat16),
         jnp.asarray(rng.randn(C, E).astype(np.float32) * .2).astype(jnp.bfloat16),
         jnp.asarray(rng.randn(C, E).astype(np.float32) * .2).astype(jnp.bfloat16),
         jnp.asarray(rng.randn(E, E).astype(np.float32) * .1).astype(jnp.bfloat16),
         jnp.asarray(rng.randn(E).astype(np.float32) * .1).astype(jnp.bfloat16),
         jnp.asarray(rng.randn(E).astype(np.float32) * .1).astype(jnp.bfloat16)]
timeit("fused kernel x1 (crop shape)", lambda *a: fused_uoms_cross_attention(*a), *kargs)
