"""Stage-2 sub-component timing at the production bucket (pipelined)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from unseenobjectswithmeanshift_tpu.config import get_config
from unseenobjectswithmeanshift_tpu.pipeline.two_stage import TwoStagePredictor

def timeit(name, fn, *args, iters=30):
    chk = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32))
                                 for x in jax.tree.leaves(fn(*a))))
    np.asarray(chk(*args)); t0 = time.perf_counter()
    outs = [chk(*args) for _ in range(iters)]
    np.asarray(outs[-1])
    print(f"{name:38s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)

cfg = get_config("tabletop_pretrained"); cfg_crop = get_config("crop_tabletop_pretrained")
B, H, W = 4, 480, 640
pred = TwoStagePredictor(cfg, cfg_crop, dtype=jnp.bfloat16)
v1, v2 = pred.init(jax.random.PRNGKey(0), (H, W), crop_size=cfg.test.crop_size)
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
xyz = jnp.asarray((rng.rand(B, H, W, 3) * 2).astype(np.float32))
s1 = jax.jit(pred._stage1_and_crops, static_argnames=("osd",))
labels, crops, perm, count = s1(v1, img, xyz, osd=False)
n = int(count); P = next(b for b in pred._buckets(perm.shape[0]) if b >= n)
print(f"count={n} P={P}")
T, S = cfg.test.max_instances, cfg.test.crop_size

timeit("stage1+crops+compaction (graph 1)", lambda v,i,x: s1(v,i,x,osd=False), v1, img, xyz)
timeit(f"stage2 full (graph 2, P={P})",
       lambda v,l,c,p: pred._stage2_refine(v, l, c, p, P=P), v2, labels, crops, perm)

idx = perm[:P]
rgbP = crops.rgb.reshape(B*T, S, S, 3)[idx]
depP = crops.xyz.reshape(B*T, S, S, 3)[idx]
presP = crops.present.reshape(B*T)[idx]
timeit("  gather rgb/dep/present", lambda c, p: (
    c.rgb.reshape(B*T,S,S,3)[p[:P]], c.xyz.reshape(B*T,S,S,3)[p[:P]],
    c.present.reshape(B*T)[p[:P]]), crops, perm)
timeit("  crop model (net only)", lambda v,r,d,p: pred.model_crop.apply(
    v, r, d, light=True, present=p), v2, rgbP, depP, presP)
timeit("  crop labels (net+postproc)", lambda v,r,d,p: pred._crop_labels(
    v, r, d, p), v2, rgbP, depP, presP)
lcP = pred._crop_labels(v2, rgbP, depP, presP)
timeit("  scatter-back", lambda lc, p: jnp.zeros((B*T,S,S), lc.dtype).at[p[:P]].set(lc),
       lcP, perm)
lc_full = jnp.zeros((B*T,S,S), lcP.dtype).at[idx].set(lcP).reshape(B,T,S,S)
timeit("  paste-back", lambda l,c,lc: pred._paste_back(l, c, lc), labels, crops, lc_full)
