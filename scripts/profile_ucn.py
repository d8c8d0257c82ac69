"""UCN (legacy embedding + mean-shift clustering) pipeline throughput on the
TPU - pipelined timing, bucketed two-graph path like bench.py."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unseenobjectswithmeanshift_tpu.config import get_config
from unseenobjectswithmeanshift_tpu.pipeline.ucn import UCNPredictor


def main(mode="fps", labels_out=None, loaded=False):
    """mode: 'xla' (scan path), 'fps' (round-3 seeding-only kernel, default),
    'pallas' (the rejected full kernel, kept for study). loaded=True disables
    the depth filter so random-weight clusters survive to stage 2 and the
    crop path runs at a realistic bucket instead of near-empty."""
    cfg = get_config("tabletop_pretrained")
    cfg_crop = get_config("crop_tabletop_pretrained")
    for c in (cfg, cfg_crop):
        c.mean_shift.use_pallas = mode == "pallas"
        c.mean_shift.use_pallas_seeding = mode == "fps"
    B, H, W = 4, 480, 640
    pred = UCNPredictor(cfg, cfg_crop, dtype=jnp.bfloat16)
    v1, v2 = pred.init(jax.random.PRNGKey(0), (H, W))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    xyz = jnp.asarray((rng.rand(B, H, W, 3) * 2).astype(np.float32))

    s1 = jax.jit(pred._stage1_and_crops, static_argnames=("depth_threshold",))
    s2 = jax.jit(pred._stage2_refine, static_argnames=("P",))
    chk = jax.jit(lambda r: jnp.sum(r))

    def one_step(prev=None):
        out = s1(v1, img, xyz, depth_threshold=(1e9 if loaded else 0.5), first_seed_idx=0)
        if prev is None:
            return out, None
        labels, crops, perm, counts = prev
        n = int(np.asarray(counts)[0])   # [crop count, dropped clusters]
        P = next(b for b in pred._buckets(perm.shape[0]) if b >= n)
        return out, (s2(v2, labels, crops, perm, 0, P=P), P)

    w, _ = one_step()
    _, (refined, P_used) = one_step(w)
    labels = np.asarray(refined)
    iters = 15
    t0 = time.perf_counter()
    prev, _ = one_step()
    last = None
    for _ in range(iters - 1):
        prev, last = one_step(prev)
    labels_f, crops_f, perm_f, counts_f = prev
    P = next(b for b in pred._buckets(perm_f.shape[0]) if b >= int(np.asarray(counts_f)[0]))
    np.asarray(chk(s2(v2, labels_f, crops_f, perm_f, 0, P=P)))
    dt = (time.perf_counter() - t0) / iters
    n_inst = [len([v for v in np.unique(labels[i]) if v >= 1]) for i in range(B)]
    print(f"UCN two-stage ({mode} mean-shift): "
          f"{dt*1000:.1f} ms/batch ({B/dt:.2f} img/s) "
          f"P={P_used}, instances {n_inst}")
    if labels_out is not None:
        labels_out[mode] = labels
    return labels


if __name__ == "__main__":
    import sys as _sys
    _loaded = "loaded" in _sys.argv
    if "both" in _sys.argv:
        out = {}
        main("xla", out, loaded=_loaded)
        main("fps", out, loaded=_loaded)
        agree = float(np.mean(out["xla"] == out["fps"]))
        print(f"refined-label agreement fps vs xla: {agree:.4f} "
              f"(seed chains may diverge on fp32 near-ties; "
              f"clustering-equivalent modes)")
    else:
        mode = "xla" if "xla" in _sys.argv else (
            "pallas" if "pallas" in _sys.argv else "fps")
        main(mode, loaded=_loaded)
