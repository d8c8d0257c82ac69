"""Per-component timing of the UCN two-stage pipeline on the TPU.

Times each piece with the tunnel-safe fencing recipe (queue N iterations of a
jit whose scalar output depends on the computation, sync the last scalar).
Run after profile_ucn.py to decide where the optimization budget goes.
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

from unseenobjectswithmeanshift_tpu.config import get_config
from unseenobjectswithmeanshift_tpu.pipeline.ucn import UCNPredictor, _cluster_batched
from unseenobjectswithmeanshift_tpu.ops.mean_shift import (
    select_smart_seeds, seed_hill_climbing, connected_components,
    cosine_distance)


def timed(fn, args, iters=8, name=""):
    chk = jax.jit(lambda r: jnp.sum(
        jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(
            x.astype(jnp.float32) if hasattr(x, "astype") else 0.0), r, 0.0)))
    out = fn(*args)
    np.asarray(chk(out))
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn(*args)
    np.asarray(chk(last))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {name:<38s} {dt:8.2f} ms")
    return dt


def main():
    cfg = get_config("tabletop_pretrained")
    cfg_crop = get_config("crop_tabletop_pretrained")
    ms = cfg.mean_shift
    B, H, W = 4, 480, 640
    S = cfg.test.crop_size
    P = 32
    pred = UCNPredictor(cfg, cfg_crop, dtype=jnp.bfloat16)
    v1, v2 = pred.init(jax.random.PRNGKey(0), (H, W))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    xyz = jnp.asarray((rng.rand(B, H, W, 3) * 2).astype(np.float32))

    print(f"devices: {jax.devices()}")
    print(f"B={B} {H}x{W}, crop {S}x{S} P={P}, seeds={ms.num_seeds} "
          f"iters={ms.max_iters}")

    # stage-1 embedding network forward
    net_fwd = jax.jit(lambda v, i, x: pred.network.apply(v, i, x))
    feats = net_fwd(v1, img, xyz)
    timed(net_fwd, (v1, img, xyz), name="stage-1 segnet forward")

    Bf, Hf, Wf, C = feats.shape
    X = jnp.asarray(np.asarray(feats, np.float32)).reshape(B, Hf * Wf, C)
    n = Hf * Wf
    print(f"  (cluster matrix: [{B}, {n}, {C}] fp32 = "
          f"{B * n * C * 4 / 1e6:.0f} MB)")

    # clustering sub-pieces, batched the same way the pipeline runs them
    seed_fn = jax.jit(jax.vmap(
        lambda x: select_smart_seeds(x, ms.num_seeds, 0)[0]))
    seeds = seed_fn(X)
    timed(seed_fn, (X,), name="  seeding (farthest-point scan)")

    climb_fn = jax.jit(jax.vmap(
        lambda x, z: seed_hill_climbing(x, z, ms.kappa, ms.max_iters)))
    useeds = climb_fn(X, seeds)
    timed(climb_fn, (X, seeds), name="  hill climbing (10 iters)")

    cc_fn = jax.jit(jax.vmap(lambda z: connected_components(z, ms.epsilon)))
    timed(cc_fn, (useeds,), name="  connected components")

    assign_fn = jax.jit(jax.vmap(
        lambda x, z: jnp.argmin(cosine_distance(x, z), axis=1)))
    timed(assign_fn, (X, useeds), name="  pixel assignment argmin")

    full_cluster = jax.jit(lambda x: _cluster_batched(x, ms, 0))
    timed(full_cluster, (X,), name="  full mean-shift (stage 1)")

    # stage-2: crop network + crop clustering at the P=32 bucket
    rgbc = jnp.asarray(rng.rand(P, S, S, 3).astype(np.float32))
    xyzc = jnp.asarray((rng.rand(P, S, S, 3) * 2).astype(np.float32))
    cnet_fwd = jax.jit(lambda v, i, x: pred.network_crop.apply(v, i, x))
    featc = cnet_fwd(v2, rgbc, xyzc)
    timed(cnet_fwd, (v2, rgbc, xyzc), name="stage-2 crop net forward (P=32)")

    Xc = jnp.asarray(np.asarray(featc, np.float32)).reshape(P, S * S, C)
    print(f"  (crop cluster matrix: [{P}, {S * S}, {C}] fp32 = "
          f"{P * S * S * C * 4 / 1e6:.0f} MB)")
    crop_cluster = jax.jit(lambda x: _cluster_batched(x, cfg_crop.mean_shift, 0))
    timed(crop_cluster, (Xc,), name="  full mean-shift (crops P=32)")

    crop_seed = jax.jit(jax.vmap(
        lambda x: select_smart_seeds(x, ms.num_seeds, 0)[0]))
    cs = crop_seed(Xc)
    timed(crop_seed, (Xc,), name="  crop seeding only")
    crop_climb = jax.jit(jax.vmap(
        lambda x, z: seed_hill_climbing(x, z, ms.kappa, ms.max_iters)))
    timed(crop_climb, (Xc, cs), name="  crop hill climbing only")

    # end-to-end stage-1 (net + cluster + crops) for reference
    s1 = jax.jit(pred._stage1_and_crops, static_argnames=("depth_threshold",))
    timed(s1, (v1, img, xyz, 0.5, 0), name="stage-1 total (net+cluster+crops)")


if __name__ == "__main__":
    main()
