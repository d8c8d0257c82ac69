"""XLA farthest-point seeding scan vs the VMEM-resident Pallas FPS kernel,
at both UCN shapes (stage-1 image, stage-2 crop bucket), compiled on the TPU.
Also checks the discrete seed-index chains agree (compiled, not interpret)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unseenobjectswithmeanshift_tpu.ops.mean_shift import select_smart_seeds
from unseenobjectswithmeanshift_tpu.ops.pallas_mean_shift import (
    fps_seeds_pallas)


def bench(fn, args, iters=8):
    chk = jax.jit(lambda t: sum(jnp.sum(x.astype(jnp.float32)) for x in t))
    out = fn(*args)
    np.asarray(chk(out if isinstance(out, tuple) else (out,)))
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn(*args)
    np.asarray(chk(last if isinstance(last, tuple) else (last,)))
    return (time.perf_counter() - t0) / iters * 1e3


def clustered(rng, B, n, d, k=8):
    c = rng.randn(B, k, d).astype(np.float32)
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    X = c[np.arange(B)[:, None], rng.randint(0, k, (B, n))]
    X = X + 0.12 * rng.randn(B, n, d).astype(np.float32)
    X /= np.linalg.norm(X, axis=-1, keepdims=True)
    return X.astype(np.float32)


def main():
    rng = np.random.RandomState(0)
    S = 100
    print(f"devices: {jax.devices()}")
    for name, B, n in (("stage-1 image", 4, 480 * 640),
                       ("crop bucket P=32", 32, 224 * 224),
                       ("crop bucket P=48", 48, 224 * 224)):
        X = jnp.asarray(clustered(rng, B, n, 64))
        first = jnp.zeros((B,), jnp.int32)

        xla_fn = jax.jit(jax.vmap(lambda x: select_smart_seeds(x, S, 0)))
        pal_fn = jax.jit(lambda x, f: fps_seeds_pallas(x, f, num_seeds=S))

        seeds_x, idx_x = xla_fn(X)
        seeds_p, idx_p = pal_fn(X, first)
        chain = np.array_equal(np.asarray(idx_x), np.asarray(idx_p))
        agree = float(np.mean(np.asarray(idx_x) == np.asarray(idx_p)))

        t_xla = bench(xla_fn, (X,))
        t_pal = bench(pal_fn, (X, first))
        print(f"{name}: [{B}, {n}, 64]  xla {t_xla:7.2f} ms   "
              f"pallas {t_pal:7.2f} ms   ({t_xla / t_pal:.2f}x)   "
              f"index-chain identical={chain} (agree {agree:.4f})")


if __name__ == "__main__":
    main()
