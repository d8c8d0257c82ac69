"""Tunnel dispatch-overhead probe: N enqueued trivial jits, one sync."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
f = jax.jit(lambda x: x + 1.0)
x = jnp.zeros((8, 128))
x = f(x); np.asarray(x)
for N in (50, 200):
    t0 = time.perf_counter()
    y = x
    for _ in range(N):
        y = f(y)
    np.asarray(y[0, 0])
    dt = time.perf_counter() - t0
    print(f"N={N}: {dt*1000:.1f} ms total, {dt/N*1000:.3f} ms/dispatch")
# and: alternating two graphs with a host sync between (bench pattern)
g = jax.jit(lambda x: x * 2.0)
t0 = time.perf_counter()
y = x
for _ in range(30):
    y = f(y)
    n = int(y[0, 0])   # sync
    y = g(y)
np.asarray(y[0, 0])
print(f"sync-per-iter pattern: {(time.perf_counter()-t0)/30*1000:.1f} ms/iter")
