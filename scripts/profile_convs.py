"""Conv microbench: dilated vs dense vs grouped on TPU, fori_loop-amortized
(the dev tunnel adds ~33ms per host sync; loop K times inside one jit)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 20


def timed(fn, x, iters=3):
    import jax
    r = fn(x)
    np.asarray(r.ravel()[0:1])
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(x)
        np.asarray(r.ravel()[0:1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    # floor: tiny op, same sync method
    f0 = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8, 128), dt)
    floor = timed(f0, x0)
    print(f"sync floor: {floor*1000:.2f} ms")

    def conv_loop(C, d, groups=1, B=4, H=60, W=80, name=""):
        w = jnp.asarray(rng.rand(3, 3, C // groups, C).astype(np.float32)).astype(dt) * 0.01
        x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(dt)

        def one(v):
            return lax.conv_general_dilated(
                v, w, window_strides=(1, 1), padding=((d, d), (d, d)),
                rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups)

        f = jax.jit(lambda v: lax.fori_loop(0, N, lambda i, a: one(a), v))
        t = (timed(f, x) - floor) / N
        flops = 2 * B * H * W * 9 * (C // groups) * C
        print(f"{name:44s} {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s")

    # layer3/layer4 shapes of the dilated ResNet34 tower (B=4, 60x80)
    conv_loop(256, 1, name="3x3 C=256 dense (d=1)")
    conv_loop(256, 2, name="3x3 C=256 dilated d=2")
    conv_loop(512, 1, name="3x3 C=512 dense (d=1)")
    conv_loop(512, 4, name="3x3 C=512 dilated d=4")
    conv_loop(512, 1, groups=2, name="3x3 C=512 dense grouped=2 (tower fuse)")
    conv_loop(1024, 1, groups=2, name="3x3 C=1024 dense grouped=2")
    # layer1/2 shapes
    conv_loop(64, 1, B=4, H=120, W=160, name="3x3 C=64 dense 120x160")
    conv_loop(128, 1, B=4, H=60, W=80, name="3x3 C=128 dense 60x80")
    # space-to-batch equivalent shapes for d=4: B*16 at 15x20
    conv_loop(512, 1, B=64, H=15, W=20, name="3x3 C=512 dense s2b(d=4) B=64 15x20")
    conv_loop(256, 1, B=16, H=30, W=40, name="3x3 C=256 dense s2b(d=2) B=16 30x40")


if __name__ == "__main__":
    main()
