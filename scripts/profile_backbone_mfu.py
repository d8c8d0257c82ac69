"""Backbone conv MFU on the real chip (VERDICT r3 item 4).

The flagship stage-1 backbone is two dilated ResNet34-8s towers (rgb + xyz,
'add' fusion, ref: lib/networks/SEG.py:105-108, resnet_dilated.py:287). It is
the only remaining dense stride-1 lever on the inference path. This script:

1. measures the backbone alone (B=4/8, 480x640, bf16) and reads XLA's cost
   analysis for its FLOP count -> achieved TF/s vs the v5e bf16 peak
   (197 TF/s) = conv MFU;
2. A/Bs one lever: running both towers as ONE network with
   feature_group_count=2 (the early 64/128-channel convs of a single tower
   under-fill the 128-wide MXU; stacking the two towers' channels doubles
   the contraction width at identical FLOPs).

Outcome (measured numbers recorded in README "Backbone MFU"): either the
grouped variant wins and becomes an opt-in, or the MFU number documents that
XLA is already near roofline and the backbone is not worth a hand kernel.
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

V5E_BF16_PEAK = 197e12

H, W = 480, 640


def timed(fn, *args, iters=20):
    """Validated tunnel-safe timing (see .claude/skills/verify): enqueue all
    iterations, fence once through a scalar that DEPENDS on the result —
    block_until_ready does not reliably block over the axon dev tunnel."""
    chk = jax.jit(lambda r: jnp.sum(jax.tree_util.tree_leaves(r)[0][..., 0]
                                    .astype(jnp.float32)))
    np.asarray(chk(fn(*args)))  # compile + warm
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    np.asarray(chk(r))
    return (time.perf_counter() - t0) / iters


def cost_flops(jitted, *args):
    an = jitted.lower(*args).compile().cost_analysis()
    if isinstance(an, list):
        an = an[0]
    return float(an.get("flops", 0.0))


def main():
    from unseenobjectswithmeanshift_tpu.models.segnet import SEGNET

    rng = np.random.RandomState(0)
    print(f"# devices: {jax.devices()}")
    for B in (4, 8):
        img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
        xyz = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

        model = SEGNET(network="resnet34_8s", input_type="RGBD",
                       fusion_type="add", dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), img, xyz, train=False)
        fwd = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))
        dt = timed(fwd, variables, img, xyz)
        fl = cost_flops(fwd, variables, img, xyz)
        tfs = fl / dt / 1e12
        print(f"# B={B} two-tower backbone: {dt*1e3:7.2f} ms  "
              f"{fl/1e9:7.1f} GF  {tfs:6.1f} TF/s  "
              f"MFU {100*tfs*1e12/V5E_BF16_PEAK:5.1f}% of bf16 peak")

        # REAL-model grouped A/B: same weights, one feature_group_count=2
        # stack (exactness pinned by tests/test_grouped_towers.py)
        from unseenobjectswithmeanshift_tpu.utils.checkpoint import (
            fuse_grouped_towers)

        gmodel = SEGNET(network="resnet34_8s", input_type="RGBD",
                        fusion_type="add", grouped_towers=True,
                        dtype=jnp.bfloat16)
        gvars = jax.device_put(fuse_grouped_towers(jax.device_get(variables)))
        gfwd = jax.jit(lambda v, a, b: gmodel.apply(v, a, b, train=False))
        dt_gr = timed(gfwd, gvars, img, xyz)
        fl_gr = cost_flops(gfwd, gvars, img, xyz)
        tfs_gr = fl_gr / dt_gr / 1e12
        print(f"# B={B} grouped backbone:   {dt_gr*1e3:7.2f} ms  "
              f"{fl_gr/1e9:7.1f} GF  {tfs_gr:6.1f} TF/s  "
              f"MFU {100*tfs_gr*1e12/V5E_BF16_PEAK:5.1f}%  -> "
              f"{dt/dt_gr:4.2f}x vs two-tower", flush=True)

        # lever A/B: one grouped tower (groups=2) over stacked channels.
        # Same FLOPs, double contraction width per conv.
        from jax import lax

        def grouped_tower(params, x6):
            # emulate the conv stack of ResNet34-8s with feature_group_count=2:
            # identical layer shapes, both towers' weights stacked on the
            # output-channel axis. We only measure the CONV cost here (BN/relu
            # fuse into the convs either way), so random weights suffice.
            y = x6
            for (k, cin, cout, stride, dil) in params:
                wshape = (k, k, cin, 2 * cout)
                wkey = jax.random.PRNGKey(cin * 7 + cout)
                w = (jax.random.normal(wkey, wshape, jnp.bfloat16) * 0.01)
                pad = dil * (k // 2)
                y = lax.conv_general_dilated(
                    y, w, (stride, stride), ((pad, pad), (pad, pad)),
                    rhs_dilation=(dil, dil), feature_group_count=2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = jnp.maximum(y, 0)
            return y

        def plain_tower(params, x3):
            y = x3
            for (k, cin, cout, stride, dil) in params:
                wkey = jax.random.PRNGKey(cin * 7 + cout)
                w = (jax.random.normal(wkey, (k, k, cin, cout), jnp.bfloat16)
                     * 0.01)
                pad = dil * (k // 2)
                y = lax.conv_general_dilated(
                    y, w, (stride, stride), ((pad, pad), (pad, pad)),
                    rhs_dilation=(dil, dil),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = jnp.maximum(y, 0)
            return y

        # ResNet34-8s conv schedule (stride-8 dilation; resnet.py): stem +
        # 3/4/6/3 blocks of 2 convs each (skipping 1x1 downsamples - ~3% of
        # FLOPs)
        sched = [(7, 3, 64, 2, 1)]
        sched += [(3, 64, 64, 1, 1)] * 6
        sched += [(3, 64, 128, 2, 1)] + [(3, 128, 128, 1, 1)] * 7
        sched += [(3, 128, 256, 1, 2)] + [(3, 256, 256, 1, 2)] * 7
        sched += [(3, 256, 512, 1, 4)] + [(3, 512, 512, 1, 4)] * 5

        x3 = img.astype(jnp.bfloat16)
        x6 = jnp.concatenate([img, xyz], -1).astype(jnp.bfloat16)
        # the stem consumes 3 channels per tower: grouped input is 6ch/2 = 3 ✓
        g = jax.jit(lambda x: grouped_tower(sched, x))
        p = jax.jit(lambda x: plain_tower(sched, x))
        dt_p = timed(p, x3)
        dt_g = timed(g, x6)
        fl_p = cost_flops(p, x3)
        fl_g = cost_flops(g, x6)
        print(f"# B={B} conv-stack A/B: two plain towers "
              f"{2*dt_p*1e3:7.2f} ms ({2*fl_p/1e9:.1f} GF, "
              f"{2*fl_p/(2*dt_p)/1e12:5.1f} TF/s) vs grouped "
              f"{dt_g*1e3:7.2f} ms ({fl_g/1e9:.1f} GF, "
              f"{fl_g/dt_g/1e12:5.1f} TF/s)  -> "
              f"{2*dt_p/dt_g:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
