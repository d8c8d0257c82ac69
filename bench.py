"""Benchmark: OCID-resolution (640x480) RGB-D two-stage MSMFormer inference,
images/sec on one TPU chip.

Runs the fused two-stage pipeline (stage-1 whole-image + batched stage-2 RoI
refinement, one jit graph, bf16) on random weights. Prints a stage breakdown,
an on-device Pallas-kernel-vs-reference check, and the crop-slot occupancy
(random weights are the conservative case only when slots fill; the occupancy
line makes the measured regime explicit), then ONE JSON line (last).

vs_baseline: the reference publishes no throughput numbers (SURVEY.md section 6).
The driver's north star is >= 5x an H100 running the reference's batch-1,
host-looped two-stage PyTorch pipeline; we estimate that reference at 5 img/s
(its per-RoI host round-trips dominate), making the target 25 img/s/chip.
vs_baseline = measured / 25.0.
"""

import json
import time

import numpy as np

H100_REFERENCE_IMG_PER_SEC = 5.0
TARGET_MULTIPLIER = 5.0
TARGET = H100_REFERENCE_IMG_PER_SEC * TARGET_MULTIPLIER


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from unseenobjectswithmeanshift_tpu.config import get_config
    from unseenobjectswithmeanshift_tpu.pipeline.two_stage import TwoStagePredictor

    cfg = get_config("tabletop_pretrained")
    cfg_crop = get_config("crop_tabletop_pretrained")
    dtype = jnp.bfloat16

    BATCH = int(jax.device_count())  # single chip -> 1
    B = max(1, BATCH) * 4            # 4 images per chip per step
    H, W = 480, 640

    # ---- on-device kernel selftest: compiled Mosaic vs pure-JAX reference ----
    # (VERDICT round-1 item 5: the kernel's numerics were only ever checked in
    # interpret mode on CPU; this exercises the real compiled kernel.)
    from unseenobjectswithmeanshift_tpu.ops.fused_cross_attention import (
        fused_uoms_cross_attention, fused_uoms_cross_attention_reference,
    )
    rngk = np.random.RandomState(1)
    Bk, Hh, Q, D, C, Cm, E, K = 2, 8, 100, 32, 64, 256, 256, 30720
    qk = rngk.randn(Bk, Hh, Q, D).astype(np.float32)
    qk /= np.linalg.norm(qk, axis=-1, keepdims=True)
    kargs = [jnp.asarray(qk).astype(dtype),
             jnp.asarray(rngk.randn(Bk, C, K).astype(np.float32) * .3).astype(dtype),
             jnp.asarray(rngk.randn(Bk, Cm, K).astype(np.float32) * .3).astype(dtype),
             jnp.asarray(rngk.randn(Bk, Q, Cm).astype(np.float32) * 2).astype(dtype),
             jnp.asarray(rngk.randn(E, K).astype(np.float32) * .3).astype(dtype),
             jnp.asarray(rngk.randn(C, E).astype(np.float32) * .2).astype(dtype),
             jnp.asarray(rngk.randn(C, E).astype(np.float32) * .2).astype(dtype),
             jnp.asarray(rngk.randn(E, E).astype(np.float32) * .1).astype(dtype),
             jnp.asarray(rngk.randn(E).astype(np.float32) * .1).astype(dtype),
             jnp.asarray(rngk.randn(E).astype(np.float32) * .1).astype(dtype)]
    got = np.asarray(fused_uoms_cross_attention(*kargs), np.float32)
    want = np.asarray(fused_uoms_cross_attention_reference(*kargs), np.float32)
    err = np.abs(got - want).max()
    rel = err / (np.abs(want).max() + 1e-9)
    assert rel < 2e-2, f"compiled kernel diverges from reference: rel={rel:.3e}"
    print(f"# pallas selftest (compiled, B={Bk} K={K} bf16): "
          f"maxerr={err:.2e} rel={rel:.2e} OK")

    pred = TwoStagePredictor(cfg, cfg_crop, dtype=dtype)
    v1, v2 = pred.init(jax.random.PRNGKey(0), (H, W), crop_size=cfg.test.crop_size)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    xyz = jnp.asarray((rng.rand(B, H, W, 3) * 2).astype(np.float32))

    # A tiny on-device checksum forces completion each step without measuring the
    # dev-tunnel's download bandwidth (block_until_ready does not reliably block
    # on the tunneled axon platform, and full label downloads would time the
    # tunnel, not the TPU). One full download at the end sanity-checks outputs.
    def run_full(img_, xyz_):
        labels_, refined_ = pred._forward(v1, v2, img_, xyz_, osd=False, refine=True)
        return jnp.sum(labels_) + jnp.sum(refined_), labels_, refined_

    def run_s1(img_, xyz_):
        labels_, _ = pred._forward(v1, v2, img_, xyz_, osd=False, refine=False)
        return jnp.sum(labels_), labels_

    full_jit = jax.jit(run_full)
    s1_jit = jax.jit(run_s1)

    def timeit(fn, args, iters):
        out = fn(*args)
        np.asarray(out[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            np.asarray(out[0])
        return (time.perf_counter() - t0) / iters, out

    iters = 10
    dt_s1, s1_out = timeit(s1_jit, (img, xyz), iters)
    dt_full, full_out = timeit(full_jit, (img, xyz), iters)

    labels = np.asarray(full_out[1])
    refined = np.asarray(full_out[2])
    assert labels.shape == (B, H, W)

    # occupancy: how many of the max_instances crop slots stage 2 actually ran
    T = cfg.test.max_instances
    n_inst = [len([v for v in np.unique(labels[i]) if v >= 2]) for i in range(B)]
    print(f"# stage-1 only:  {dt_s1 * 1000:7.2f} ms/batch  "
          f"({dt_s1 / B * 1000:6.2f} ms/img)")
    print(f"# full 2-stage:  {dt_full * 1000:7.2f} ms/batch  "
          f"({dt_full / B * 1000:6.2f} ms/img)")
    print(f"# stage-2 cost:  {(dt_full - dt_s1) * 1000:7.2f} ms/batch")
    print(f"# crop occupancy: {n_inst} of {T} slots/img "
          f"(mean {np.mean(n_inst):.1f}; present-gated decoder skips empty slots, "
          f"the crop backbone does not)")

    img_per_sec = B / dt_full
    print(json.dumps({
        "metric": "ocid_640x480_rgbd_two_stage_images_per_sec_per_chip",
        "value": round(img_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
