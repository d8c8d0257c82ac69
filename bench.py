"""Benchmark: OCID-resolution (640x480) RGB-D two-stage MSMFormer inference,
images/sec on one TPU chip.

Runs the fused two-stage pipeline (stage-1 whole-image + batched stage-2 RoI
refinement, one jit graph, bf16) on random weights - throughput is weight-
independent. Prints ONE JSON line.

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
    import jax.numpy as jnp
    from unseenobjectswithmeanshift_tpu.config import get_config
    from unseenobjectswithmeanshift_tpu.pipeline.two_stage import TwoStagePredictor

    cfg = get_config("tabletop_pretrained")
    cfg_crop = get_config("crop_tabletop_pretrained")
    dtype = jnp.bfloat16

    BATCH = int(jax.device_count())  # single chip -> 1
    B = max(1, BATCH) * 4            # 4 images per chip per step
    H, W = 480, 640

    pred = TwoStagePredictor(cfg, cfg_crop, dtype=dtype)
    v1, v2 = pred.init(jax.random.PRNGKey(0), (H, W), crop_size=cfg.test.crop_size)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    xyz = jnp.asarray((rng.rand(B, H, W, 3) * 2).astype(np.float32))

    # A tiny on-device checksum forces completion each step without measuring the
    # dev-tunnel's download bandwidth (block_until_ready does not reliably block
    # on the tunneled axon platform, and full label downloads would time the
    # tunnel, not the TPU). One full download at the end sanity-checks outputs.
    import jax.numpy as jnp2

    def run(img_, xyz_):
        labels_, refined_ = pred._forward(v1, v2, img_, xyz_, osd=False, refine=True)
        return jnp2.sum(labels_) + jnp2.sum(refined_), labels_, refined_

    import jax as _jax
    run_jit = _jax.jit(run)
    checksum, labels, refined = run_jit(img, xyz)
    np.asarray(checksum)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        checksum, labels, refined = run_jit(img, xyz)
        np.asarray(checksum)
    dt = time.perf_counter() - t0
    assert np.asarray(labels).shape == (B, H, W)

    img_per_sec = B * iters / dt
    print(json.dumps({
        "metric": "ocid_640x480_rgbd_two_stage_images_per_sec_per_chip",
        "value": round(img_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
