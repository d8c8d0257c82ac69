"""Benchmark: OCID-resolution (640x480) RGB-D two-stage MSMFormer inference,
images/sec on one TPU chip.

Runs the fused two-stage pipeline (stage-1 whole-image + batched stage-2 RoI
refinement, one jit graph, bf16) on random weights, then re-measures with the
committed TRAINED checkpoint on rendered held-out scenes. Round 4's occupancy
data showed the random-weight regime is the FAVORABLE one (trained models
produce MORE crops: 7.4 vs 5.9 of 20 slots), so the trained-regime number is
the better predictor of OCID-parity throughput; both are printed with
vs_target, and the headline JSON (last line) carries the random-weight number
for cross-round comparability plus the trained number as "trained_value".

vs_baseline: the reference publishes no throughput numbers (SURVEY.md section 6),
so the baseline is the DERIVED throughput of an H100 running the reference's
batch-1, host-looped two-stage PyTorch pipeline: 8 img/s (BASELINE.md "Derived
H100 reference throughput": measured 642 GF stage-1 + 118 GF/crop forwards,
~800-launch eager decoder overhead, and the serialized per-RoI host loop at
~8 instances/image). vs_baseline = measured / 8.0 - i.e. this chip vs the
reference implementation on its own best hardware. The separate 5x stretch
target (40 img/s/chip) is tracked as "vs_target" in the breakdown line.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

H100_REFERENCE_IMG_PER_SEC = 8.0   # derived in BASELINE.md, round 2
TARGET_MULTIPLIER = 5.0
TARGET = H100_REFERENCE_IMG_PER_SEC * TARGET_MULTIPLIER

# ADVICE r4: resolve committed-checkpoint paths relative to the repo root so
# bench works from any cwd (was silently skipping the release checkpoint)
_REPO = os.path.dirname(os.path.abspath(__file__))

# Outage resilience (VERDICT r2 item 1): BENCH_r02 was voided because the dev
# tunnel was down and bench.py crashed at backend init. Probe the backend in
# SUBPROCESSES (a failed in-process init is cached by jax and would poison
# retries), retrying for a bounded window; on final failure emit a structured
# JSON record instead of a bare traceback so the round keeps its evidence.
BACKEND_RETRY_WINDOW_S = 600
BACKEND_RETRY_SLEEP_S = 45
_PROBE = ("import jax, numpy as np; "
          "print(np.asarray(jax.jit(lambda a: (a@a).sum())"
          "(jax.numpy.ones((128,128)))))")


def wait_for_backend(window_s=BACKEND_RETRY_WINDOW_S):
    """Retry a tiny compiled matmul in a subprocess until the TPU answers.

    Returns (ok, detail). Never initializes the backend in this process.
    """
    deadline = time.monotonic() + window_s
    attempt = 0
    detail = ""
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE],
                               capture_output=True, text=True, timeout=120)
            if r.returncode == 0:
                return True, f"backend up (attempt {attempt})"
            detail = (r.stderr or r.stdout).strip().splitlines()[-1:] or ["?"]
            detail = detail[0][:300]
        except subprocess.TimeoutExpired:
            detail = "probe timed out after 120s"
        if time.monotonic() >= deadline:
            return False, f"backend unavailable after {attempt} probes " \
                          f"over {window_s}s: {detail}"
        print(f"# backend probe {attempt} failed ({detail}); retrying...",
              flush=True)
        time.sleep(min(BACKEND_RETRY_SLEEP_S, max(1, deadline - time.monotonic())))


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
    B = max(1, BATCH) * 8            # 8 images per chip per step: the round-3
    # batch sweep (scripts/profile_batch.py) measured B=8 at 230.4 ms/batch =
    # 34.7 img/s, +10.4% over B=4 - the round-2 "B=8 HBM cliff" (617 ms at
    # P=48) was resolved by the stage-2 crop-buffer donation (commit 6ecfe19)
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

    # Streaming (software-pipelined) measurement over the bucketed two-graph
    # path: stage 1 of batch i+1 is enqueued BEFORE syncing batch i's crop
    # count, so the dev tunnel's ~28 ms per-sync round-trip latency overlaps
    # device work instead of stalling it (a local/production deployment pays
    # ~us for that sync; over the tunnel it would otherwise dominate the
    # measurement). Completion is forced via tiny on-device checksums - full
    # label downloads would time the tunnel's download bandwidth, not the TPU.
    pred._ensure_bucketed_jits()   # the SHIPPED jits (incl. crop-buffer
    s1 = pred._s1_fn               # donation on graph 2)
    s2 = pred._s2_fn
    chk = jax.jit(lambda r: jnp.sum(r))

    def pick_bucket(perm, count):
        n = int(count)
        return next(b for b in pred._buckets(perm.shape[0]) if b >= n)

    from collections import deque

    DEPTH = 2  # batches in flight before each crop-count sync: keeps ~2
    # batches of device work buffered so the dev tunnel's per-sync round-trip
    # (28-45+ ms, varies run to run) never drains the device queue

    def pop_refine(pending):
        labels_, crops_, perm_, count_ = pending.popleft()
        P = pick_bucket(perm_, count_)
        return labels_, s2(v2, labels_, crops_, perm_, P=P), P

    # warm-up: compile stage 1 + the bucket this workload uses
    pending = deque(s1(v1, img, xyz, osd=False) for _ in range(2))
    res = pop_refine(pending)
    labels = np.asarray(res[0])
    refined = np.asarray(res[1])
    P_used = res[2]
    assert labels.shape == (B, H, W) and refined.shape == (B, H, W)
    np.asarray(chk(pop_refine(pending)[1]))

    iters = 20
    t0 = time.perf_counter()
    pending = deque()
    last = None
    for _ in range(iters):
        pending.append(s1(v1, img, xyz, osd=False))
        if len(pending) > DEPTH:
            last = pop_refine(pending)[1]
    while pending:
        last = pop_refine(pending)[1]
    np.asarray(chk(last))
    dt_full = (time.perf_counter() - t0) / iters

    # stage-1-only throughput: enqueue all, one sync
    np.asarray(chk(s1(v1, img, xyz, osd=False)[0]))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):   # async dispatch enqueues all steps; keep only the
        out = s1(v1, img, xyz, osd=False)   # last output alive (HBM)
    np.asarray(chk(out[0]))
    dt_s1 = (time.perf_counter() - t0) / iters

    # occupancy: how many of the max_instances crop slots stage 2 actually ran
    T = cfg.test.max_instances
    n_inst = [len([v for v in np.unique(labels[i]) if v >= 2]) for i in range(B)]
    print(f"# stage-1 only:  {dt_s1 * 1000:7.2f} ms/batch  "
          f"({dt_s1 / B * 1000:6.2f} ms/img)")
    print(f"# full 2-stage:  {dt_full * 1000:7.2f} ms/batch  "
          f"({dt_full / B * 1000:6.2f} ms/img)  [pipelined stream]")
    print(f"# stage-2 cost:  {(dt_full - dt_s1) * 1000:7.2f} ms/batch")
    print(f"# crop occupancy: {n_inst} of {T} slots/img "
          f"(mean {np.mean(n_inst):.1f}); crop-network budget P={P_used} "
          f"of {B * T} slots (bucketed compaction)")

    img_per_sec = B / dt_full
    trained_img_per_sec = None

    # ---- informational: the trained-model regime with the EXACT tile-skip
    # opt-in (decoder.tile_skip; bit-identical by contract,
    # tests/test_tile_skip.py). Random weights leave attention masks dense, so
    # the headline number above can't show what mask concentration buys.
    # Preferred path (round 4): REAL trained weights - the synthetic-scene
    # checkpoint (cli/train_msmformer --dataset synthetic; learning evidence
    # in scripts/eval_synthetic.py) measured on rendered held-out scenes.
    # NOT an accuracy-parity claim (trained on procedural scenes, not TOD);
    # clearly non-headline. Fallback when no checkpoint exists: the decisive-
    # heads proxy (scales mask/class heads so logits commit - a weaker proxy
    # that commits masks without spatially concentrating them).
    def _decisive(variables):
        def scale(path, v):
            keys = [getattr(k, "key", "") for k in path]
            if "mask_embed" in keys and "layers_2" in keys:
                return v * 30.0
            if "class_embed" in keys:
                return v * 20.0
            return v
        return jax.tree_util.tree_map_with_path(scale, variables)

    def _stream(s1_, s2_, buckets, w1, w2, n_iters=10):
        def pop_(pending):
            labels_, crops_, perm_, count_ = pending.popleft()
            P = next(b for b in buckets(perm_.shape[0]) if b >= int(count_))
            return labels_, s2_(w2, labels_, crops_, perm_, P=P)
        pending = deque(s1_(w1, img, xyz, osd=False) for _ in range(2))
        lab, ref_ = pop_(pending)
        lab, ref_ = np.asarray(lab), np.asarray(ref_)
        np.asarray(chk(pop_(pending)[1]))
        t0_ = time.perf_counter()
        pending, last_ = deque(), None
        for _ in range(n_iters):
            pending.append(s1_(w1, img, xyz, osd=False))
            if len(pending) > DEPTH:
                last_ = pop_(pending)[1]
        while pending:
            last_ = pop_(pending)[1]
        np.asarray(chk(last_))
        return (time.perf_counter() - t0_) / n_iters, lab, ref_

    try:
        from unseenobjectswithmeanshift_tpu.utils.checkpoint_io import (
            latest_checkpoint)

        # Prefer the COMMITTED release checkpoint (dict layout, optimizer
        # state stripped - scripts/export_checkpoint.py); fall back to a raw
        # training dir (TrainState layout) if one is present locally.
        # newest committed release first; fall back to raw training dirs
        releases = [os.path.join(_REPO, "checkpoints", r)
                    for r in ("msmformer_synthetic_r5",
                              "msmformer_synthetic_r4")]
        release_found = next((r for r in releases if os.path.isdir(r)), None)
        ckpt = release_found or latest_checkpoint(
            os.path.join(_REPO, "output/synth_r4"))
        crop_releases = [os.path.join(_REPO, "checkpoints",
                                      "msmformer_synthetic_r5_crop")]
        crop_release = next((r for r in crop_releases if os.path.isdir(r)),
                            None)
        crop_ckpt = crop_release or latest_checkpoint(
            os.path.join(_REPO, "output/synth_r5_crop"))
        if ckpt is not None:
            # real trained weights on rendered held-out scenes
            from unseenobjectswithmeanshift_tpu.data.synthetic_jax import (
                SyntheticDeviceLoader)
            from unseenobjectswithmeanshift_tpu.train.trainer import Trainer
            from unseenobjectswithmeanshift_tpu.utils import checkpoint_io

            def _load(path):
                # device_put ONCE: orbax restores to HOST numpy; numpy leaves
                # fed to a jit re-upload all ~200 MB of weights over the dev
                # tunnel on EVERY call (measured 16.7 s/batch vs 0.24)
                tr = Trainer(get_config("tabletop_pretrained"), dtype=dtype)
                st = tr.init_state(jax.random.PRNGKey(0), (H, W), batch_size=1)
                if path.startswith(os.path.join(_REPO, "checkpoints")):
                    # release layout: dict {params, batch_stats, step}
                    rel = checkpoint_io.restore(path, {
                        "params": jax.device_get(st.params),
                        "batch_stats": jax.device_get(st.batch_stats),
                        "step": jax.device_get(st.step)})
                    return jax.device_put({"params": rel["params"],
                                           "batch_stats": rel["batch_stats"]})
                st = checkpoint_io.restore(path, jax.device_get(st))
                return jax.device_put({"params": st.params,
                                       "batch_stats": st.batch_stats})

            tv1 = _load(ckpt)
            tv2 = _load(crop_ckpt) if crop_ckpt else tv1
            # the r5 release is trained on OCID-statistics scenes (denser
            # clutter); measure it in that regime - higher crop occupancy,
            # the honest throughput predictor. r4 keeps its original streams.
            style = "ocid" if (release_found and "r5" in release_found) \
                else "r4"
            sload = SyntheticDeviceLoader(B, height=H, width=W, max_gt=24,
                                          image_set="test", seed=7,
                                          augment=False, scene_style=style)
            sb = sload.batch_at(0)
            simg, sxyz = jnp.asarray(sb["image"]), jnp.asarray(sb["xyz"])

            def _stream_on(s1_, s2_, buckets, w1, w2, n_iters=10):
                def pop_(pending):
                    labels_, crops_, perm_, count_ = pending.popleft()
                    P = next(b for b in buckets(perm_.shape[0])
                             if b >= int(count_))
                    return labels_, s2_(w2, labels_, crops_, perm_, P=P)
                pending = deque(s1_(w1, simg, sxyz, osd=False)
                                for _ in range(2))
                lab, ref_ = pop_(pending)
                lab, ref_ = np.asarray(lab), np.asarray(ref_)
                np.asarray(chk(pop_(pending)[1]))
                t0_ = time.perf_counter()
                pending, last_ = deque(), None
                for _ in range(n_iters):
                    pending.append(s1_(w1, simg, sxyz, osd=False))
                    if len(pending) > DEPTH:
                        last_ = pop_(pending)[1]
                while pending:
                    last_ = pop_(pending)[1]
                np.asarray(chk(last_))
                return (time.perf_counter() - t0_) / n_iters, lab, ref_

            dt_tr, lab_tr, _ = _stream_on(s1, s2, pred._buckets, tv1, tv2)
            cfg_ts = get_config("tabletop_pretrained")
            cfg_crop_ts = get_config("crop_tabletop_pretrained")
            cfg_ts.decoder.tile_skip = True
            cfg_crop_ts.decoder.tile_skip = True
            pred_ts = TwoStagePredictor(cfg_ts, cfg_crop_ts, dtype=dtype)
            pred_ts._ensure_bucketed_jits()
            dt_ts, lab_ts, _ = _stream_on(pred_ts._s1_fn, pred_ts._s2_fn,
                                          pred_ts._buckets, tv1, tv2)
            occ = [len([v for v in np.unique(lab_tr[i]) if v >= 2])
                   for i in range(B)]
            agree1 = float(np.mean(lab_tr == lab_ts))
            trained_img_per_sec = B / dt_tr
            print(f"# TRAINED-CHECKPOINT regime (synthetic-scene weights "
                  f"{ckpt}, crop {crop_ckpt or 'REUSES whole-image weights'}, "
                  f"rendered held-out scenes). Round 4 showed trained models "
                  f"fill MORE crop slots than random weights, so this is the "
                  f"better predictor of OCID-parity throughput: "
                  + json.dumps({
                      "metric": "trained_ckpt_two_stage_images_per_sec",
                      "dense": round(B / dt_tr, 2),
                      "vs_target": round(trained_img_per_sec / TARGET, 4),
                      "tile_skip": round(B / dt_ts, 2),
                      "tile_skip_speedup": round(dt_tr / dt_ts, 3),
                      "s1_label_agreement": round(agree1, 4),
                      "crop_occupancy_mean": round(float(np.mean(occ)), 2),
                  }))
        else:
            dv1, dv2 = _decisive(v1), _decisive(v2)
            dt_dec, lab_dec, ref_dec = _stream(s1, s2, pred._buckets, dv1, dv2)
            cfg_ts = get_config("tabletop_pretrained")
            cfg_crop_ts = get_config("crop_tabletop_pretrained")
            cfg_ts.decoder.tile_skip = True
            cfg_crop_ts.decoder.tile_skip = True
            pred_ts = TwoStagePredictor(cfg_ts, cfg_crop_ts, dtype=dtype)
            pred_ts._ensure_bucketed_jits()
            dt_ts, lab_ts, ref_ts = _stream(pred_ts._s1_fn, pred_ts._s2_fn,
                                            pred_ts._buckets, dv1, dv2)
            agree1 = float(np.mean(lab_dec == lab_ts))
            agree2 = float(np.mean(ref_dec == ref_ts))
            print(f"# trained-regime proxy (decisive heads): "
                  f"{B / dt_dec:6.2f} img/s dense, "
                  f"{B / dt_ts:6.2f} img/s with tile-skip "
                  f"({dt_dec / dt_ts:.2f}x); label agreement "
                  f"s1={agree1:.4f} s2={agree2:.4f}. NOTE: decisive heads on "
                  f"random FEATURES make masks commit but not spatially "
                  f"concentrate, so occupancy stays ~100% and tile-skip pays "
                  f"its planning overhead - see the occupancy-controlled "
                  f"measurements in README (50% tiles -> 39.9 img/s "
                  f"projected, scripts/profile_tile_skip.py).")
    except Exception as e:  # informational only - never void the headline
        print(f"# trained-regime tile-skip block skipped: "
              f"{type(e).__name__}: {str(e)[:200]}")

    print(f"# vs_target (5x stretch, {TARGET:.0f} img/s): "
          f"random-weight {img_per_sec / TARGET:.4f}"
          + (f", trained-regime {trained_img_per_sec / TARGET:.4f}"
             if trained_img_per_sec else " (trained regime unavailable)"))
    print("# accuracy parity (87.3 OCID F-measure) remains BLOCKED on the "
          "published checkpoints + real OCID/OSD datasets (no egress); this "
          "is a throughput number only - see README 'Accuracy-parity status'")
    record = {
        "metric": "ocid_640x480_rgbd_two_stage_images_per_sec_per_chip",
        "value": round(img_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / H100_REFERENCE_IMG_PER_SEC, 4),
    }
    if trained_img_per_sec:
        # the trained-checkpoint dense number on held-out rendered scenes -
        # the honest regime (higher crop occupancy than random weights)
        record["trained_value"] = round(trained_img_per_sec, 3)
        record["trained_vs_baseline"] = round(
            trained_img_per_sec / H100_REFERENCE_IMG_PER_SEC, 4)
    print(json.dumps(record))


if __name__ == "__main__":
    ok, detail = wait_for_backend()
    if not ok:
        # Structured failure record: the driver still gets a parseable JSON
        # line documenting WHY there is no number this round.
        print(json.dumps({
            "metric": "ocid_640x480_rgbd_two_stage_images_per_sec_per_chip",
            "value": None,
            "unit": "images/sec",
            "vs_baseline": None,
            "error": detail,
        }))
        sys.exit(1)
    print(f"# {detail}")
    main()
