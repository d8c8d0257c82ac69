"""TPU-native framework for Unseen Object Instance Segmentation (MSMFormer + UCN).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
YoungSean/UnseenObjectsWithMeanShift (reference mounted read-only at /root/reference):

- UCN embedding backbone (dilated ResNet34-8s FCN, RGB/depth/RGBD fusion) producing
  L2-normalized 64-dim per-pixel embeddings  (ref: lib/networks/SEG.py).
- MSMFormer: Mask2Former-style transformer decoder whose cross/self attention is
  hypersphere (von Mises-Fisher) attention - a differentiable mean-shift update of
  object queries  (ref: MSMFormer/meanshiftformer/modeling/transformer_decoder/).
- Non-learned vMF mean-shift clustering for the legacy UCN inference path
  (ref: lib/utils/mean_shift.py).
- Two-stage zoom-in inference (whole image + per-RoI crops), here fully batched and
  fused into one jit graph  (ref: lib/fcn/test_dataset.py, lib/fcn/test_utils.py).
- Hungarian-matched DETR-style mask loss training  (ref: modeling/criterion.py).
- OCID/OSD evaluation with Objects/Boundary P/R/F metrics  (ref: lib/utils/evaluation.py).

Everything on the compute path is jit-compiled, fixed-shape, and batched; hot kernels
are Pallas; parallelism is jax.sharding over a device mesh.
"""

__version__ = "0.1.0"

# Lazy top-level API (imports stay cheap; jax/flax load on first use):
#   from unseenobjectswithmeanshift_tpu import get_config, build_two_stage_predictor
_API = {
    "get_config": ("unseenobjectswithmeanshift_tpu.config", "get_config"),
    "PRESETS": ("unseenobjectswithmeanshift_tpu.config", "PRESETS"),
    "Config": ("unseenobjectswithmeanshift_tpu.config", "Config"),
    "build_model": ("unseenobjectswithmeanshift_tpu.models.meta_arch",
                    "build_model"),
    "build_two_stage_predictor": (
        "unseenobjectswithmeanshift_tpu.pipeline.factory",
        "build_two_stage_predictor"),
    "TwoStagePredictor": ("unseenobjectswithmeanshift_tpu.pipeline.two_stage",
                          "TwoStagePredictor"),
    "UCNPredictor": ("unseenobjectswithmeanshift_tpu.pipeline.ucn",
                     "UCNPredictor"),
    "Trainer": ("unseenobjectswithmeanshift_tpu.train.trainer", "Trainer"),
}

__all__ = sorted(_API) + ["__version__"]


def __getattr__(name):
    if name in _API:
        import importlib

        module, attr = _API[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return __all__
