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
