"""Native (C++) host runtime: fused preprocessing + evaluation inner loops.

Auto-builds uoms_native.so with g++ on first import (cached); every entry point
has a numpy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "uoms_native.cpp")
_SO = os.path.join(_DIR, "uoms_native.so")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
    except Exception:
        return None

    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C")
    u16 = np.ctypeslib.ndpointer(np.uint16, flags="C")
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C")
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C")
    i64 = np.ctypeslib.ndpointer(np.int64, flags="C")
    c = ctypes

    lib.preprocess_rgbd.argtypes = [u8, u16, c.c_int, c.c_int, c.c_float,
                                    c.c_float, c.c_float, c.c_float, f32, f32, f32]
    lib.seg2bmap.argtypes = [u8, c.c_int, c.c_int, u8]
    lib.boundary_overlap_counts.argtypes = [u8, u8, c.c_int, c.c_int, c.c_int, i64]
    lib.pairwise_mask_stats.argtypes = [i32, i32, c.c_int, i32, c.c_int, i32,
                                        c.c_int, i64, i64, i64]
    lib.lzf_decompress.argtypes = [u8, c.c_int64, u8, c.c_int64]
    lib.lzf_decompress.restype = c.c_int64
    _lib = lib
    return _lib


def preprocess_rgbd(bgr_u8, depth_mm_u16, fx, fy, px, py, pixel_means_bgr):
    """Fused normalize + XYZ; returns (image f32 [H,W,3], xyz f32 [H,W,3])."""
    lib = get_lib()
    h, w = bgr_u8.shape[:2]
    if lib is None:
        from ..utils.preprocess import compute_xyz, normalize_image_ucn

        img = normalize_image_ucn(bgr_u8)
        xyz = compute_xyz((depth_mm_u16 / 1000.0).astype(np.float32),
                          fx, fy, px, py) if depth_mm_u16 is not None else None
        return img, xyz
    img = np.empty((h, w, 3), np.float32)
    xyz = np.empty((h, w, 3), np.float32) if depth_mm_u16 is not None else None
    means = np.asarray(pixel_means_bgr, np.float32)
    lib.preprocess_rgbd(
        np.ascontiguousarray(bgr_u8),
        np.ascontiguousarray(depth_mm_u16 if depth_mm_u16 is not None
                             else np.zeros((h, w), np.uint16)),
        h, w, fx, fy, px, py, means, img,
        xyz if xyz is not None else np.empty((h, w, 3), np.float32))
    return img, xyz


def seg2bmap(seg):
    lib = get_lib()
    if lib is None:
        from ..utils.evaluation import seg2bmap as np_seg2bmap

        return np_seg2bmap(seg)
    h, w = seg.shape
    out = np.empty((h, w), np.uint8)
    lib.seg2bmap(np.ascontiguousarray(seg.astype(np.uint8)), h, w, out)
    return out.astype(bool)


def boundary_overlap(pred_mask, gt_mask, bound_th=0.003):
    lib = get_lib()
    if lib is None:
        from ..utils.evaluation import boundary_overlap as np_bo

        return np_bo(pred_mask, gt_mask, bound_th)
    h, w = pred_mask.shape
    bound_pix = bound_th if bound_th >= 1 else int(
        np.ceil(bound_th * np.linalg.norm(pred_mask.shape)))
    out = np.zeros(2, np.int64)
    lib.boundary_overlap_counts(
        np.ascontiguousarray(pred_mask.astype(np.uint8)),
        np.ascontiguousarray(gt_mask.astype(np.uint8)), h, w, int(bound_pix), out)
    return int(out[0]), int(out[1])


def pairwise_mask_stats(pred, gt, gt_ids, pred_ids):
    """One-pass intersections + sizes. Returns (inter [ng,np], gt_sizes, pred_sizes)."""
    lib = get_lib()
    gt_ids = np.asarray(gt_ids, np.int32)
    pred_ids = np.asarray(pred_ids, np.int32)
    ng, npred = len(gt_ids), len(pred_ids)
    if lib is None:
        inter = np.zeros((ng, npred), np.int64)
        gt_sizes = np.array([(gt == g).sum() for g in gt_ids], np.int64)
        pred_sizes = np.array([(pred == p).sum() for p in pred_ids], np.int64)
        for i, g in enumerate(gt_ids):
            gm = gt == g
            for j, p in enumerate(pred_ids):
                inter[i, j] = np.logical_and(gm, pred == p).sum()
        return inter, gt_sizes, pred_sizes
    inter = np.zeros((ng, npred), np.int64)
    gt_sizes = np.zeros(ng, np.int64)
    pred_sizes = np.zeros(npred, np.int64)
    p32 = np.ascontiguousarray(pred.reshape(-1).astype(np.int32))
    g32 = np.ascontiguousarray(gt.reshape(-1).astype(np.int32))
    lib.pairwise_mask_stats(p32, g32, p32.size, gt_ids, ng, pred_ids, npred,
                            inter, gt_sizes, pred_sizes)
    return inter, gt_sizes, pred_sizes


def lzf_decompress(data: bytes, expected: int):
    """Native LZF decompression (PCL binary_compressed PCD codec); returns the
    decompressed bytes or None if the native lib is unavailable / the stream
    is malformed (callers fall back to the pure-Python decoder)."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    out = np.empty(expected, np.uint8)
    n = lib.lzf_decompress(np.ascontiguousarray(src), len(data), out, expected)
    if n < 0:
        return None
    return out[:n].tobytes()
