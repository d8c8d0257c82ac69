"""Minimal PCD (Point Cloud Data) reader - replaces the reference's open3d
dependency for OCID/OSD organized point clouds
(ref: lib/datasets/ocid_object.py:106-114, osd_object.py:100-108, which only read
the xyz fields and reshape to [H, W, 3]).

Supports ascii, binary, and binary_compressed (LZF) PCD v0.7 files.
"""

from __future__ import annotations

import re
import struct

import numpy as np

_DTYPES = {("F", 4): np.float32, ("F", 8): np.float64,
           ("I", 1): np.int8, ("I", 2): np.int16, ("I", 4): np.int32,
           ("U", 1): np.uint8, ("U", 2): np.uint16, ("U", 4): np.uint32}


def _lzf_decompress(data: bytes, expected: int) -> bytes:
    """LZF decompression (the PCL binary_compressed codec)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        ctrl = data[i]
        i += 1
        if ctrl < 32:  # literal run
            cnt = ctrl + 1
            out += data[i:i + cnt]
            i += cnt
        else:          # back reference
            length = ctrl >> 5
            if length == 7:
                length += data[i]
                i += 1
            ref = len(out) - ((ctrl & 0x1F) << 8) - data[i] - 1
            i += 1
            for _ in range(length + 2):
                out.append(out[ref])
                ref += 1
    return bytes(out)


def read_pcd_xyz(path: str) -> np.ndarray:
    """Read a PCD file, return [N, 3] float32 xyz with NaN -> 0
    (mirroring the reference's pcloud[np.isnan(pcloud)] = 0)."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            if not line or line.startswith("#"):
                continue
            key, _, val = line.partition(" ")
            header[key.upper()] = val
            if key.upper() == "DATA":
                break
        body = f.read()

    fields = header["FIELDS"].split()
    sizes = [int(s) for s in header["SIZE"].split()]
    types = header["TYPE"].split()
    counts = [int(c) for c in header.get("COUNT", " ".join(["1"] * len(fields))).split()]
    npoints = int(header["POINTS"])
    data_kind = header["DATA"].split()[0]

    dtype_fields = []
    for f_, s_, t_, c_ in zip(fields, sizes, types, counts):
        base = _DTYPES[(t_, s_)]
        if c_ == 1:
            dtype_fields.append((f_, base))
        else:
            dtype_fields.append((f_, base, (c_,)))
    rec = np.dtype(dtype_fields)

    if data_kind == "ascii":
        arr = np.loadtxt(body.decode("ascii", "ignore").splitlines(), dtype=np.float64)
        arr = arr.reshape(npoints, -1)
        idx = [fields.index(k) for k in ("x", "y", "z")]
        xyz = arr[:, idx].astype(np.float32)
    elif data_kind == "binary":
        arr = np.frombuffer(body[: rec.itemsize * npoints], dtype=rec)
        xyz = np.stack([arr["x"], arr["y"], arr["z"]], axis=1).astype(np.float32)
    elif data_kind == "binary_compressed":
        comp_size, uncomp_size = struct.unpack("<II", body[:8])
        # native C++ decoder (the Python loop is ~ms-per-cloud on OCID-scale
        # 640x480 organized clouds; the native path is ~100x faster), with the
        # pure-Python implementation as the always-available fallback/oracle
        from ..native import lzf_decompress as _native_lzf

        raw = _native_lzf(body[8:8 + comp_size], uncomp_size)
        if raw is None:
            raw = _lzf_decompress(body[8:8 + comp_size], uncomp_size)
        # binary_compressed stores data FIELD-MAJOR (all x, then all y, ...)
        xyz_cols = []
        offset = 0
        for f_, s_, t_, c_ in zip(fields, sizes, types, counts):
            width = s_ * c_ * npoints
            if f_ in ("x", "y", "z"):
                col = np.frombuffer(raw[offset:offset + width],
                                    dtype=_DTYPES[(t_, s_)])[:npoints]
                xyz_cols.append((f_, col))
            offset += width
        cols = dict(xyz_cols)
        xyz = np.stack([cols["x"], cols["y"], cols["z"]], axis=1).astype(np.float32)
    else:
        raise ValueError(f"unsupported PCD DATA kind: {data_kind}")

    xyz = np.nan_to_num(xyz, nan=0.0)
    return xyz
