"""Native C++ runtime vs the numpy implementations."""

import numpy as np
import pytest

from unseenobjectswithmeanshift_tpu import native
from unseenobjectswithmeanshift_tpu.utils import evaluation as ev
from unseenobjectswithmeanshift_tpu.utils.preprocess import (
    compute_xyz, normalize_image_ucn,
)
from unseenobjectswithmeanshift_tpu.config import UCN_PIXEL_MEANS_BGR


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native build unavailable")
    return l


def test_native_builds(lib):
    assert lib is not None


def test_preprocess_matches_numpy(lib, rng):
    bgr = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
    depth = (rng.rand(24, 32) * 3000).astype(np.uint16)
    img, xyz = native.preprocess_rgbd(bgr, depth, 600.0, 610.0, 16.0, 12.0,
                                      UCN_PIXEL_MEANS_BGR)
    np.testing.assert_allclose(img, normalize_image_ucn(bgr), atol=1e-6)
    ref = compute_xyz((depth / 1000.0).astype(np.float32), 600.0, 610.0, 16.0, 12.0)
    np.testing.assert_allclose(xyz, ref, atol=1e-5)


def test_seg2bmap_matches_numpy(lib, rng):
    for _ in range(5):
        seg = (rng.rand(20, 27) > 0.6)
        np.testing.assert_array_equal(native.seg2bmap(seg), ev.seg2bmap(seg))


def test_boundary_overlap_matches_numpy(lib, rng):
    a = np.zeros((48, 64), bool); a[10:30, 12:40] = True
    b = np.zeros((48, 64), bool); b[12:32, 10:38] = True
    assert native.boundary_overlap(a, b) == ev.boundary_overlap(a, b)


def test_pairwise_stats(lib, rng):
    gt = rng.randint(0, 4, (30, 30)).astype(np.int32)
    pred = rng.randint(0, 3, (30, 30)).astype(np.int32)
    gt_ids = np.array([1, 2, 3])
    pred_ids = np.array([1, 2])
    inter, gs, ps = native.pairwise_mask_stats(pred, gt, gt_ids, pred_ids)
    for i, g in enumerate(gt_ids):
        assert gs[i] == (gt == g).sum()
        for j, p in enumerate(pred_ids):
            assert inter[i, j] == np.logical_and(gt == g, pred == p).sum()
    for j, p in enumerate(pred_ids):
        assert ps[j] == (pred == p).sum()


def _lzf_compress(data: bytes) -> bytes:
    """Minimal valid LZF compressor (greedy 3-byte hash matching) - test
    harness only; exercises literal runs, short/long back references and the
    length==7 extension byte of the decoders."""
    out = bytearray()
    lit = bytearray()
    table = {}
    i, n = 0, len(data)

    def flush():
        nonlocal lit
        while lit:
            chunk = lit[:32]
            out.append(len(chunk) - 1)
            out.extend(chunk)
            lit = lit[len(chunk):]

    while i < n:
        key = bytes(data[i:i + 3])
        j = table.get(key, -1)
        if len(key) == 3 and j >= 0 and i - j - 1 < (1 << 13):
            length = 0
            while (i + length < n and length < 264
                   and data[j + length] == data[i + length]):
                length += 1
            if length >= 3:
                flush()
                off = i - j - 1
                l = length - 2
                if l < 7:
                    out.append((l << 5) | (off >> 8))
                else:
                    out.append((7 << 5) | (off >> 8))
                    out.append(l - 7)
                out.append(off & 0xFF)
                for k in range(length):
                    table[bytes(data[i + k:i + k + 3])] = i + k
                i += length
                continue
        table[key] = i
        lit.append(data[i])
        i += 1
    flush()
    return bytes(out)


def test_lzf_native_matches_python_oracle(lib, rng):
    """Native LZF == the pure-Python decoder on compressible, random and
    RLE-overlap streams (the PCL binary_compressed codec)."""
    from unseenobjectswithmeanshift_tpu.data.pcd import _lzf_decompress
    from unseenobjectswithmeanshift_tpu.native import lzf_decompress

    cases = [
        bytes(rng.randint(0, 256, 5000, dtype=np.uint8)),      # incompressible
        (b"abcdefgh" * 700)[:5000],                            # periodic
        bytes(np.zeros(4096, np.uint8)),                       # pure RLE
        b"x" * 3 + bytes(rng.randint(0, 4, 2000, dtype=np.uint8)),
        b"",
    ]
    for raw in cases:
        comp = _lzf_compress(raw)
        want = _lzf_decompress(comp, len(raw))
        assert want == raw                                     # compressor sane
        got = lzf_decompress(comp, len(raw))
        assert got == raw

    # hand-crafted overlapping back reference (RLE semantics: ref advances
    # through bytes the decoder itself just wrote)
    stream = bytes([0, ord("A"), (7 << 5) | 0, 20, 0])  # literal 'A', copy 29 from off 1
    want = _lzf_decompress(stream, 30)
    assert want == b"A" * 30
    assert lzf_decompress(stream, 30) == want


def test_pcd_binary_compressed_roundtrip(lib, tmp_path, rng):
    """A binary_compressed PCD (field-major LZF body) reads back the exact
    xyz grid through the native decoder."""
    from unseenobjectswithmeanshift_tpu.data.pcd import read_pcd_xyz

    H, W = 6, 8
    xyz = rng.rand(H * W, 3).astype(np.float32)
    body = xyz[:, 0].tobytes() + xyz[:, 1].tobytes() + xyz[:, 2].tobytes()
    comp = _lzf_compress(body)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
        "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {W}\nHEIGHT {H}\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {H * W}\nDATA binary_compressed\n").encode()
    import struct
    path = tmp_path / "t.pcd"
    path.write_bytes(header + struct.pack("<II", len(comp), len(body)) + comp)
    got = read_pcd_xyz(str(path))
    np.testing.assert_array_equal(got.reshape(-1, 3), xyz)
