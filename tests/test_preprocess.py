import numpy as np
import jax.numpy as jnp

from unseenobjectswithmeanshift_tpu.utils.preprocess import (
    compute_xyz, normalize_image_ucn, normalize_image_coco, pad_to_multiple,
    build_matrix_of_indices,
)


def test_compute_xyz_matches_reference_formula(rng):
    h, w = 12, 17
    depth = rng.rand(h, w).astype(np.float32)
    fx, fy, px, py = 612.937, 613.173, 322.549, 248.158
    xyz = compute_xyz(depth, fx, fy, px, py)
    # reference: indices[...,1] is the column index, indices[...,0] the row index
    indices = build_matrix_of_indices(h, w)
    x_ref = (indices[..., 1] - px) * depth / fx
    y_ref = (indices[..., 0] - py) * depth / fy
    np.testing.assert_allclose(xyz[..., 0], x_ref, rtol=1e-6)
    np.testing.assert_allclose(xyz[..., 1], y_ref, rtol=1e-6)
    np.testing.assert_allclose(xyz[..., 2], depth, rtol=0)


def test_compute_xyz_jax_numpy_agree(rng):
    depth = rng.rand(8, 9).astype(np.float32)
    a = compute_xyz(depth, 600.0, 600.0, 4.0, 4.0)
    b = compute_xyz(jnp.asarray(depth), 600.0, 600.0, 4.0, 4.0)
    np.testing.assert_allclose(np.asarray(b), a, rtol=1e-6)


def test_normalize_ucn():
    im = np.full((4, 5, 3), 255, dtype=np.uint8)
    out = normalize_image_ucn(im)
    np.testing.assert_allclose(
        out[0, 0],
        1.0 - np.array([102.9801, 115.9465, 122.7717]) / 255.0,
        rtol=1e-6,
    )


def test_normalize_coco():
    im = np.zeros((2, 2, 3), dtype=np.uint8)
    out = normalize_image_coco(im)
    np.testing.assert_allclose(out[0, 0, 0], -123.675 / 58.395, rtol=1e-6)


def test_pad_to_multiple():
    x = np.ones((1, 480, 640, 3), dtype=np.float32)
    p, (h, w) = pad_to_multiple(x, 32)
    assert p.shape == (1, 480, 640, 3) and (h, w) == (480, 640)
    x = np.ones((1, 481, 641, 3), dtype=np.float32)
    p, (h, w) = pad_to_multiple(x, 32)
    assert p.shape == (1, 512, 672, 3)
    assert p[0, 481:, :, :].sum() == 0 and p[0, :, 641:, :].sum() == 0
    assert (h, w) == (481, 641)
