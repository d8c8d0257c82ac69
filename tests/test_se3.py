"""SE(3) pose helper tests (ref: lib/utils/se3.py semantics).

The quaternion toolkit is validated against scipy.spatial.transform
(available in the image) and against rotation-matrix composition, so the
module needs no transforms3d at runtime.
"""

import numpy as np
import pytest

from unseenobjectswithmeanshift_tpu.utils.se3 import (
    se3_inverse, se3_mul, egocentric2allocentric, allocentric2egocentric,
    T_inv_transform, rotation_x, rotation_y, rotation_z,
    qmult, qinverse, quat2mat, mat2quat, euler2quat_sxyz,
)


def _random_pose(rng):
    q = rng.randn(4)
    R = quat2mat(q / np.linalg.norm(q))
    RT = np.zeros((3, 4), np.float32)
    RT[:3, :3] = R
    RT[:3, 3] = rng.randn(3)
    return RT


def test_axis_rotations_match_scipy(rng):
    from scipy.spatial.transform import Rotation
    for deg in (0.0, 30.0, 90.0, -135.0, 280.0):
        for fn, axis in ((rotation_x, "x"), (rotation_y, "y"), (rotation_z, "z")):
            R = fn(deg)
            ref = Rotation.from_euler(axis, deg, degrees=True).as_matrix()
            np.testing.assert_allclose(R, ref, atol=1e-6)


def test_euler2quat_sxyz_matches_scipy(rng):
    from scipy.spatial.transform import Rotation
    for _ in range(20):
        ai, aj, ak = rng.uniform(-np.pi, np.pi, 3)
        R = quat2mat(euler2quat_sxyz(ai, aj, ak))
        # static (extrinsic) xyz == scipy lowercase 'xyz'
        ref = Rotation.from_euler("xyz", [ai, aj, ak]).as_matrix()
        np.testing.assert_allclose(R, ref, atol=1e-9)


def test_quat_roundtrip_and_mult(rng):
    for _ in range(50):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        R = quat2mat(q)
        q2 = mat2quat(R)
        # mat2quat canonicalizes to w >= 0; compare up to sign
        np.testing.assert_allclose(np.abs(np.dot(q, q2)), 1.0, atol=1e-9)
        # qmult composes like matrix product
        p = rng.randn(4)
        p /= np.linalg.norm(p)
        np.testing.assert_allclose(quat2mat(qmult(q, p)),
                                   quat2mat(q) @ quat2mat(p), atol=1e-9)
        # inverse
        np.testing.assert_allclose(quat2mat(qmult(q, qinverse(q))),
                                   np.eye(3), atol=1e-9)


def test_se3_mul_inverse(rng):
    for _ in range(10):
        RT1, RT2 = _random_pose(rng), _random_pose(rng)
        # composition applies RT2 first: x -> R1 (R2 x + t2) + t1
        x = rng.randn(3).astype(np.float32)
        y_ref = RT1[:3, :3] @ (RT2[:3, :3] @ x + RT2[:3, 3]) + RT1[:3, 3]
        RT = se3_mul(RT1, RT2)
        np.testing.assert_allclose(RT[:3, :3] @ x + RT[:3, 3], y_ref,
                                   rtol=1e-4, atol=1e-4)
        ident = se3_mul(RT1, se3_inverse(RT1))
        np.testing.assert_allclose(ident[:3, :3], np.eye(3), atol=1e-5)
        np.testing.assert_allclose(ident[:3, 3], 0.0, atol=1e-5)
        assert RT.dtype == np.float32 and RT.shape == (3, 4)


def test_allocentric_egocentric_roundtrip(rng):
    for _ in range(20):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        T = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5),
                      rng.uniform(0.5, 3.0)])  # object in front of camera (+z)
        qa = egocentric2allocentric(q, T)
        qe = allocentric2egocentric(qa, T)
        np.testing.assert_allclose(np.abs(np.dot(q, qe)), 1.0, atol=1e-9)
    # on the axis the formula's arctan2(*, -T[2]) measures from (T0 = [0,0,-1]
    # makes both angles zero): the viewpoint rotation is identity there
    q = np.array([0.5, 0.5, 0.5, 0.5])
    T0 = np.array([0.0, 0.0, -1.0])
    np.testing.assert_allclose(egocentric2allocentric(q, T0), q, atol=1e-9)


def test_t_inv_transform():
    src = np.array([0.1, 0.2, 1.0])
    tgt = np.array([0.3, -0.1, 2.0])
    d = T_inv_transform(src, tgt)
    np.testing.assert_allclose(d[0], 0.3 / 2.0 - 0.1)
    np.testing.assert_allclose(d[1], -0.1 / 2.0 - 0.2)
    np.testing.assert_allclose(d[2], np.log(0.5), rtol=1e-6)
    assert d.dtype == np.float32
