"""SE(3) pose helpers (host-side numpy).

Robot/pose plumbing inherited by the reference from PoseCNN
(ref: lib/utils/se3.py) — 3x4 [R|t] composition/inversion, the
egocentric<->allocentric quaternion conversion used when regressing
rotations of off-center objects, the T_inv_transform pixel-delta
parameterization, and axis rotation constructors.

This is deliberately numpy, not JAX: poses are per-object host metadata
(ROS messages, dataset annotations), never part of a jitted compute path.
Quaternion utilities are implemented inline (w-first convention, matching
transforms3d) so the framework carries no transforms3d dependency.
"""

import numpy as np

__all__ = [
    "se3_inverse", "se3_mul", "egocentric2allocentric",
    "allocentric2egocentric", "T_inv_transform",
    "rotation_x", "rotation_y", "rotation_z",
    "qmult", "qinverse", "quat2mat", "mat2quat", "euler2quat_sxyz",
]


# ---------------------------------------------------------------- quaternions
# w-first unit quaternions [w, x, y, z]

def qmult(q1, q2):
    """Hamilton product q1 * q2 (rotation q2 applied first)."""
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], dtype=np.float64)


def qinverse(q):
    q = np.asarray(q, dtype=np.float64)
    conj = q * np.array([1.0, -1.0, -1.0, -1.0])
    return conj / np.dot(q, q)


def quat2mat(q):
    """Unit quaternion -> 3x3 rotation matrix."""
    w, x, y, z = np.asarray(q, dtype=np.float64) / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def mat2quat(R):
    """3x3 rotation matrix -> unit quaternion (w >= 0)."""
    R = np.asarray(R, dtype=np.float64)
    # Shepperd's method: pick the largest of the four candidate denominators
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                      (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        q = np.array([(R[2, 1] - R[1, 2]) / s, 0.25 * s,
                      (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s])
    elif R[1, 1] >= R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        q = np.array([(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s,
                      0.25 * s, (R[1, 2] + R[2, 1]) / s])
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        q = np.array([(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
                      (R[1, 2] + R[2, 1]) / s, 0.25 * s])
    if q[0] < 0:
        q = -q
    return q / np.linalg.norm(q)


def _axis_quat(axis, angle):
    h = 0.5 * angle
    q = np.zeros(4, dtype=np.float64)
    q[0] = np.cos(h)
    q[1 + axis] = np.sin(h)
    return q


def euler2quat_sxyz(ai, aj, ak):
    """Static-frame x-y-z Euler angles -> quaternion: R = Rz(ak) Ry(aj) Rx(ai)
    (transforms3d euler2quat(..., axes='sxyz') semantics)."""
    return qmult(_axis_quat(2, ak), qmult(_axis_quat(1, aj), _axis_quat(0, ai)))


# ---------------------------------------------------------------- SE(3) 3x4

def se3_inverse(RT):
    """Inverse of a 3x4 [R|t] pose: [R^T | -R^T t]."""
    RT = np.asarray(RT)
    R, T = RT[:3, :3], RT[:3, 3]
    out = np.zeros((3, 4), dtype=np.float32)
    out[:3, :3] = R.T
    out[:3, 3] = -R.T @ T
    return out


def se3_mul(RT1, RT2):
    """Compose 3x4 poses: result applies RT2 first, then RT1."""
    RT1, RT2 = np.asarray(RT1), np.asarray(RT2)
    out = np.zeros((3, 4), dtype=np.float32)
    out[:3, :3] = RT1[:3, :3] @ RT2[:3, :3]
    out[:3, 3] = RT1[:3, :3] @ RT2[:3, 3] + RT1[:3, 3]
    return out


# ------------------------------------------------- viewpoint parameterization

def _view_quat(T):
    """Quaternion rotating the camera ray toward translation T onto -z."""
    dx = np.arctan2(T[0], -T[2])
    dy = np.arctan2(T[1], -T[2])
    return euler2quat_sxyz(-dy, -dx, 0.0)


def egocentric2allocentric(qt, T):
    """Remove the viewpoint-dependent part of an egocentric rotation."""
    return qmult(qinverse(_view_quat(T)), qt)


def allocentric2egocentric(qt, T):
    """Re-apply the viewpoint rotation to an allocentric quaternion."""
    return qmult(_view_quat(T), qt)


def T_inv_transform(T_src, T_tgt):
    """Delta from source to target translation in (pixel-offset, log-depth)
    parameterization: (x/z, y/z) differences + log depth ratio."""
    return np.array([
        T_tgt[0] / T_tgt[2] - T_src[0] / T_src[2],
        T_tgt[1] / T_tgt[2] - T_src[1] / T_src[2],
        np.log(T_src[2] / T_tgt[2]),
    ], dtype=np.float32)


# ------------------------------------------------------------ axis rotations

def _rot(theta_deg, axis):
    t = np.deg2rad(theta_deg)
    c, s = np.cos(t), np.sin(t)
    i, j = [(1, 2), (0, 2), (0, 1)][axis]
    R = np.eye(3, dtype=np.float32)
    R[i, i] = c
    R[j, j] = c
    if axis == 1:  # y-axis: sign pattern flips
        R[i, j] = s
        R[j, i] = -s
    else:
        R[i, j] = -s
        R[j, i] = s
    return R


def rotation_x(theta):
    """Rotation about x by theta DEGREES (reference convention)."""
    return _rot(theta, 0)


def rotation_y(theta):
    return _rot(theta, 1)


def rotation_z(theta):
    return _rot(theta, 2)
