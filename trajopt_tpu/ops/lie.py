"""SO(3)/SE(3) utilities — rotation construction, log map, pose error.

Provides the TPU-native equivalent of the pose math the reference gets from
Eigen/tesseract: ``calcTransformError`` semantics (relative transform in the
target frame; rotation error as the angle-axis log), used by the cartesian
terms (reference consumer: trajopt/src/kinematic_terms.cpp:187-346).

All functions are elementwise-vectorizable jnp ops (vmap-safe, static
shapes, no data-dependent branching — `where`-based numerical guards).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def rpy_to_matrix(rpy):
    """URDF fixed-axis roll-pitch-yaw to rotation matrix (Rz @ Ry @ Rx)."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], -1)
    return jnp.stack([row0, row1, row2], -2)


def quat_wxyz_to_matrix(q):
    """Unit quaternion (w, x, y, z) to rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], -2)


def axis_angle_matrix(axis, angle):
    """Rodrigues rotation about a (normalized) axis."""
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    K = skew(axis)
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), K.shape)
    return eye + s * K + (1.0 - c) * (K @ K)


def skew(v):
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], z, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], z], -1),
    ], -2)


def rot_log(R):
    """Matrix log of a rotation: angle*axis vector, safe near 0 and pi.

    Uses the quaternion route (stable everywhere) rather than the trace
    formula (singular at pi).
    """
    # rotation matrix -> quaternion (w, x, y, z), Shepperd's method simplified
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate constructions; pick the numerically largest pivot
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) / 2.0
    w0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], -1)
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) / 2.0
    w1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], -1)
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) / 2.0
    w2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], -1)
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) / 2.0
    w3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], -1)

    cands = jnp.stack([w0, w1, w2, w3], -2)  # (..., 4, 4)
    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22,
                        -m00 - m11 + m22], -1)
    idx = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), -2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical hemisphere (w >= 0) so angle in [0, pi]
    q = jnp.where(q[..., :1] < 0, -q, q)

    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(vn, w)
    # angle/sin(angle/2) with Taylor fallback near zero
    scale = jnp.where(vn > 1e-8, angle / jnp.maximum(vn, _EPS), 2.0 / jnp.maximum(w, 0.5))
    return v * scale[..., None]


def transform_error(R_t, p_t, R_s, p_s):
    """[translation; angle-axis] of target^-1 * source, in the target frame.

    Matches tesseract's calcTransformError used by CartPoseErrCalculator
    (consumed at trajopt/src/kinematic_terms.cpp:187-346).
    """
    dp = jnp.einsum("...ji,...j->...i", R_t, p_s - p_t)
    dR = jnp.einsum("...ji,...jk->...ik", R_t, R_s)
    return jnp.concatenate([dp, rot_log(dR)], axis=-1)
