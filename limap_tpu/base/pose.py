"""Quaternion / rotation utilities (batched, jittable).

Convention: quaternions are ``[w, x, y, z]`` (Hamilton, COLMAP/Ceres
convention), matching the reference's pose helpers
(/root/reference/src/limap/base/pose.h:15-29).  All functions broadcast
over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize quaternion(s) to unit norm. ``q``: [..., 4]."""
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + EPS)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [..., 4] (w,x,y,z) -> rotation matrix [..., 3, 3].

    Matches ``ceres::QuaternionToRotation`` (used by the reference via
    colmap's QuaternionToRotationMatrix) for unit quaternions; input is
    normalized first so non-unit storage is safe.
    """
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz,
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (w,x,y,z).

    Branch-free Shepperd-style extraction: all four candidate pivots are
    computed and the numerically largest is selected with a gather, so
    the function is vmappable/jittable with no data-dependent control
    flow (the reference relies on Eigen's quaternion constructor).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # Pivot values 4*q_i^2 for i in (w, x, y, z).
    pw = 1.0 + m00 + m11 + m22
    px = 1.0 + m00 - m11 - m22
    py = 1.0 - m00 + m11 - m22
    pz = 1.0 - m00 - m11 + m22
    pivots = jnp.stack([pw, px, py, pz], axis=-1)
    s = 2.0 * jnp.sqrt(jnp.maximum(pivots, EPS))  # [..., 4] = 4*|q_pivot|

    sw, sx, sy, sz = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
    cand_w = jnp.stack(
        [0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw],
        axis=-1,
    )
    cand_x = jnp.stack(
        [(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx],
        axis=-1,
    )
    cand_y = jnp.stack(
        [(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy],
        axis=-1,
    )
    cand_z = jnp.stack(
        [(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz],
        axis=-1,
    )
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [...,4,4]
    best = jnp.argmax(pivots, axis=-1)
    idx = best[..., None, None]
    q = jnp.take_along_axis(cands, jnp.broadcast_to(idx, idx.shape[:-1] + (4,)),
                            axis=-2)[..., 0, :]
    # Canonical sign: w >= 0.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v [..., 3] by quaternion(s) q [..., 4]."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions [..., 4]."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def axis_angle_to_quat(aa: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: axis-angle [..., 3] -> quaternion [..., 4].

    Uses a Taylor-safe formulation for small angles so it is
    differentiable at zero (needed by the LM tangent-space updates).
    """
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + EPS)
    half = 0.5 * theta
    # sin(theta/2)/theta with series fallback near 0
    k = jnp.where(theta2 > 1e-12, jnp.sin(half) / theta, 0.5 - theta2 / 48.0)
    return jnp.concatenate([jnp.cos(half), k * aa], axis=-1)


def so2_rotate(w: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate a unit 2-vector w [..., 2] by angle theta [...]."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [c * w[..., 0] - s * w[..., 1], s * w[..., 0] + c * w[..., 1]], axis=-1
    )


def pose_center(qvec: jnp.ndarray, tvec: jnp.ndarray) -> jnp.ndarray:
    """Camera center C = -R^T t.  qvec [..., 4], tvec [..., 3]."""
    R = quat_to_rotmat(qvec)
    return -jnp.einsum("...ji,...j->...i", R, tvec)


def projdepth(qvec: jnp.ndarray, tvec: jnp.ndarray,
              p3d: jnp.ndarray) -> jnp.ndarray:
    """Depth of world point(s) in the camera frame (z of R p + t).

    Reference: CameraPose::projdepth (/root/reference/src/limap/base/camera.cc:276).
    """
    p_cam = quat_rotate(qvec, p3d) + tvec
    return p_cam[..., 2]
