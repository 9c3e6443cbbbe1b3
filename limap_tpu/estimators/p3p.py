"""Batched P3P minimal solver (Grunert) + rigid alignment.

The reference dispatches to PoseLib's p3p
(/root/reference/src/limap/estimators/absolute_pose/joint_pose_estimator.cc:113-122).
Here the Grunert depth quartic is solved with the branch-free solver in
:mod:`limap_tpu.ops.polynomial` and poses are recovered with a batched
3-point Kabsch alignment — thousands of minimal samples evaluated in one
kernel for RANSAC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from limap_tpu.ops.polynomial import solve_quartic_real

_EPS = 1e-12


def _norm(v):
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + _EPS)


def kabsch(src: jnp.ndarray, dst: jnp.ndarray):
    """Rigid transform dst = R @ src + t for [..., N, 3] point sets."""
    cs = jnp.mean(src, axis=-2, keepdims=True)
    cd = jnp.mean(dst, axis=-2, keepdims=True)
    H = jnp.einsum("...ni,...nj->...ij", src - cs, dst - cd)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik",
                                    jnp.swapaxes(Vt, -1, -2),
                                    jnp.swapaxes(U, -1, -2)))
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    # R = V diag(1,1,det) U^T with H = src_c^T dst_c
    R = jnp.einsum("...ji,...j,...jk->...ik", Vt, D, jnp.swapaxes(U, -1, -2))
    t = cd[..., 0, :] - jnp.einsum("...ij,...j->...i", R, cs[..., 0, :])
    return R, t


def p3p(bearings: jnp.ndarray, points: jnp.ndarray):
    """Grunert P3P, batched.

    Args:
      bearings: [..., 3, 3] unit rays in the camera frame.
      points:   [..., 3, 3] world points.

    Returns (R [..., 4, 3, 3], t [..., 4, 3], valid [..., 4]) — up to 4
    solutions with world-to-camera convention x_cam = R x_world + t.
    """
    f1, f2, f3 = bearings[..., 0, :], bearings[..., 1, :], bearings[..., 2, :]
    X1, X2, X3 = points[..., 0, :], points[..., 1, :], points[..., 2, :]

    a2 = jnp.sum((X2 - X3) ** 2, -1)
    b2 = jnp.sum((X1 - X3) ** 2, -1)
    c2 = jnp.sum((X1 - X2) ** 2, -1)
    ca = jnp.sum(f2 * f3, -1)  # cos(alpha)
    cb = jnp.sum(f1 * f3, -1)  # cos(beta)
    cg = jnp.sum(f1 * f2, -1)  # cos(gamma)

    b2s = jnp.where(b2 < _EPS, _EPS, b2)
    acb = (a2 - c2) / b2s
    apb = (a2 + c2) / b2s

    A4 = (acb - 1.0) ** 2 - 4.0 * c2 / b2s * ca**2
    A3 = 4.0 * (acb * (1.0 - acb) * cb - (1.0 - apb) * ca * cg
                + 2.0 * c2 / b2s * ca**2 * cb)
    A2 = 2.0 * (acb**2 - 1.0 + 2.0 * acb**2 * cb**2
                + 2.0 * (b2 - c2) / b2s * ca**2
                - 4.0 * apb * ca * cb * cg
                + 2.0 * (b2 - a2) / b2s * cg**2)
    A1 = 4.0 * (-acb * (1.0 + acb) * cb + 2.0 * a2 / b2s * cg**2 * cb
                - (1.0 - apb) * ca * cg)
    A0 = (1.0 + acb) ** 2 - 4.0 * a2 / b2s * cg**2

    A4s = jnp.where(jnp.abs(A4) < _EPS, _EPS, A4)
    v = solve_quartic_real(A3 / A4s, A2 / A4s, A1 / A4s, A0 / A4s)  # [..,4]
    v_ok = jnp.isfinite(v) & (v > 0)
    v = jnp.nan_to_num(v, nan=1.0)

    cbx = cb[..., None]
    cax = ca[..., None]
    cgx = cg[..., None]
    acbx = acb[..., None]
    denom_u = 2.0 * (cgx - v * cax)
    denom_u = jnp.where(jnp.abs(denom_u) < _EPS, _EPS, denom_u)
    u = ((-1.0 + acbx) * v**2 - 2.0 * acbx * cbx * v + 1.0 + acbx) / denom_u

    s1_sq = b2[..., None] / jnp.maximum(1.0 + v**2 - 2.0 * v * cbx, _EPS)
    s1 = jnp.sqrt(jnp.maximum(s1_sq, 0.0))
    s2 = u * s1
    s3 = v * s1
    ok = v_ok & (s1 > 0) & (s2 > 0) & (s3 > 0)

    # camera-frame points per solution: [..., 4, 3pts, 3]
    cam_pts = jnp.stack(
        [s1[..., None] * f1[..., None, :],
         s2[..., None] * f2[..., None, :],
         s3[..., None] * f3[..., None, :]], axis=-2)
    world_pts = jnp.stack([X1, X2, X3], axis=-2)[..., None, :, :]
    world_pts = jnp.broadcast_to(world_pts, cam_pts.shape)
    R, t = kabsch(world_pts, cam_pts)
    return R, t, ok
