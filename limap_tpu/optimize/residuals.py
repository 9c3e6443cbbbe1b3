"""Batched residual kernels for refinement / BA / localization.

The exact math of the reference's Ceres functors, as differentiable JAX
functions (the LM engine takes Jacobians with jacfwd/vmap instead of
Ceres autodiff Jets):

- line geometric residual = cosine-weighted endpoint-perpendicular
  distance to the projected infinite line
  (/root/reference/src/limap/optimize/line_refinement/cost_functions.h:96-195)
- point geometric residual = pinhole reprojection error
- VP constraint = sine distance between rotated line direction and the
  VP-implied direction (cost_functions.h:35-90)
- support weights = length / 30
  (/root/reference/src/limap/base/linetrack.cc ComputeLineWeights)
"""

from __future__ import annotations

import jax.numpy as jnp

from limap_tpu.base.camera import CameraViewsBatch
from limap_tpu.base.infinite_line import (line_world_to_pixel,
                                          minimal_to_plucker)
from limap_tpu.base.lines import EPS, Segments


def cosine_weighted_perpendicular_dist2d(coor: jnp.ndarray, p1: jnp.ndarray,
                                         p2: jnp.ndarray,
                                         alpha: float = 10.0) -> jnp.ndarray:
    """Residual pair [..., 2] (cost_functions.h:97-128).

    coor: [..., 3] homogeneous 2D line; p1/p2: [..., 2] segment endpoints.
    Both endpoint-line distances, multiplied by exp(alpha * (1 - |cos|))
    where cos is between the projected line direction and the segment.
    """
    direc_norm = jnp.sqrt(coor[..., 0] ** 2 + coor[..., 1] ** 2 + EPS)
    d1 = (p1[..., 0] * coor[..., 0] + p1[..., 1] * coor[..., 1]
          + coor[..., 2]) / direc_norm
    d2 = (p2[..., 0] * coor[..., 0] + p2[..., 1] * coor[..., 1]
          + coor[..., 2]) / direc_norm

    dir2d = jnp.stack([-coor[..., 1], coor[..., 0]], axis=-1) \
        / direc_norm[..., None]
    seg_dir = p2 - p1
    seg_norm = jnp.sqrt(jnp.sum(seg_dir * seg_dir, axis=-1) + EPS)
    cosine = jnp.abs(jnp.sum(dir2d * seg_dir, axis=-1)) / seg_norm
    cosine = jnp.minimum(cosine, 1.0)
    weight = jnp.exp(alpha * (1.0 - cosine))
    return jnp.stack([d1 * weight, d2 * weight], axis=-1)


def line_geometric_residual(uvec: jnp.ndarray, wvec: jnp.ndarray,
                            views: CameraViewsBatch, line2d: Segments,
                            alpha: float = 10.0) -> jnp.ndarray:
    """GeometricRefinementFunctor (cost_functions.h:130-195): [..., 2]."""
    d, m = minimal_to_plucker(uvec, wvec)
    coor = line_world_to_pixel(views.kvec, views.qvec, views.tvec, d, m)
    return cosine_weighted_perpendicular_dist2d(coor, line2d.start,
                                                line2d.end, alpha)


def point_geometric_residual(p3d: jnp.ndarray, views: CameraViewsBatch,
                             p2d: jnp.ndarray) -> jnp.ndarray:
    """Pinhole reprojection residual [..., 2]."""
    return views.project(p3d) - p2d


def vp_constraint_residual(uvec: jnp.ndarray, wvec: jnp.ndarray,
                           views: CameraViewsBatch,
                           vp: jnp.ndarray) -> jnp.ndarray:
    """VPConstraintsFunctor (cost_functions.h:35-90): [...] sine dist."""
    from limap_tpu.base.infinite_line import get_direction_from_vp
    from limap_tpu.base.pose import quat_rotate
    d, _ = minimal_to_plucker(uvec, wvec)
    d_rot = quat_rotate(views.qvec, d)
    d_rot = d_rot / (jnp.linalg.norm(d_rot, axis=-1, keepdims=True) + EPS)
    direc = get_direction_from_vp(vp, views.kvec)
    cr = jnp.cross(d_rot, direc)
    return jnp.linalg.norm(cr, axis=-1)


def compute_line_weights(line2d: Segments) -> jnp.ndarray:
    """length / 30 per supporting 2D segment (linetrack.cc
    ComputeLineWeights)."""
    return line2d.length() / 30.0


def huber_weight(r2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight of the Huber loss on squared residual norm r2.

    Equivalent to Ceres' HuberLoss applied per residual block: weight =
    1 inside delta^2, delta/|r| outside.
    """
    r = jnp.sqrt(r2 + EPS)
    return jnp.where(r <= delta, 1.0, delta / r)
