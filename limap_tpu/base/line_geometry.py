"""Batched segment <-> view geometry: projection, sensitivity, uncertainty.

Vectorized equivalents of the Line3d member functions that touch cameras
(/root/reference/src/limap/base/linebase.cc:93-117) plus the 2D<->3D
unprojection helper (linebase.cc:119-131).
"""

from __future__ import annotations

import jax.numpy as jnp

from limap_tpu.base.camera import CameraViewsBatch
from limap_tpu.base.lines import EPS, Segments
from limap_tpu.base.pose import quat_normalize, quat_rotate


def project_segments(seg3d: Segments, views: CameraViewsBatch) -> Segments:
    """Project 3D segments into views (linebase.cc:93-98); broadcasting."""
    return Segments(start=views.project(seg3d.start),
                    end=views.project(seg3d.end))


def sensitivity(seg3d: Segments, views: CameraViewsBatch) -> jnp.ndarray:
    """Viewing sensitivity in degrees: 90 - angle(direction, midpoint ray)
    (linebase.cc:100-107). 0 = perfect fronto-view, 90 = collapsing."""
    seg2d = project_segments(seg3d, views)
    ray = views.ray_direction(seg2d.midpoint())
    cosv = jnp.abs(jnp.sum(seg3d.direction() * ray, axis=-1))
    angle = jnp.degrees(jnp.arccos(jnp.clip(cosv, -1.0, 1.0)))
    return 90.0 - angle


def compute_uncertainty(seg3d: Segments, views: CameraViewsBatch,
                        var2d: float = 5.0) -> jnp.ndarray:
    """Per-view depth uncertainty (linebase.cc:109-116)."""
    d1 = views.projdepth(seg3d.start)
    d2 = views.projdepth(seg3d.end)
    return views.uncertainty(0.5 * (d1 + d2), var2d)


def unproject_segments(seg2d: Segments, views: CameraViewsBatch,
                       depths: jnp.ndarray) -> Segments:
    """Lift 2D segments to 3D with endpoint depths [..., 2]
    (linebase.cc:119-131)."""
    def lift(p2d, z):
        u = (p2d[..., 0] - views.kvec[..., 2]) / views.kvec[..., 0]
        v = (p2d[..., 1] - views.kvec[..., 3]) / views.kvec[..., 1]
        p_cam = jnp.stack([u * z, v * z, z], axis=-1)
        qc = views.qvec * jnp.asarray([1.0, -1, -1, -1], views.qvec.dtype)
        return quat_rotate(quat_normalize(qc), p_cam - views.tvec)

    return Segments(start=lift(seg2d.start, depths[..., 0]),
                    end=lift(seg2d.end, depths[..., 1]),
                    depths=depths)
