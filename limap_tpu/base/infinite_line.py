"""Infinite 2D/3D lines: homogeneous coords, Plücker, minimal (orthonormal)
parameterization, and the Plücker projection math used by the optimizers.

Batched re-implementation of
/root/reference/src/limap/base/infinite_line.{h,cc} and the templated
Ceres-side math in ceresbase/line_transforms.h and
ceresbase/line_projection.h.  Everything broadcasts over leading batch
dimensions and is differentiable (the LM engine takes Jacobians through
these functions instead of Ceres autodiff).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from limap_tpu.base.camera import CameraViewsBatch
from limap_tpu.base.lines import Segments
from limap_tpu.base.pose import quat_rotate, quat_to_rotmat, rotmat_to_quat

EPS = 1e-12


def _normalize(v):
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + EPS)


# ======================================================================
# InfiniteLine2d — homogeneous coordinates [..., 3]
# ======================================================================
def infline2d_from_segment(seg: Segments) -> jnp.ndarray:
    """Homogeneous line coords from a 2D segment (infinite_line.cc:18-21)."""
    return seg.coords()


def infline2d_from_point_direction(p: jnp.ndarray,
                                   direc: jnp.ndarray) -> jnp.ndarray:
    """(p, unit direction) -> normalized homogeneous coords
    (infinite_line.cc:9-16)."""
    coor = jnp.stack(
        [direc[..., 1], -direc[..., 0],
         -direc[..., 1] * p[..., 0] + direc[..., 0] * p[..., 1]], axis=-1)
    return _normalize(coor)


def infline2d_direction(coords: jnp.ndarray) -> jnp.ndarray:
    """Unit direction of a homogeneous line (infinite_line.cc:37-39)."""
    return _normalize(jnp.stack([coords[..., 1], -coords[..., 0]], axis=-1))


def infline2d_point_projection(coords: jnp.ndarray,
                               q: jnp.ndarray) -> jnp.ndarray:
    """Project 2D point(s) q onto the infinite line (infinite_line.cc:23-29).

    Closed form perpendicular foot (equivalent to the reference's
    cross-product construction, but branch-free).
    """
    a, b, c = coords[..., 0], coords[..., 1], coords[..., 2]
    n2 = a * a + b * b
    d = (a * q[..., 0] + b * q[..., 1] + c) / (n2 + EPS)
    return jnp.stack([q[..., 0] - a * d, q[..., 1] - b * d], axis=-1)


def infline2d_point_distance(coords: jnp.ndarray,
                             q: jnp.ndarray) -> jnp.ndarray:
    a, b, c = coords[..., 0], coords[..., 1], coords[..., 2]
    n = jnp.sqrt(a * a + b * b + EPS)
    return jnp.abs(a * q[..., 0] + b * q[..., 1] + c) / n


def intersect_infinite_lines_2d(c1: jnp.ndarray, c2: jnp.ndarray):
    """Intersection of two homogeneous 2D lines (infinite_line.cc:41-53).

    Returns (point [..., 2], valid mask).
    """
    p_homo = jnp.cross(c1, c2)
    p_homo = _normalize(p_homo)
    valid = jnp.abs(p_homo[..., 2]) >= EPS
    z = jnp.where(valid, p_homo[..., 2], 1.0)
    return p_homo[..., :2] / z[..., None], valid


# ======================================================================
# InfiniteLine3d — Plücker coordinates (d, m)
# ======================================================================
class InfiniteLines3d(NamedTuple):
    """Batched Plücker lines: unit direction ``d`` [..., 3] and moment
    ``m`` [..., 3] (infinite_line.h:39-63)."""

    d: jnp.ndarray
    m: jnp.ndarray

    @classmethod
    def from_point_direction(cls, p, direc) -> "InfiniteLines3d":
        direc = _normalize(direc)
        return cls(d=direc, m=jnp.cross(p, direc))

    @classmethod
    def from_segments(cls, seg: Segments) -> "InfiniteLines3d":
        d = seg.direction()
        return cls(d=d, m=jnp.cross(seg.start, d))

    def point(self) -> jnp.ndarray:
        """Closest point on the line to the origin."""
        return jnp.cross(self.d, self.m)

    def point_projection(self, q: jnp.ndarray) -> jnp.ndarray:
        """Perpendicular foot of q on the line (infinite_line.cc:73-78)."""
        m_q = self.m + jnp.cross(self.d, q)
        return q + jnp.cross(self.d, m_q)

    def point_distance(self, q: jnp.ndarray) -> jnp.ndarray:
        return jnp.linalg.norm(q - self.point_projection(q), axis=-1)

    def projection(self, views: CameraViewsBatch) -> jnp.ndarray:
        """Project to 2D homogeneous line coords (infinite_line.cc:107-121).

        Implemented via the transformed-moment formula rather than the
        full 4x4 Plücker matrix sandwich: for P = K [R | t],
        l ~ K^{-T}-dual of (R [m]x R^T - t (Rd)^T + (Rd) t^T) which is the
        exact math of Line_WorldToPixel (ceresbase/line_projection.h:51-80).
        """
        return line_world_to_pixel(views.kvec, views.qvec, views.tvec,
                                   self.d, self.m)

    def unprojection(self, p2d: jnp.ndarray,
                     views: CameraViewsBatch) -> jnp.ndarray:
        """Closest point on the 3D line to the camera ray of pixel p2d
        (infinite_line.cc:123-149)."""
        p1 = self.point()
        p2 = views.center()
        C0 = p1 - p2
        C1 = _normalize(self.d)
        C2 = views.ray_direction(p2d)
        A12 = jnp.sum(C1 * C2, axis=-1)
        B1 = -jnp.sum(C0 * C1, axis=-1)
        B2 = -jnp.sum(C0 * C2, axis=-1)
        det = 1.0 - A12 * A12
        t_par = B1
        t_gen = (B1 - B2 * A12) / jnp.where(det < EPS, 1.0, det)
        t = jnp.where(det < EPS, t_par, t_gen)
        return p1 + t[..., None] * C1

    def project_from_infinite_line(self,
                                   other: "InfiniteLines3d") -> jnp.ndarray:
        """Point on self closest to the line ``other``
        (infinite_line.cc:151-163)."""
        l1, m1 = self.d, self.m
        l2, m2 = other.d, other.m
        cr = jnp.cross(l1, l2)
        p = (-jnp.cross(m1, jnp.cross(l2, cr))
             + jnp.sum(m2 * cr, axis=-1, keepdims=True) * l1)
        return p / (jnp.sum(cr * cr, axis=-1, keepdims=True) + EPS)

    def project_to_infinite_line(self, other: "InfiniteLines3d"):
        return other.project_from_infinite_line(self)


# ======================================================================
# Minimal (orthonormal) parameterization: uvec (SO(3) quat) + wvec (SO(2))
# ======================================================================
class MinimalInfiniteLines3d(NamedTuple):
    """Orthonormal representation (Bartoli & Sturm), used by all
    optimizers (infinite_line.h:66-77)."""

    uvec: jnp.ndarray  # [..., 4] quaternion
    wvec: jnp.ndarray  # [..., 2] unit 2-vector

    @classmethod
    def from_plucker(cls, line: InfiniteLines3d) -> "MinimalInfiniteLines3d":
        """Plücker -> orthonormal (infinite_line.cc:180-223), branch-free.

        Column 0 = d/|d|; column 1 = m/|m| (or an arbitrary orthogonal
        vector when |m| ~ 0); column 2 completes the right-handed basis.
        """
        a = line.d
        b = line.m
        a_n = _normalize(a)
        b_norm = jnp.linalg.norm(b, axis=-1, keepdims=True)

        # wvec = (1, |b|) normalized — note |a| == 1 for stored lines.
        w = jnp.concatenate([jnp.ones_like(b_norm), b_norm], axis=-1)
        wvec = _normalize(w)

        # regular branch: col1 = b/|b|
        col1_reg = b / (b_norm + EPS)
        # degenerate branch (|b| ~ 0): any unit vector orthogonal to a.
        # Use the cross product with the axis least aligned with a.
        ref = jnp.where(
            (jnp.abs(a_n[..., :1]) < 0.9),
            jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], a.dtype), a.shape),
            jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], a.dtype), a.shape))
        col1_deg = _normalize(jnp.cross(a_n, ref))
        degenerate = b_norm[..., 0] <= EPS
        col1 = jnp.where(degenerate[..., None], col1_deg, col1_reg)
        col2 = _normalize(jnp.cross(a_n, col1))
        Q = jnp.stack([a_n, col1, col2], axis=-1)  # columns
        return cls(uvec=rotmat_to_quat(Q), wvec=wvec)

    @classmethod
    def from_segments(cls, seg: Segments) -> "MinimalInfiniteLines3d":
        return cls.from_plucker(InfiniteLines3d.from_segments(seg))

    def to_plucker(self) -> InfiniteLines3d:
        """Orthonormal -> Plücker (infinite_line.cc:225-231 and
        MinimalPluckerToPlucker in ceresbase/line_transforms.h:9-29)."""
        d, m = minimal_to_plucker(self.uvec, self.wvec)
        return InfiniteLines3d(d=d, m=m)


def minimal_to_plucker(uvec: jnp.ndarray,
                       wvec: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(uvec, wvec) -> (d, m); differentiable core used by residuals."""
    Q = quat_to_rotmat(uvec)
    d = Q[..., :, 0]
    w1 = jnp.abs(wvec[..., 0])
    w2 = jnp.abs(wvec[..., 1])
    b_norm = w2 / (w1 + EPS)
    m = Q[..., :, 1] * b_norm[..., None]
    return d, m


# ======================================================================
# Plücker projection (the exact math of the BA residual chain)
# ======================================================================
def line_img_from_cam(kvec: jnp.ndarray, mvec: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame moment -> normalized 2D homogeneous line coords.

    Dual of K [m]x K^T (ceresbase/line_projection.h:15-48).  For
    K = [[fx,0,cx],[0,fy,cy],[0,0,1]] the dual-vector sandwich reduces to
    the closed form used here (algebraically identical, fewer flops):
    coor = [fy*m0, fx*m1, fx*fy*m2 + cy*fy*m0*? ...] — we keep the full
    3x3 contraction for clarity since XLA fuses it anyway.
    """
    fx, fy = kvec[..., 0], kvec[..., 1]
    cx, cy = kvec[..., 2], kvec[..., 3]
    m0, m1, m2 = mvec[..., 0], mvec[..., 1], mvec[..., 2]
    # coor = adj(K)^T m  (line transforms under the point homography K as
    # l' = K^{-T} l; with the skew sandwich this is det(K) K^{-T} m)
    c0 = fy * m0
    c1 = fx * m1
    c2 = fx * fy * m2 - cx * fy * m0 - cy * fx * m1
    coor = jnp.stack([c0, c1, c2], axis=-1)
    return coor / (jnp.linalg.norm(coor, axis=-1, keepdims=True) + EPS)


def line_world_to_pixel(kvec, qvec, tvec, dvec, mvec) -> jnp.ndarray:
    """World Plücker line -> 2D homogeneous coords in the image.

    m_cam = R m + t x (R d)  — the vector form of
    R [m]x R^T - t (Rd)^T + (Rd) t^T (ceresbase/line_projection.h:51-80);
    extracting the dual vector of that skew expression gives exactly
    Rm + cross(t, Rd), the standard Plücker moment transform under
    X' = RX + t.
    """
    Rm = quat_rotate(qvec, mvec)
    Rd = quat_rotate(qvec, dvec)
    m_cam = Rm + jnp.cross(tvec, Rd)
    return line_img_from_cam(kvec, m_cam)


def get_direction_from_vp(vp: jnp.ndarray, kvec: jnp.ndarray) -> jnp.ndarray:
    """VP (homogeneous pixel) -> unit camera-frame direction
    (ceresbase/line_projection.h:125-135)."""
    fx, fy = kvec[..., 0], kvec[..., 1]
    cx, cy = kvec[..., 2], kvec[..., 3]
    d = jnp.stack(
        [vp[..., 0] / fx - cx / fx * vp[..., 2],
         vp[..., 1] / fy - cy / fy * vp[..., 2],
         vp[..., 2]], axis=-1)
    return _normalize(d)


# ======================================================================
# Segment re-estimation from supports
# ======================================================================
def segment_from_infinite_line_2d_supports(
        line: InfiniteLines3d, views: CameraViewsBatch, line2d: Segments,
        support_mask: jnp.ndarray, num_outliers: int = 2) -> Segments:
    """Re-trim a 3D segment from supporting 2D segments
    (infinite_line.cc:233-263), batched over supports with masking.

    Args:
      line: a single infinite 3D line (fields shaped [3]).
      views: S supporting views (fields shaped [S, ...]).
      line2d: S supporting 2D segments.
      support_mask: [S] bool, False entries are padding.
      num_outliers: how many extreme projections to trim per side; the
        reference indexes values[num_outliers] unconditionally, we clamp
        so tiny tracks stay valid.
    """
    direction = line.d
    p_ref = line.point()

    coords = line.projection(views)  # [S, 3]
    # project both 2D endpoints onto the projected infinite line
    ps2d = infline2d_point_projection(coords, line2d.start)
    pe2d = infline2d_point_projection(coords, line2d.end)
    ps3d = line.unprojection(ps2d, views)
    pe3d = line.unprojection(pe2d, views)
    ts = jnp.sum((ps3d - p_ref) * direction, axis=-1)
    te = jnp.sum((pe3d - p_ref) * direction, axis=-1)
    values = jnp.concatenate([ts, te], axis=-1)  # [2S]
    big = jnp.float32(1e30)
    lo_vals = jnp.sort(jnp.where(jnp.tile(support_mask, 2), values, big))
    hi_vals = jnp.sort(jnp.where(jnp.tile(support_mask, 2), values, -big))
    n_valid = 2 * jnp.sum(support_mask)
    k = jnp.clip(num_outliers, 0, jnp.maximum((n_valid - 1) // 2, 0))
    t_lo = lo_vals[k]
    t_hi = hi_vals[values.shape[0] - 1 - k]  # == descending sort at k
    start = p_ref + direction * t_lo
    end = p_ref + direction * t_hi
    return Segments(start=start, end=end)


def segment_from_infinite_line_3d_supports(
        line: InfiniteLines3d, line3d: Segments,
        support_mask: jnp.ndarray, num_outliers: int = 2) -> Segments:
    """Same, from supporting 3D segments (infinite_line.cc:265-287)."""
    direction = line.d
    # anchor on the projection of the first valid support's start point
    first = jnp.argmax(support_mask)
    p_ref = line.point_projection(line3d.start[first])
    ts = jnp.sum((line3d.start - p_ref) * direction, axis=-1)
    te = jnp.sum((line3d.end - p_ref) * direction, axis=-1)
    values = jnp.concatenate([ts, te], axis=-1)
    big = jnp.float32(1e30)
    lo_vals = jnp.sort(jnp.where(jnp.tile(support_mask, 2), values, big))
    hi_vals = jnp.sort(jnp.where(jnp.tile(support_mask, 2), values, -big))
    n_valid = 2 * jnp.sum(support_mask)
    k = jnp.clip(num_outliers, 0, jnp.maximum((n_valid - 1) // 2, 0))
    t_lo = lo_vals[k]
    t_hi = hi_vals[values.shape[0] - 1 - k]
    return Segments(start=p_ref + direction * t_lo,
                    end=p_ref + direction * t_hi)
