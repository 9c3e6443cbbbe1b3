"""Depth-based 3D segment fitting — batched RANSAC on TPU.

Re-designs /root/reference/src/limap/fitting/fitting.py +
fitting/line3d_estimator.cc (LO-RANSAC on RansacLib): instead of
rasterizing each segment with bresenham and running a serial RANSAC per
segment, we sample a fixed number of points along *every* segment of an
image at once, unproject them with the depth map, and score a fixed bank
of line hypotheses for all segments in one ``[N, H, S]`` kernel,
followed by a TLS refit on the inliers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from limap_tpu.base.camera import CameraViewsBatch
from limap_tpu.base.lines import EPS, Segments
from limap_tpu.merging.aggregator import principal_direction

_BIG = jnp.float32(1e30)


def sample_segment_depths(segs2d: Segments, depth: jnp.ndarray,
                          n_samples: int) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                   jnp.ndarray]:
    """Sample pixels uniformly along each 2D segment and read depths.

    Replaces the reference's bresenham rasterization (fitting.py:28-38)
    with uniform sampling + nearest depth lookup — same spatial coverage
    for line support, but a fixed [N, S] shape.

    Returns (points2d [N, S, 2], depths [N, S], valid [N, S]).
    """
    H, W = depth.shape
    t = jnp.linspace(0.0, 1.0, n_samples)
    pts = (segs2d.start[:, None, :]
           + t[None, :, None] * (segs2d.end - segs2d.start)[:, None, :])
    xi = jnp.round(pts[..., 0]).astype(jnp.int32)
    yi = jnp.round(pts[..., 1]).astype(jnp.int32)
    inside = (xi >= 0) & (yi >= 0) & (xi < W) & (yi < H)
    xi = jnp.clip(xi, 0, W - 1)
    yi = jnp.clip(yi, 0, H - 1)
    d = depth[yi, xi]
    valid = inside & jnp.isfinite(d) & (d > 0)
    return pts, d, valid


def unproject_points(pts2d: jnp.ndarray, depths: jnp.ndarray,
                     view: CameraViewsBatch) -> jnp.ndarray:
    """Pixels + depths -> world points; view fields are unbatched [4]/[3]."""
    from limap_tpu.base.pose import quat_normalize, quat_rotate
    u = (pts2d[..., 0] - view.kvec[2]) / view.kvec[0]
    v = (pts2d[..., 1] - view.kvec[3]) / view.kvec[1]
    p_cam = jnp.stack([u * depths, v * depths, depths], axis=-1)
    qc = view.qvec * jnp.asarray([1.0, -1, -1, -1], view.qvec.dtype)
    return quat_rotate(quat_normalize(qc), p_cam - view.tvec)


def _point_line_dist(points, a, b):
    """Distance from points [..., S, 3] to infinite line through a,b
    [..., 3]."""
    d = b - a
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + EPS)
    disp = points - a[..., None, :]
    along = jnp.sum(disp * d[..., None, :], axis=-1)
    d2 = jnp.sum(disp * disp, axis=-1) - along * along
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def fit_lines_ransac(points: jnp.ndarray, valid: jnp.ndarray,
                     inlier_th: jnp.ndarray, key: jax.Array,
                     n_hypotheses: int = 32,
                     min_inlier_ratio: float = 0.6,
                     min_points: int = 7) -> Segments:
    """Batched line RANSAC over [N, S, 3] point sets.

    Args:
      points: [N, S, 3] candidate points per segment.
      valid: [N, S] sample validity.
      inlier_th: [N] per-segment inlier distance threshold (depth-scaled,
        fitting.py:51-52).
      key: PRNG key for hypothesis sampling.
      n_hypotheses: hypothesis pairs scored per segment.
      min_inlier_ratio / min_points: acceptance tests
        (fitting.py:8-18,44).

    Returns Segments [N, 3] with score = inlier ratio (score <= 0 marks
    rejected segments, mirroring the reference returning None).
    """
    N, S, _ = points.shape
    k1, k2 = jax.random.split(key)
    idx_a = jax.random.randint(k1, (N, n_hypotheses), 0, S)
    idx_b = jax.random.randint(k2, (N, n_hypotheses), 0, S)
    idx_b = jnp.where(idx_b == idx_a, (idx_b + 1) % S, idx_b)

    rows = jnp.arange(N)[:, None]
    pa = points[rows, idx_a]  # [N, H, 3]
    pb = points[rows, idx_b]
    hyp_ok = valid[rows, idx_a] & valid[rows, idx_b]

    dist = _point_line_dist(points[:, None], pa, pb)  # [N, H, S]
    is_inlier = (dist <= inlier_th[:, None, None]) & valid[:, None, :]
    counts = jnp.sum(is_inlier, axis=-1)
    counts = jnp.where(hyp_ok, counts, -1)
    best = jnp.argmax(counts, axis=-1)  # [N]

    inliers = is_inlier[jnp.arange(N), best]  # [N, S]
    n_valid = jnp.sum(valid, axis=-1)
    n_inl = jnp.sum(inliers, axis=-1)
    ratio = n_inl / jnp.maximum(n_valid, 1)

    # TLS refit on inliers + extreme projections as endpoints
    direc, center = principal_direction(points, inliers)
    proj = jnp.sum((points - center[:, None]) * direc[:, None], axis=-1)
    t_lo = jnp.min(jnp.where(inliers, proj, _BIG), axis=-1)
    t_hi = jnp.max(jnp.where(inliers, proj, -_BIG), axis=-1)
    start = center + direc * t_lo[:, None]
    end = center + direc * t_hi[:, None]

    ok = ((ratio >= min_inlier_ratio) & (n_valid > min_points)
          & (n_inl >= 2))
    score = jnp.where(ok, ratio, -1.0)
    start = jnp.where(ok[:, None], start, 0.0)
    end = jnp.where(ok[:, None], end, 0.0)
    return Segments(start=start, end=end, score=score)


def estimate_segs3d_from_depth(segs2d: Segments, depth: jnp.ndarray,
                               view: CameraViewsBatch, key: jax.Array,
                               ransac_th: float = 0.75,
                               min_percentage_inliers: float = 0.6,
                               var2d: float = 5.0,
                               n_samples: int = 64,
                               n_hypotheses: int = 32) -> Segments:
    """All segments of one image -> 3D segments (fitting.py:21-54).

    ``view`` holds a single camera (fields [4]/[4]/[3]).
    """
    pts2d, d, valid = sample_segment_depths(segs2d, depth, n_samples)
    points = unproject_points(pts2d, d, view)
    # depth-scaled threshold: var2d * median_depth / focal * ransac_th
    med = jnp.nanmedian(jnp.where(valid, d, jnp.nan), axis=-1)
    med = jnp.nan_to_num(med, nan=1.0)
    f = 0.5 * (view.kvec[0] + view.kvec[1])
    inlier_th = ransac_th * (var2d * med / f)
    return fit_lines_ransac(points, valid, inlier_th, key,
                            n_hypotheses=n_hypotheses,
                            min_inlier_ratio=min_percentage_inliers)


def estimate_segs3d_from_points3d(segs2d: Segments, p3d_map: jnp.ndarray,
                                  view: CameraViewsBatch, key: jax.Array,
                                  img_hw, ransac_th: float = 0.75,
                                  min_percentage_inliers: float = 0.6,
                                  var2d: float = 5.0,
                                  n_samples: int = 64,
                                  n_hypotheses: int = 32) -> Segments:
    """Point-cloud variant (reference fitting.py:56-102, InLoc-style):
    instead of a depth map, a dense per-pixel 3D point map [H, W, 3]
    (NaN/0 = invalid) supplies candidate points along each segment."""
    H, W = img_hw
    t = jnp.linspace(0.0, 1.0, n_samples)
    pts = (segs2d.start[:, None, :]
           + t[None, :, None] * (segs2d.end - segs2d.start)[:, None, :])
    xi = jnp.clip(jnp.round(pts[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(pts[..., 1]).astype(jnp.int32), 0, H - 1)
    inside = ((pts[..., 0] >= 0) & (pts[..., 1] >= 0)
              & (pts[..., 0] < W) & (pts[..., 1] < H))
    points = p3d_map[yi, xi]
    finite = jnp.all(jnp.isfinite(points), -1) \
        & (jnp.sum(jnp.abs(points), -1) > 0)
    valid = inside & finite
    # threshold scaled by median ray depth (fitting.py:100-101)
    ray_depth = jnp.linalg.norm(points - view.center(), axis=-1)
    med = jnp.nanmedian(jnp.where(valid, ray_depth, jnp.nan), axis=-1)
    med = jnp.nan_to_num(med, nan=1.0)
    inlier_th = ransac_th * (var2d * med / (0.7 * max(H, W)))
    return fit_lines_ransac(points, valid, inlier_th, key,
                            n_hypotheses=n_hypotheses,
                            min_inlier_ratio=min_percentage_inliers)
