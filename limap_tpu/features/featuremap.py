"""Dense feature maps + differentiable interpolation.

Re-implements /root/reference/src/limap/features (FeatureMap /
FeatureInterpolator on ceres::Grid2D + the 746-line bicubic
ceresbase/interpolation.h) as batched, differentiable JAX sampling — the
pixel-level refinement terms (SOLD2 heatmaps, S2DNet feature
consistency) take gradients straight through these samplers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interpolate_bilinear(fmap: jnp.ndarray, points: jnp.ndarray):
    """fmap [H, W, C] (or [H, W]), points [..., 2] xy -> [..., C]."""
    squeeze = fmap.ndim == 2
    if squeeze:
        fmap = fmap[..., None]
    H, W, C = fmap.shape
    x = points[..., 0]
    y = points[..., 1]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    v = (fmap[y0, x0] * (1 - fx) * (1 - fy)
         + fmap[y0, x0 + 1] * fx * (1 - fy)
         + fmap[y0 + 1, x0] * (1 - fx) * fy
         + fmap[y0 + 1, x0 + 1] * fx * fy)
    return v[..., 0] if squeeze else v


def _cubic_weights(t):
    """Catmull-Rom cubic kernel weights for fractional offset t [...]."""
    t2 = t * t
    t3 = t2 * t
    w0 = -0.5 * t3 + t2 - 0.5 * t
    w1 = 1.5 * t3 - 2.5 * t2 + 1.0
    w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * t
    w3 = 0.5 * t3 - 0.5 * t2
    return jnp.stack([w0, w1, w2, w3], axis=-1)


def interpolate_bicubic(fmap: jnp.ndarray, points: jnp.ndarray):
    """Bicubic (Catmull-Rom) sampling, C1-smooth like Ceres' Grid2D
    interpolator; fmap [H, W, C] or [H, W], points [..., 2] xy."""
    squeeze = fmap.ndim == 2
    if squeeze:
        fmap = fmap[..., None]
    H, W, C = fmap.shape
    x = points[..., 0]
    y = points[..., 1]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 1, W - 3)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 1, H - 3)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    wx = _cubic_weights(fx)  # [..., 4]
    wy = _cubic_weights(fy)
    out = 0.0
    for j in range(4):
        row = 0.0
        for i in range(4):
            row = row + wx[..., i, None] * fmap[y0 + j - 1, x0 + i - 1]
        out = out + wy[..., j, None] * row
    return out[..., 0] if squeeze else out


class FeatureMap:
    """Thin wrapper mirroring features/featuremap.h:21-92."""

    def __init__(self, array, interpolation: str = "bicubic"):
        self.array = jnp.asarray(array)
        self.interpolation = interpolation

    def h(self):
        return self.array.shape[0]

    def w(self):
        return self.array.shape[1]

    def channels(self):
        return 1 if self.array.ndim == 2 else self.array.shape[2]

    def interpolate(self, points):
        fn = (interpolate_bicubic if self.interpolation == "bicubic"
              else interpolate_bilinear)
        return fn(self.array, jnp.asarray(points))


def extract_line_patches(fmap: jnp.ndarray, seg_start: jnp.ndarray,
                         seg_end: jnp.ndarray, n_along: int = 32,
                         n_perp: int = 5, perp_spacing: float = 2.0):
    """Rotated line-aligned patches (features/line_patch_extractor.h).

    fmap [H, W, C]; seg_start/seg_end [N, 2].
    Returns [N, n_along, n_perp, C] sampled features.
    """
    d = seg_end - seg_start
    length = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d / (length + 1e-8)
    n = jnp.stack([-d[..., 1], d[..., 0]], axis=-1)
    t_along = jnp.linspace(0.0, 1.0, n_along)
    t_perp = (jnp.arange(n_perp) - (n_perp - 1) / 2.0) * perp_spacing
    base = seg_start[:, None, :] + t_along[None, :, None] \
        * (seg_end - seg_start)[:, None, :]              # [N, A, 2]
    pts = base[:, :, None, :] + t_perp[None, None, :, None] \
        * n[:, None, None, :]                            # [N, A, P, 2]
    return interpolate_bilinear(fmap, pts)
