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
import numpy as np
from typing import Optional


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


class LinePatchExtractorOptions:
    """line_patch_extractor.h:19-31: stretch + perpendicular range."""

    def __init__(self, d: Optional[dict] = None):
        d = d or {}
        self.k_stretch = d.get("k_stretch", 1.0)
        self.t_stretch = d.get("t_stretch", 10)
        self.range_perp = d.get("range_perp", 20)


class LinePatchExtractor:
    """Track-level patch extraction over featuremaps
    (features/line_patch_extractor.h:33-60): per support, stretch the
    2D segment (finallength = max(length * k_stretch,
    length + t_stretch)) and cut a rotated patch of range_perp pixels
    across, resampled on a fixed grid so a whole track's supports come
    back as ONE batched array."""

    def __init__(self, options: Optional[LinePatchExtractorOptions] = None,
                 n_along: int = 32):
        self.options = options or LinePatchExtractorOptions()
        self.n_along = n_along

    def _stretch(self, start: np.ndarray, end: np.ndarray):
        opt = self.options
        d = end - start
        length = np.linalg.norm(d, axis=-1, keepdims=True) + 1e-8
        u = d / length
        final = np.maximum(length * opt.k_stretch, length + opt.t_stretch)
        mid = 0.5 * (start + end)
        return mid - u * final / 2, mid + u * final / 2

    def extract_line_patch(self, line2d: np.ndarray, feature):
        """line2d [2, 2] -> (patch [A, P, C], origin, axes)."""
        s, e = self._stretch(line2d[0][None], line2d[1][None])
        fmap = jnp.asarray(np.asarray(feature))
        n_perp = int(self.options.range_perp)
        patch = extract_line_patches(fmap, jnp.asarray(s, jnp.float32),
                                     jnp.asarray(e, jnp.float32),
                                     n_along=self.n_along,
                                     n_perp=n_perp, perp_spacing=1.0)
        return np.asarray(patch)[0], s[0], e[0]

    def extract_line_patches(self, line2ds: np.ndarray, feature):
        """line2ds [N, 2, 2] -> patches [N, A, P, C]."""
        line2ds = np.asarray(line2ds, np.float64).reshape(-1, 2, 2)
        s, e = self._stretch(line2ds[:, 0], line2ds[:, 1])
        fmap = jnp.asarray(np.asarray(feature))
        patch = extract_line_patches(fmap, jnp.asarray(s, jnp.float32),
                                     jnp.asarray(e, jnp.float32),
                                     n_along=self.n_along,
                                     n_perp=int(self.options.range_perp),
                                     perp_spacing=1.0)
        return np.asarray(patch)

    def extract_one_image(self, track, img_id: int, view, feature):
        """Patches of all of one track's supports in one image
        (LinePatchExtractor::ExtractOneImage)."""
        segs = [np.asarray(l2d) for (iid, l2d) in
                zip(track.image_id_list, track.line2d_list)
                if iid == img_id]
        if not segs:
            C = np.asarray(feature).shape[-1]
            return np.zeros((0, self.n_along,
                             int(self.options.range_perp), C))
        return self.extract_line_patches(np.stack(segs), feature)
