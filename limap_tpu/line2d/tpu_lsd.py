"""TPU-native line segment detector ("tpu_lsd").

A from-scratch LSD-style detector designed for the hardware rather than
a port of the region-growing C code the reference wraps via pytlsd
(/root/reference/src/limap/line2d/LSD/lsd.py): region growing is an
inherently serial flood fill, so instead we

1. compute Sobel gradients + level-line orientation (mod pi),
2. bin pixels into overlapping orientation buckets (2 nearest of B bins
   ~= LSD's 22.5 deg angle tolerance),
3. run parallel connected components on each orientation mask (min-label
   propagation over the 8-neighborhood + pointer jumping — the same
   machinery as track clustering),
4. reduce each component to a segment with gradient-weighted PCA via
   scatter-adds (second moments) and scatter-min/max (extent along the
   principal axis),
5. filter by length / width / density, emit the top-K by length.

Everything is one jitted function per image resolution; XLA maps the
stencils and scatters onto the VPU.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.line2d.base import BaseDetector, register_detector

_BIG = jnp.float32(1e30)


def _sobel(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    p = jnp.pad(img, 1, mode="edge")
    gx = (p[1:-1, 2:] - p[1:-1, :-2]) * 2.0 \
        + (p[:-2, 2:] - p[:-2, :-2]) + (p[2:, 2:] - p[2:, :-2])
    gy = (p[2:, 1:-1] - p[:-2, 1:-1]) * 2.0 \
        + (p[2:, 2:] - p[:-2, 2:]) + (p[2:, :-2] - p[:-2, :-2])
    return gx / 8.0, gy / 8.0


def _grid_cc(mask: jnp.ndarray, n_rounds: int) -> jnp.ndarray:
    """Connected components of a boolean [H, W] mask, 8-neighborhood.

    Returns labels [H, W] (flat min pixel index per component; -1 off
    mask).  Alternates one local min-propagation with full pointer
    jumping; n_rounds ~ log(max component diameter) suffices.
    """
    H, W = mask.shape
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    labels = jnp.where(mask, idx, jnp.int32(H * W))  # sentinel off-mask

    def local_min(lab):
        p = jnp.pad(lab, 1, constant_values=H * W)
        cand = lab
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                cand = jnp.minimum(cand,
                                   p[1 + dy:H + 1 + dy, 1 + dx:W + 1 + dx])
        return jnp.where(mask, cand, H * W)

    def jump(lab):
        flat = jnp.append(lab.reshape(-1), jnp.int32(H * W))
        def body(_, fl):
            return fl.at[:-1].set(fl[fl[:-1]])
        # pointer doubling: log2(HW) jumps compress any chain in one
        # round, letting n_rounds stay small (the serialized [H*W]
        # gathers here are the whole detector's cost on TPU)
        n_jumps = max(int(H * W).bit_length(), 4)
        flat = jax.lax.fori_loop(0, n_jumps, body, flat)
        return flat[:-1].reshape(H, W)

    def body(_, lab):
        return jump(local_min(lab))

    labels = jax.lax.fori_loop(0, n_rounds, body, labels)
    return jnp.where(mask, labels, -1)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _detect_kernel(img: jnp.ndarray, n_bins: int, max_segs: int,
                   cc_rounds: int, min_size: int,
                   grad_th: float, max_width: float, min_density: float):
    """img [H, W] float in [0, 1] -> segs [max_segs, 5], count."""
    gx, gy = _sobel(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    # level-line angle (perpendicular to gradient), mod pi
    theta = jnp.arctan2(gy, gx) + jnp.pi / 2.0
    theta = jnp.mod(theta, jnp.pi)
    return detect_from_fields(mag, theta, mag > grad_th, n_bins, max_segs,
                              cc_rounds, min_size, max_width, min_density)


def detect_from_fields(mag: jnp.ndarray, theta: jnp.ndarray,
                       on: jnp.ndarray, n_bins: int, max_segs: int,
                       cc_rounds: int, min_size: int,
                       max_width: float, min_density: float):
    """Segment extraction from an arbitrary (magnitude, level-line
    angle, support mask) field triple — shared by the raw-gradient LSD
    above and learned attraction fields (DeepLSD-style detectors feed
    exp(-df) as magnitude and their angle field as theta)."""
    H, W = mag.shape
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ymat = jnp.broadcast_to(ys, (H, W))
    xmat = jnp.broadcast_to(xs, (H, W))

    bin_width = jnp.pi / n_bins
    all_segs = []
    all_scores = []
    for b in range(n_bins):
        center = (b + 0.5) * bin_width
        # circular distance mod pi; accept within one full bin width ->
        # overlapping buckets approximate the LSD angle tolerance
        d = jnp.abs(theta - center)
        d = jnp.minimum(d, jnp.pi - d)
        mask = on & (d < bin_width)
        labels = _grid_cc(mask, cc_rounds)

        flat_lab = jnp.where(labels >= 0, labels, 0).reshape(-1)
        wgt = jnp.where(mask, mag, 0.0).reshape(-1)
        x = xmat.reshape(-1)
        y = ymat.reshape(-1)

        N = H * W
        cnt = jnp.zeros(N).at[flat_lab].add(jnp.where(mask.reshape(-1),
                                                      1.0, 0.0))
        sw = jnp.zeros(N).at[flat_lab].add(wgt)
        sx = jnp.zeros(N).at[flat_lab].add(wgt * x)
        sy = jnp.zeros(N).at[flat_lab].add(wgt * y)
        sxx = jnp.zeros(N).at[flat_lab].add(wgt * x * x)
        sxy = jnp.zeros(N).at[flat_lab].add(wgt * x * y)
        syy = jnp.zeros(N).at[flat_lab].add(wgt * y * y)

        valid_root = (cnt >= min_size) & (sw > 0)
        mean_x = sx / jnp.maximum(sw, 1e-8)
        mean_y = sy / jnp.maximum(sw, 1e-8)
        cxx = sxx / jnp.maximum(sw, 1e-8) - mean_x * mean_x
        cxy = sxy / jnp.maximum(sw, 1e-8) - mean_x * mean_y
        cyy = syy / jnp.maximum(sw, 1e-8) - mean_y * mean_y
        # principal axis of the 2x2 covariance, closed form
        tr = cxx + cyy
        diff = cxx - cyy
        disc = jnp.sqrt(jnp.maximum(diff * diff + 4 * cxy * cxy, 0.0))
        lam1 = 0.5 * (tr + disc)
        lam2 = 0.5 * (tr - disc)
        dx = jnp.where(jnp.abs(cxy) > 1e-12, lam1 - cyy,
                       jnp.where(cxx >= cyy, 1.0, 0.0))
        dy = jnp.where(jnp.abs(cxy) > 1e-12, cxy,
                       jnp.where(cxx >= cyy, 0.0, 1.0))
        dn = jnp.sqrt(dx * dx + dy * dy) + 1e-12
        dx, dy = dx / dn, dy / dn

        # extent along principal axis via scatter-min/max
        proj = ((x - mean_x[flat_lab]) * dx[flat_lab]
                + (y - mean_y[flat_lab]) * dy[flat_lab])
        pmin = jnp.full(N, _BIG).at[flat_lab].min(
            jnp.where(mask.reshape(-1), proj, _BIG))
        pmax = jnp.full(N, -_BIG).at[flat_lab].max(
            jnp.where(mask.reshape(-1), proj, -_BIG))

        length = pmax - pmin
        width = 2.0 * jnp.sqrt(jnp.maximum(lam2, 0.0))
        density = cnt / jnp.maximum(length * jnp.maximum(width, 1.0), 1.0)
        good = (valid_root & (length >= min_size)
                & (width <= max_width) & (density >= min_density))

        x1 = mean_x + dx * pmin
        y1 = mean_y + dy * pmin
        x2 = mean_x + dx * pmax
        y2 = mean_y + dy * pmax
        score = jnp.where(good, length, -1.0)
        segs = jnp.stack([x1, y1, x2, y2, jnp.sqrt(
            jnp.maximum(length, 0.0))], axis=-1)
        all_segs.append(segs)
        all_scores.append(score)

    segs = jnp.concatenate(all_segs)       # [B*N, 5]
    scores = jnp.concatenate(all_scores)   # [B*N]
    # top-K by length
    k = min(max_segs, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    out = segs[top_idx]
    count = jnp.sum(top_scores > 0)
    out = jnp.where((top_scores > 0)[:, None], out, 0.0)
    return out, count


def detect_segments(img: np.ndarray, n_bins: int = 8, max_segs: int = 2048,
                    cc_rounds: int = 2, min_size: int = 12,
                    grad_th: float = 0.03, max_width: float = 6.0,
                    min_density: float = 0.3) -> np.ndarray:
    """Host wrapper: grayscale uint8/float image -> (N, 5) segments."""
    img = np.asarray(img)
    if img.ndim == 3:
        img = img.mean(axis=-1)
    img = img.astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    segs, count = _detect_kernel(jnp.asarray(img), n_bins, max_segs,
                                 cc_rounds, min_size, grad_th, max_width,
                                 min_density)
    n = int(count)
    out = np.asarray(segs)[:n]
    if len(out):
        # overlapping orientation buckets emit duplicate components —
        # dedupe on rounded endpoints
        _, keep = np.unique(np.round(out[:, :4]).astype(np.int64), axis=0,
                            return_index=True)
        out = out[np.sort(keep)]
    return out


@register_detector("tpu_lsd")
class TPULSDDetector(BaseDetector):
    """Gradient-grouping detector running fully on the accelerator."""

    def __init__(self, options=None):
        super().__init__(options)
        options = options or {}
        self.n_bins = options.get("n_bins", 8)
        self.grad_th = options.get("grad_th", 0.03)
        self.min_size = options.get("min_size", 12)
        self.max_width = options.get("max_width", 6.0)
        self.min_density = options.get("min_density", 0.3)

    def get_module_name(self):
        return "tpu_lsd"

    def detect(self, camview) -> np.ndarray:
        img = camview.read_image(set_gray=True)
        if img is None:
            return np.zeros((0, 5))
        return self.detect_array(img)

    def detect_array(self, img: np.ndarray) -> np.ndarray:
        return detect_segments(
            img, n_bins=self.n_bins, grad_th=self.grad_th,
            min_size=self.min_size, max_width=self.max_width,
            min_density=self.min_density,
            max_segs=self.max_num_2d_segs or 2048)
