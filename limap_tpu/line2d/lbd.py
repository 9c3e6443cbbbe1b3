"""LBD — Line Band Descriptor (Zhang & Koch 2013), batched TPU-native.

Counterpart of /root/reference/src/limap/line2d/LBD/
{extractor.py, matcher.py}, which wrap the pytlbd C++ library (absent
here, and serial per line).  This module computes the same descriptor
family directly as ONE jitted kernel over all lines of an image:

- a fixed-shape Line Support Region per line: NS samples along the
  line x (M bands * W rows) across it,
- image gradients sampled bilinearly and projected onto the line
  direction (dL) and its orthogonal (dO),
- per band: Gaussian-weighted sums of (dO+, dO-, dL+, dL-) per
  sample column, then mean + standard deviation over the columns
  -> 8 numbers per band, M * 8 total (M=9 -> the canonical 72-d LBD),
- global Gaussian across rows + local Gaussian per band, both as in
  the original paper; descriptor L2-normalized with the usual 0.4
  clamp + renormalize.

Multi-scale: descriptors are computed on a Gaussian pyramid
(sqrt(2) scale steps like the reference's process_pyramid,
LBD/extractor.py:16-50) and matched with mutual NN over the best
cross-scale descriptor distance — a batched stand-in for pytlbd's
multiscale graph matching.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.line2d.base import (BaseDetector, BaseMatcher,
                                   register_extractor, register_matcher)

M_BANDS = 9
W_BAND = 7
NS_ALONG = 32


def _gradients(img: jnp.ndarray):
    p = jnp.pad(img, 1, mode="edge")
    gx = (p[1:-1, 2:] - p[1:-1, :-2]) * 0.5
    gy = (p[2:, 1:-1] - p[:-2, 1:-1]) * 0.5
    return gx, gy


def _bilinear(img: jnp.ndarray, y, x):
    H, W = img.shape
    y = jnp.clip(y, 0.0, H - 1.001)
    x = jnp.clip(x, 0.0, W - 1.001)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    fy = y - y0
    fx = x - x0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)


@partial(jax.jit, static_argnums=())
def lbd_describe(img: jnp.ndarray, segs: jnp.ndarray,
                 valid: jnp.ndarray) -> jnp.ndarray:
    """img [H, W] float in [0,1]; segs [N, 4] x1 y1 x2 y2 ->
    descriptors [N, M*8] (zero rows for invalid lines)."""
    gx, gy = _gradients(img)
    N = segs.shape[0]
    R = M_BANDS * W_BAND
    s = segs[:, 0:2]
    e = segs[:, 2:4]
    d = e - s
    length = jnp.sqrt(jnp.sum(d * d, -1) + 1e-12)
    dL = d / length[:, None]                          # [N, 2] (x, y)
    dO = jnp.stack([-dL[:, 1], dL[:, 0]], axis=-1)    # orthogonal

    t = jnp.linspace(0.0, 1.0, NS_ALONG)
    # row offsets across the line: -(R-1)/2 .. (R-1)/2
    off = jnp.arange(R, dtype=jnp.float32) - (R - 1) / 2.0
    # sample positions [N, R, NS, 2]
    base = s[:, None, None, :] + d[:, None, None, :] * t[None, None, :,
                                                         None]
    pos = base + dO[:, None, None, :] * off[None, :, None, None]
    px = pos[..., 0]
    py = pos[..., 1]
    sgx = _bilinear(gx, py.reshape(-1), px.reshape(-1)).reshape(N, R,
                                                               NS_ALONG)
    sgy = _bilinear(gy, py.reshape(-1), px.reshape(-1)).reshape(N, R,
                                                                NS_ALONG)
    # project gradients
    gdL = sgx * dL[:, None, None, 0] + sgy * dL[:, None, None, 1]
    gdO = sgx * dO[:, None, None, 0] + sgy * dO[:, None, None, 1]

    # global Gaussian over rows (sigma = R/2, paper's f_g)
    sigma_g = R / 2.0
    wg = jnp.exp(-0.5 * (off / sigma_g) ** 2)
    gdL = gdL * wg[None, :, None]
    gdO = gdO * wg[None, :, None]

    # band accumulation: for band j, rows of bands j-1, j, j+1
    # contribute with a local Gaussian (sigma = W)
    feats = []
    band_of_row = jnp.arange(R) // W_BAND
    row_center = band_of_row * W_BAND + (W_BAND - 1) / 2.0
    for j in range(M_BANDS):
        in_nbh = jnp.abs(band_of_row - j) <= 1
        center_j = j * W_BAND + (W_BAND - 1) / 2.0
        wl = jnp.exp(-0.5 * ((jnp.arange(R) - center_j) / W_BAND) ** 2)
        w = jnp.where(in_nbh, wl, 0.0)[None, :, None]
        vs = []
        for g in (gdO, gdL):
            gpos = jnp.sum(jnp.maximum(g, 0.0) * w, axis=1)   # [N, NS]
            gneg = jnp.sum(jnp.maximum(-g, 0.0) * w, axis=1)
            vs.extend([gpos, gneg])
        # mean + std over the NS sample columns
        for v in vs:
            feats.append(jnp.mean(v, axis=1))
        for v in vs:
            feats.append(jnp.std(v, axis=1))
    desc = jnp.stack(feats, axis=-1)                  # [N, M*8]
    desc = desc / jnp.sqrt(jnp.sum(desc * desc, -1, keepdims=True)
                           + 1e-12)
    # clamp + renormalize (standard LBD post-processing)
    desc = jnp.minimum(desc, 0.4)
    desc = desc / jnp.sqrt(jnp.sum(desc * desc, -1, keepdims=True)
                           + 1e-12)
    return jnp.where(valid[:, None], desc, 0.0)


@register_extractor("lbd")
class LBDExtractor(BaseDetector):
    def __init__(self, options: Optional[dict] = None):
        super().__init__(options)
        options = options or {}
        self.n_levels = options.get("n_levels", 3)
        self.level_scale = options.get("level_scale", float(np.sqrt(2)))

    def get_module_name(self):
        return "lbd"

    def extract(self, camview, segs) -> dict:
        import cv2

        img = np.asarray(camview.read_image(set_gray=True), np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        segs = np.asarray(segs, np.float32).reshape(-1, 5) \
            if np.asarray(segs).ndim == 2 else np.asarray(segs)
        N = len(segs)
        if N == 0:
            return {"line_descriptors": np.zeros(
                (0, self.n_levels, M_BANDS * 8), np.float32)}
        # pad N to a bucket to bound recompilation
        Nb = max(int(2 ** np.ceil(np.log2(max(N, 8)))), 8)
        descs = []
        octave = img.copy()
        scale = 1.0
        pre_sigma2, cur_sigma2 = 0.0, 1.0
        for _ in range(self.n_levels):
            inc = float(np.sqrt(cur_sigma2 - pre_sigma2))
            blurred = cv2.GaussianBlur(octave, (5, 5), inc,
                                       borderType=cv2.BORDER_REPLICATE)
            pad = np.zeros((Nb, 4), np.float32)
            pad[:N] = segs[:, :4] * scale
            val = np.zeros(Nb, bool)
            val[:N] = True
            d = lbd_describe(jnp.asarray(blurred), jnp.asarray(pad),
                             jnp.asarray(val))
            descs.append(np.asarray(d)[:N])
            new_size = (int(blurred.shape[1] / self.level_scale),
                        int(blurred.shape[0] / self.level_scale))
            octave = cv2.resize(blurred, new_size, 0, 0,
                                interpolation=cv2.INTER_NEAREST)
            scale /= self.level_scale
            pre_sigma2, cur_sigma2 = cur_sigma2, cur_sigma2 * 2
        return {"line_descriptors": np.stack(descs, axis=1)}


@register_matcher("lbd")
class LBDMatcher(BaseMatcher):
    """Mutual NN over the best cross-scale descriptor distance."""

    def __init__(self, extractor, options: Optional[dict] = None):
        super().__init__(extractor, options)
        assert extractor.get_module_name() == "lbd"

    def get_module_name(self):
        return "lbd"

    def match_pair(self, descinfo1, descinfo2):
        d1 = np.asarray(descinfo1["line_descriptors"])  # [N1, S, D]
        d2 = np.asarray(descinfo2["line_descriptors"])
        if len(d1) == 0 or len(d2) == 0:
            return np.zeros((0, 2), int)
        # min distance over scale pairs
        diff = d1[:, None, :, None, :] - d2[None, :, None, :, :]
        dist = np.sqrt((diff ** 2).sum(-1))            # [N1, N2, S, S]
        dist = dist.min(axis=(2, 3))
        if self.topk == 0:
            n1 = np.argmin(dist, axis=1)
            n2 = np.argmin(dist, axis=0)
            mutual = n2[n1] == np.arange(len(d1))
            ids1 = np.nonzero(mutual)[0]
            return np.stack([ids1, n1[ids1]], axis=1)
        k = min(self.topk, dist.shape[1])
        topk = np.argsort(dist, axis=1)[:, :k]
        out = [np.stack([np.arange(len(d1)), topk[:, i]], axis=1)
               for i in range(k)]
        return np.concatenate(out, axis=0)
