"""Endpoint descriptors + NN endpoint matcher (learned-free, batched).

The reference's default lightweight pipeline describes each segment by
SuperPoint descriptors at its two endpoints and matches with endpoint
score max-assignment (+ Sinkhorn)
(/root/reference/src/limap/line2d/endpoints/extractor.py:45-87,
matcher.py:32-110).  Here the descriptor is an oriented
gradient-and-intensity patch sampled around each endpoint — computed for
ALL endpoints of an image in one jitted gather — and the matcher scores
every line pair with the same
``0.5 * max(s00 + s11, s01 + s10)`` endpoint combination before top-k /
mutual-NN selection.  A learned descriptor can be slotted in later
without touching the matcher.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.line2d.base import (BaseDetector, BaseMatcher,
                                   register_detector, register_extractor,
                                   register_matcher)

PATCH = 8          # patch side in samples
PATCH_SPACING = 2.0  # pixels between samples


@partial(jax.jit, static_argnums=())
def _sample_patch_descriptors(img: jnp.ndarray, endpoints: jnp.ndarray,
                              directions: jnp.ndarray) -> jnp.ndarray:
    """Oriented patch descriptor for each endpoint.

    img [H, W] float; endpoints [N, 2] xy; directions [N, 2] unit (line
    direction at that endpoint).  Returns [N, D] L2-normalized.
    """
    H, W = img.shape
    g = jnp.linspace(-(PATCH - 1) / 2, (PATCH - 1) / 2, PATCH) * PATCH_SPACING
    gy, gx = jnp.meshgrid(g, g, indexing="ij")
    # rotate grid into the line frame; shift the center inward along the
    # segment so most samples lie on line support rather than background
    dx, dy = directions[:, 0], directions[:, 1]
    inset = PATCH * PATCH_SPACING / 4.0
    cx = endpoints[:, 0] + dx * inset
    cy = endpoints[:, 1] + dy * inset
    px = (cx[:, None, None] + gx[None] * dx[:, None, None]
          - gy[None] * dy[:, None, None])
    py = (cy[:, None, None] + gx[None] * dy[:, None, None]
          + gy[None] * dx[:, None, None])

    # bilinear sample
    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(px - x0, 0.0, 1.0)
    fy = jnp.clip(py - y0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    vals = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)  # [N, P, P]

    flat = vals.reshape(vals.shape[0], -1)
    mean = jnp.mean(flat, axis=1, keepdims=True)
    centered = flat - mean
    std = jnp.sqrt(jnp.mean(centered * centered, axis=1, keepdims=True))
    normed = centered / (jnp.linalg.norm(centered, axis=1, keepdims=True)
                         + 1e-8)
    # keep absolute photometric statistics as extra channels — a purely
    # contrast-normalized patch cannot distinguish identical strokes of
    # different brightness
    desc = jnp.concatenate([normed, 4.0 * mean, 4.0 * std], axis=1)
    return desc / (jnp.linalg.norm(desc, axis=1, keepdims=True) + 1e-8)


@register_extractor("patch_endpoints")
@register_detector("patch_endpoints")
class PatchEndpointsExtractor(BaseDetector):
    """Endpoint patch descriptors (descinfo layout matches the
    reference's superpoint_endpoints extractor)."""

    def __init__(self, options=None):
        super().__init__(options)

    def get_module_name(self):
        return "patch_endpoints"

    def extract(self, camview, segs) -> dict:
        img = camview.read_image(set_gray=True)
        return self.compute_descinfo(img, np.asarray(segs))

    def compute_descinfo(self, img, segs) -> dict:
        img = np.asarray(img, np.float32)
        if img.ndim == 3:
            img = img.mean(-1)
        if img.max() > 1.5:
            img = img / 255.0
        if len(segs) == 0:
            return {"image_shape": img.shape, "lines": np.zeros((0, 2)),
                    "lines_score": np.zeros((0,)),
                    "endpoints_desc": np.zeros((PATCH * PATCH, 0))}
        lines = segs[:, :4].reshape(-1, 2)  # [N*2, 2]
        d = segs[:, 2:4] - segs[:, :2]
        d = d / (np.linalg.norm(d, axis=1, keepdims=True) + 1e-8)
        # direction per endpoint: start uses +d, end uses -d (pointing
        # into the segment) for symmetry
        dirs = np.stack([d, -d], axis=1).reshape(-1, 2)
        desc = np.asarray(_sample_patch_descriptors(
            jnp.asarray(img), jnp.asarray(lines, jnp.float32),
            jnp.asarray(dirs, jnp.float32)))
        lengths = np.linalg.norm(segs[:, 2:4] - segs[:, :2], axis=1)
        score = segs[:, 4] if segs.shape[1] > 4 else np.sqrt(lengths)
        score = score / (score.max() + 1e-8)
        return {"image_shape": img.shape, "lines": lines,
                "lines_score": score, "endpoints_desc": desc.T}


@jax.jit
def _line_scores(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """[D, 2*N1] x [D, 2*N2] endpoint descs -> [N1, N2] line scores
    (matcher.py:50-59)."""
    s = desc1.T @ desc2  # [2N1, 2N2]
    n1 = s.shape[0] // 2
    n2 = s.shape[1] // 2
    s = s.reshape(n1, 2, n2, 2)
    return 0.5 * jnp.maximum(s[:, 0, :, 0] + s[:, 1, :, 1],
                             s[:, 0, :, 1] + s[:, 1, :, 0])


@register_matcher("nn_endpoints")
class NNEndpointsMatcher(BaseMatcher):
    """Top-k / mutual-NN line matching on endpoint scores."""

    def __init__(self, extractor, options=None):
        super().__init__(extractor, options)
        options = options or {}
        self.min_score = options.get("min_score", 0.2)

    def get_module_name(self):
        return "nn_endpoints"

    def match_pair(self, descinfo1, descinfo2) -> np.ndarray:
        d1 = np.asarray(descinfo1["endpoints_desc"], np.float32)
        d2 = np.asarray(descinfo2["endpoints_desc"], np.float32)
        if d1.shape[1] == 0 or d2.shape[1] == 0:
            return np.zeros((0, 2), np.int64)
        scores = np.asarray(_line_scores(jnp.asarray(d1), jnp.asarray(d2)))
        if self.topk == 0:
            # mutual nearest neighbor
            best2 = scores.argmax(1)
            best1 = scores.argmax(0)
            i = np.arange(scores.shape[0])
            mutual = best1[best2[i]] == i
            good = mutual & (scores[i, best2[i]] >= self.min_score)
            return np.stack([i[good], best2[i][good]], axis=1)
        k = min(self.topk, scores.shape[1])
        idx = np.argsort(-scores, axis=1)[:, :k]
        i = np.repeat(np.arange(scores.shape[0]), k)
        j = idx.reshape(-1)
        good = scores[i, j] >= self.min_score
        return np.stack([i[good], j[good]], axis=1)


@register_matcher("superglue_endpoints")
class SinkhornEndpointsMatcher(NNEndpointsMatcher):
    """OT-based line matching on endpoint scores: the same selection
    scheme as the reference's superglue_endpoints matcher
    (matcher.py:114-253), with the log-domain Sinkhorn solver from
    limap_tpu.point2d.matching in place of the learned GNN (whose
    weights require network access)."""

    def __init__(self, extractor, options=None):
        super().__init__(extractor, options)
        options = options or {}
        self.bin_score = options.get("bin_score", 0.5)
        self.match_threshold = options.get("match_threshold", 0.2)

    def get_module_name(self):
        return "superglue_endpoints"

    def match_pair(self, descinfo1, descinfo2) -> np.ndarray:
        from limap_tpu.point2d.matching import log_sinkhorn
        d1 = np.asarray(descinfo1["endpoints_desc"], np.float32)
        d2 = np.asarray(descinfo2["endpoints_desc"], np.float32)
        if d1.shape[1] == 0 or d2.shape[1] == 0:
            return np.zeros((0, 2), np.int64)
        line_scores = _line_scores(jnp.asarray(d1), jnp.asarray(d2))
        Z = np.asarray(log_sinkhorn(line_scores / 0.1,
                                    jnp.asarray(self.bin_score)))
        P = np.exp(Z[:-1, :-1])
        b2 = P.argmax(1)
        b1 = P.argmax(0)
        i = np.arange(P.shape[0])
        mutual = b1[b2[i]] == i
        good = mutual & (P[i, b2[i]] >= self.match_threshold)
        return np.stack([i[good], b2[i][good]], axis=1)
