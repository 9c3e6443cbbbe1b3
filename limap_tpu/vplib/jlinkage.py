"""Vanishing point detection — batched multi-model RANSAC.

Replaces the reference's external JLinkage library
(/root/reference/src/limap/vplib/JLinkage/JLinkage.cc:43-70: 5000
sampled VP hypotheses + agglomerative preference clustering) with a
TPU-shaped design: hypotheses come from cross products of random line
pairs, consistency of ALL (hypothesis, line) pairs is one ``[H, N]``
kernel, and clusters are extracted by sequential best-model selection
with an eigenvector refit per cluster — branch-free inside, fixed number
of rounds (max_num_vps).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.base.lines import Segments


@dataclasses.dataclass(frozen=True)
class JLinkageConfig:
    """BaseVPDetectorConfig (vplib/base_vp_detector.h) defaults."""

    min_length: float = 40.0
    inlier_threshold: float = 1.0   # pixels
    min_num_supports: int = 10
    n_hypotheses: int = 512
    max_num_vps: int = 8

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "JLinkageConfig":
        if d is None:
            return cls()
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


class VPResult:
    """Per-image VP labels + directions (vplib/vpbase.h:18-47)."""

    def __init__(self, labels, vps):
        self.labels = np.asarray(labels, np.int64)
        self.vps = np.asarray(vps, np.float64).reshape(-1, 3)

    def count_lines(self):
        return len(self.labels)

    def count_vps(self):
        return len(self.vps)

    def GetVPLabel(self, line_id):
        return int(self.labels[line_id])

    def HasVP(self, line_id):
        return self.labels[line_id] >= 0

    def GetVP(self, line_id):
        return self.vps[self.labels[line_id]]

    def GetVPbyCluster(self, vp_id):
        return self.vps[vp_id]

    def as_dict(self):
        return {"labels": self.labels.tolist(), "vps": self.vps.tolist()}

    @classmethod
    def from_dict(cls, d):
        return cls(d["labels"], d["vps"])


def vp_line_distance(vps: jnp.ndarray, mids: jnp.ndarray,
                     endpoints: jnp.ndarray) -> jnp.ndarray:
    """[H, N]: distance of segment endpoints to the line joining each VP
    with the segment midpoint (classic VP consistency measure)."""
    mids_h = jnp.concatenate([mids, jnp.ones_like(mids[..., :1])], -1)
    lines = jnp.cross(vps[:, None, :], mids_h[None, :, :])  # [H, N, 3]
    a, b, c = lines[..., 0], lines[..., 1], lines[..., 2]
    denom = jnp.sqrt(a * a + b * b + 1e-12)
    return jnp.abs(a * endpoints[None, :, 0] + b * endpoints[None, :, 1]
                   + c) / denom


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _detect_kernel(coords, mids, starts, valid, n_hyp: int, max_vps: int,
                   min_supports: int, inlier_th: float, key=None):
    """coords [N, 3] homogeneous line coords; mids/starts [N, 2].

    Returns (labels [N] int32, vps [max_vps, 3], n_found).
    """
    N = coords.shape[0]
    k1, k2 = jax.random.split(key)
    ia = jax.random.randint(k1, (n_hyp,), 0, N)
    ib = jax.random.randint(k2, (n_hyp,), 0, N)
    ib = jnp.where(ib == ia, (ib + 1) % N, ib)
    vps = jnp.cross(coords[ia], coords[ib])  # [H, 3]
    vps = vps / (jnp.linalg.norm(vps, axis=-1, keepdims=True) + 1e-12)
    hyp_ok = valid[ia] & valid[ib]
    dist = vp_line_distance(vps, mids, starts)  # [H, N]

    def loop_body(state, _):
        labels, remaining, vp_out, n_found = state
        inlier = (dist <= inlier_th) & remaining[None, :] & valid[None, :]
        counts = jnp.sum(inlier, axis=1)
        counts = jnp.where(hyp_ok, counts, -1)
        best = jnp.argmax(counts)
        best_inliers = inlier[best]
        accept = counts[best] >= min_supports

        # refit: vp = least eigenvector of sum(l l^T) over inlier coords
        w = best_inliers.astype(coords.dtype)[:, None]
        A = (coords * w).T @ (coords * w)
        _, vecs = jnp.linalg.eigh(A)
        vp_refit = vecs[:, 0]

        labels = jnp.where(accept & best_inliers, n_found, labels)
        remaining = remaining & ~(best_inliers & accept)
        vp_out = vp_out.at[n_found].set(
            jnp.where(accept, vp_refit, vp_out[n_found]))
        n_found = n_found + jnp.where(accept, 1, 0)
        return (labels, remaining, vp_out, n_found), None

    init = (jnp.full((N,), -1, jnp.int32), valid,
            jnp.zeros((max_vps, 3), coords.dtype), jnp.int32(0))
    (labels, _, vp_out, n_found), _ = jax.lax.scan(
        loop_body, init, None, length=max_vps)
    return labels, vp_out, n_found


class JLinkage:
    """VP detector with the reference's config surface."""

    def __init__(self, cfg: JLinkageConfig = JLinkageConfig(), seed: int = 0):
        self.cfg = cfg
        self.key = jax.random.PRNGKey(seed)

    def get_module_name(self):
        return "jlinkage"

    def compute_vp_labels(self, segs: np.ndarray) -> VPResult:
        """segs: (N, >=4) array -> VPResult."""
        segs = np.asarray(segs, np.float64)
        n = len(segs)
        if n < max(2 * self.cfg.min_num_supports, 20) // 2:
            return VPResult(np.full(n, -1), np.zeros((0, 3)))
        seg = Segments(jnp.asarray(segs[:, :2], jnp.float32),
                       jnp.asarray(segs[:, 2:4], jnp.float32))
        coords = seg.coords()
        mids = seg.midpoint()
        lengths = np.linalg.norm(segs[:, 2:4] - segs[:, :2], axis=1)
        valid = jnp.asarray(lengths >= self.cfg.min_length)
        self.key, sub = jax.random.split(self.key)
        labels, vps, n_found = _detect_kernel(
            coords, mids, seg.start, valid, self.cfg.n_hypotheses,
            self.cfg.max_num_vps, self.cfg.min_num_supports,
            float(self.cfg.inlier_threshold), key=sub)
        k = int(n_found)
        return VPResult(np.asarray(labels), np.asarray(vps)[:k])

    def detect_vp_all_images(self, all_2d_segs: Dict[int, np.ndarray],
                             camviews=None) -> Dict[int, VPResult]:
        """Per-image VP detection (base_vp_detector.py:46-79)."""
        return {img_id: self.compute_vp_labels(segs)
                for img_id, segs in all_2d_segs.items()}
