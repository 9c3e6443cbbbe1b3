"""Progressive-X-style multi-VP detection.

Counterpart of /root/reference/src/limap/vplib/progressivex/
progressivex.py, which wraps the external pyprogressivex library.  The
reference calls it with ``spatial_coherence_weight=0.0`` and
``maximum_tanimoto_similarity=1.0`` (progressivex.py:43-59), which
reduces Progressive-X to proposal + greedy model growth with
length-weighted sampling — exactly expressible as the batched
sequential multi-model RANSAC kernel shared with :mod:`jlinkage`, plus
the length-weighted hypothesis sampler implemented here.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.base.lines import Segments
from limap_tpu.vplib.jlinkage import VPResult, _detect_kernel


@dataclasses.dataclass(frozen=True)
class ProgressiveXConfig:
    """ProgressiveXOptions (progressivex.py:9-14) + kernel knobs."""

    min_length: float = 20.0
    inlier_threshold: float = 1.0
    n_hypotheses: int = 2000
    max_num_vps: int = 8
    min_num_supports: int = 5   # minimum_point_number (progressivex.py:55)

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "ProgressiveXConfig":
        if d is None:
            return cls()
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


class ProgressiveX:
    def __init__(self, cfg: ProgressiveXConfig = ProgressiveXConfig(),
                 seed: int = 0):
        self.cfg = cfg
        self.key = jax.random.PRNGKey(seed)

    def get_module_name(self):
        return "progressive-x"

    def compute_vp_labels(self, segs: np.ndarray) -> VPResult:
        segs = np.asarray(segs, np.float64)
        n = len(segs)
        if n < 10:
            return VPResult(np.full(n, -1), np.zeros((0, 3)))
        seg = Segments(jnp.asarray(segs[:, :2], jnp.float32),
                       jnp.asarray(segs[:, 2:4], jnp.float32))
        coords = seg.coords()
        mids = seg.midpoint()
        lengths = np.linalg.norm(segs[:, 2:4] - segs[:, :2], axis=1)
        valid = lengths >= self.cfg.min_length
        # length-weighted sampling (weights_array, progressivex.py:40):
        # replicate indices proportionally by resampling the hypothesis
        # pool through the weighted CDF, then feed the shared kernel
        w = np.where(valid, lengths, 0.0)
        if w.sum() <= 0:
            return VPResult(np.full(n, -1), np.zeros((0, 3)))
        self.key, sub = jax.random.split(self.key)
        # importance-resample a surrogate coordinate array: the kernel
        # samples uniformly, so order coords by weighted draws
        rng = np.random.default_rng(int(jax.random.randint(
            sub, (), 0, 2**31 - 1)))
        probs = w / w.sum()
        idx = rng.choice(n, size=n, p=probs)
        coords_w = jnp.asarray(np.asarray(coords)[idx])
        mids_w = jnp.asarray(np.asarray(mids)[idx])
        starts_w = jnp.asarray(np.asarray(seg.start)[idx])
        valid_w = jnp.asarray(valid[idx])
        self.key, sub = jax.random.split(self.key)
        labels_w, vps, n_found = _detect_kernel(
            coords_w, mids_w, starts_w, valid_w,
            self.cfg.n_hypotheses, self.cfg.max_num_vps,
            self.cfg.min_num_supports,
            float(self.cfg.inlier_threshold), key=sub)
        k = int(n_found)
        vps_np = np.asarray(vps)[:k]
        # relabel the ORIGINAL lines against the found VPs
        labels = np.full(n, -1, np.int64)
        if k:
            from limap_tpu.vplib.jlinkage import vp_line_distance

            dist = np.asarray(vp_line_distance(
                jnp.asarray(vps_np, jnp.float32), mids, seg.start))
            best = dist.argmin(axis=0)
            ok = (dist[best, np.arange(n)] <= self.cfg.inlier_threshold) \
                & valid
            labels[ok] = best[ok]
        return VPResult(labels, vps_np)

    def detect_vp_all_images(self, all_2d_segs: Dict[int, np.ndarray],
                             camviews=None) -> Dict[int, VPResult]:
        return {img_id: self.compute_vp_labels(segs)
                for img_id, segs in all_2d_segs.items()}
