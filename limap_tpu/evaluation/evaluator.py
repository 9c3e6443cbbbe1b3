"""GT-distance evaluators: recall/precision of line maps.

Re-designs /root/reference/src/limap/evaluation: the reference samples n
points per line and queries a nanoflann KD-tree
(point_cloud_evaluator.h:15-44, base_evaluator.h:13-34); here the
nearest-neighbor queries run as chunked brute-force distance kernels —
[S, M_chunk] tiles stream through VMEM and reduce with a running min,
which saturates HBM bandwidth on TPU and needs no tree build.

Also provides the Hypersim-protocol metrics (length recall @ tau,
precision @ tau) of scripts/eval_hypersim.py:47-68.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.base.lines import Segments

DEFAULT_N_SAMPLES = 1000  # base_evaluator.h samples per line


def sample_points_on_segments(seg: Segments, n_samples: int) -> jnp.ndarray:
    """Uniform samples [N, n_samples, 3] along each segment."""
    t = jnp.linspace(0.0, 1.0, n_samples)
    return seg.start[:, None, :] + t[None, :, None] \
        * (seg.end - seg.start)[:, None, :]


@partial(jax.jit, static_argnums=(2,))
def _min_dist_to_points(samples: jnp.ndarray, points: jnp.ndarray,
                        chunk: int = 16384) -> jnp.ndarray:
    """Min distance of each sample [..., 3] to the point cloud [M, 3]."""
    flat = samples.reshape(-1, 3)
    M = points.shape[0]
    n_chunks = (M + chunk - 1) // chunk
    pad = n_chunks * chunk - M
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=1e12)
    pts = pts.reshape(n_chunks, chunk, 3)

    def body(carry, pblock):
        d2 = jnp.sum((flat[:, None, :] - pblock[None, :, :]) ** 2, axis=-1)
        return jnp.minimum(carry, jnp.min(d2, axis=1)), None

    init = jnp.full((flat.shape[0],), jnp.inf)
    best, _ = jax.lax.scan(body, init, pts)
    return jnp.sqrt(best).reshape(samples.shape[:-1])


class PointCloudEvaluator:
    """Distance evaluation vs a GT point cloud
    (point_cloud_evaluator.h:15-44)."""

    def __init__(self, points: np.ndarray):
        self.points = jnp.asarray(np.asarray(points, np.float32))

    def ComputeDistPoint(self, p: np.ndarray) -> float:
        return float(_min_dist_to_points(jnp.asarray(p, jnp.float32)[None],
                                         self.points)[0])

    def ComputeDistsLine(self, seg: Segments,
                         n_samples: int = DEFAULT_N_SAMPLES) -> jnp.ndarray:
        """[N, n_samples] sample distances for a batch of lines.

        Uses the fused Pallas NN kernel on TPU; the XLA scan fallback
        elsewhere."""
        samples = sample_points_on_segments(seg, n_samples)
        if jax.devices()[0].platform in ("tpu", "axon"):
            from limap_tpu.ops.pallas.nn_distance import min_dist_to_points
            return min_dist_to_points(samples, self.points)
        return _min_dist_to_points(samples, self.points)

    def ComputeInlierRatio(self, seg: Segments, threshold: float,
                           n_samples: int = DEFAULT_N_SAMPLES) -> jnp.ndarray:
        """Per-line fraction of samples within threshold
        (base_evaluator.h:19-21)."""
        d = self.ComputeDistsLine(seg, n_samples)
        return jnp.mean((d <= threshold).astype(jnp.float32), axis=1)

    def ComputeInlierRatioOneLine(self, line: np.ndarray, threshold: float,
                                  n_samples: int = DEFAULT_N_SAMPLES):
        seg = Segments(jnp.asarray(line[0], jnp.float32)[None],
                       jnp.asarray(line[1], jnp.float32)[None])
        return float(self.ComputeInlierRatio(seg, threshold, n_samples)[0])


def point_segment_distance(points: jnp.ndarray, seg: Segments) -> jnp.ndarray:
    """[P, N] distance of each point to each segment (clamped)."""
    d = seg.end - seg.start  # [N, 3]
    L2 = jnp.sum(d * d, -1)
    disp = points[:, None, :] - seg.start[None]  # [P, N, 3]
    t = jnp.sum(disp * d[None], -1) / jnp.maximum(L2, 1e-12)[None]
    t = jnp.clip(t, 0.0, 1.0)
    foot = seg.start[None] + t[..., None] * d[None]
    return jnp.linalg.norm(points[:, None] - foot, axis=-1)


class RefLineEvaluator:
    """Recall vs a set of reference lines (refline_evaluator.h:12-36)."""

    def __init__(self, ref_lines: np.ndarray):
        ref = np.asarray(ref_lines, np.float32).reshape(-1, 2, 3)
        self.ref = Segments(jnp.asarray(ref[:, 0]), jnp.asarray(ref[:, 1]))

    def SumLength(self) -> float:
        return float(jnp.sum(self.ref.length()))

    def ComputeRecallRef(self, lines: np.ndarray, threshold: float,
                         n_samples: int = 1000) -> float:
        """Total GT length covered by the predicted lines within
        threshold."""
        pred = np.asarray(lines, np.float32).reshape(-1, 2, 3)
        if len(pred) == 0:
            return 0.0
        pred_seg = Segments(jnp.asarray(pred[:, 0]), jnp.asarray(pred[:, 1]))
        samples = sample_points_on_segments(self.ref, n_samples)
        S = samples.reshape(-1, 3)
        d = jnp.min(point_segment_distance(S, pred_seg), axis=1)
        d = d.reshape(-1, n_samples)
        ratio = jnp.mean((d <= threshold).astype(jnp.float32), axis=1)
        return float(jnp.sum(ratio * self.ref.length()))


def report_error_to_gt(evaluator: PointCloudEvaluator, lines: np.ndarray,
                       thresholds: Sequence[float],
                       n_samples: int = DEFAULT_N_SAMPLES) -> Dict[str, Dict]:
    """Hypersim protocol (scripts/eval_hypersim.py:47-68): length recall
    = sum(length * inlier_ratio); precision = % lines with any inlier."""
    lines = np.asarray(lines, np.float32).reshape(-1, 2, 3)
    seg = Segments(jnp.asarray(lines[:, 0]), jnp.asarray(lines[:, 1]))
    lengths = seg.length()
    out = {"recall": {}, "precision": {}}
    for tau in thresholds:
        ratios = evaluator.ComputeInlierRatio(seg, tau, n_samples)
        out["recall"][tau] = float(jnp.sum(ratios * lengths))
        out["precision"][tau] = float(jnp.mean((ratios > 0).astype(
            jnp.float32))) * 100.0 if len(lines) else 0.0
    return out


def report_track_stats(linetracks, n_visible_views: int = 4) -> Dict:
    """Track-quality stats (visualize/trackvis/base.py:25-50)."""
    tracks = [t for t in linetracks]
    counts = np.array([t.count_images() for t in tracks])
    supports = np.array([t.count_lines() for t in tracks])
    out = {"n_tracks": len(tracks)}
    for nv in (2, 3, 4, 5, 6):
        out[f"n_tracks_nv{nv}"] = int((counts >= nv).sum())
    sel = counts >= n_visible_views
    out["avg_supporting_images"] = float(counts[sel].mean()) if sel.any() \
        else 0.0
    out["avg_supporting_lines"] = float(supports[sel].mean()) if sel.any() \
        else 0.0
    return out
