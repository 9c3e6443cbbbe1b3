"""SOLD2 post-processing: junction conversion/NMS + the line segment
detection module.

Ports the semantics of the reference's
line2d/SOLD2/model/line_detection.py (LineSegmentDetectionModule),
train.py:702 (convert_junc_predictions) and metrics.py:495-605
(super_nms / nms_fast), re-vectorized: the reference iterates candidate
groups and refines segments one by one in torch; here every stage is a
dense batched computation over the (junction-pair x sample) grid, with
the heavy sampling steps running through jnp so they fuse on TPU.
Coordinates are (h, w) as in the reference; the detector wrapper
converts to (x, y) segments.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------- junction NMS
def nms_fast(in_corners: np.ndarray, H: int, W: int,
             dist_thresh: int):
    """Grid NMS from SuperPoint (metrics.py:540-605).  in_corners is
    3xN [x, y, conf]."""
    grid = np.zeros((H, W), int)
    inds = np.zeros((H, W), int)
    inds1 = np.argsort(-in_corners[2, :])
    corners = in_corners[:, inds1]
    rcorners = corners[:2, :].round().astype(int)
    if rcorners.shape[1] == 0:
        return np.zeros((3, 0), int), np.zeros(0, int)
    if rcorners.shape[1] == 1:
        out = np.vstack((rcorners, in_corners[2])).reshape(3, 1)
        return out, np.zeros(1, int)
    grid[rcorners[1], rcorners[0]] = 1
    inds[rcorners[1], rcorners[0]] = np.arange(rcorners.shape[1])
    pad = int(dist_thresh)
    grid = np.pad(grid, pad, mode="constant")
    for i, rc in enumerate(rcorners.T):
        pt = (rc[0] + pad, rc[1] + pad)
        if grid[pt[1], pt[0]] == 1:
            grid[pt[1] - pad:pt[1] + pad + 1,
                 pt[0] - pad:pt[0] + pad + 1] = 0
            grid[pt[1], pt[0]] = -1
    keepy, keepx = np.where(grid == -1)
    keepy, keepx = keepy - pad, keepx - pad
    inds_keep = inds[keepy, keepx]
    out = corners[:, inds_keep]
    inds2 = np.argsort(-out[-1, :])
    out = out[:, inds2]
    return out, inds1[inds_keep[inds2]]


def super_nms(prob_pred: np.ndarray, dist_thresh: int,
              prob_thresh: float = 0.01, top_k: int = 0) -> np.ndarray:
    """NMS over a [H, W] junction probability map -> sparse score map
    (metrics.py:495-537, single image)."""
    H, W = prob_pred.shape
    ys, xs = np.where(prob_pred >= prob_thresh)
    if len(ys) == 0:
        return np.zeros((H, W))
    in_points = np.stack([xs, ys, prob_pred[ys, xs]], axis=0)
    keep_points_, _ = nms_fast(in_points, H, W, dist_thresh)
    keep_points = np.round(np.flip(keep_points_[:2, :], axis=0).T)
    keep_score = keep_points_[-1, :].T
    if top_k > 0:
        k = min(keep_points.shape[0], top_k)
        keep_points = keep_points[:k]
        keep_score = keep_score[:k]
    out = np.zeros((H, W))
    out[keep_points[:, 0].astype(int), keep_points[:, 1].astype(int)] = \
        keep_score
    return out


def junctions_from_predictions(logits_nhwc: np.ndarray, grid_size: int = 8,
                               detect_thresh: float = 1 / 65,
                               topk: int = 300) -> np.ndarray:
    """65-channel junction logits -> NMS'd junction coords [N, 2] in
    (h, w) (train.py:702-722 + line_matcher.py:89-103)."""
    logits = np.asarray(logits_nhwc, np.float64)[0]
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    prob = e / e.sum(axis=-1, keepdims=True)
    prob = prob[..., :-1]  # drop dustbin
    Hc, Wc, _ = prob.shape
    # pixel shuffle: channel c = (i * grid + j)
    full = prob.reshape(Hc, Wc, grid_size, grid_size) \
        .transpose(0, 2, 1, 3).reshape(Hc * grid_size, Wc * grid_size)
    nms_map = super_nms(full, grid_size, detect_thresh, topk)
    ys, xs = np.where(nms_map > 0)
    return np.stack([ys, xs], axis=1).astype(np.float64)


def heatmap_from_logits(logits_nhwc: np.ndarray) -> np.ndarray:
    """2-channel heatmap logits -> [H, W] line probability
    (line_matcher.py:105-119)."""
    x = np.asarray(logits_nhwc, np.float64)[0]
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    p = e / e.sum(axis=-1, keepdims=True)
    return p[..., 1]


# ------------------------------------------------------- line detection
def refine_heatmap(heatmap: np.ndarray, ratio: float = 0.2,
                   valid_thresh: float = 1e-2) -> np.ndarray:
    """Global contrast normalization (line_detection.py:268-277)."""
    vals = np.sort(heatmap[heatmap > valid_thresh])[::-1]
    if len(vals) == 0:
        return heatmap
    top = max(1, math.ceil(len(vals) * ratio))
    return np.clip(heatmap / np.mean(vals[:top]), 0.0, 1.0)


def refine_heatmap_local(heatmap: np.ndarray, num_blocks: int = 5,
                         overlap_ratio: float = 0.5, ratio: float = 0.2,
                         valid_thresh: float = 2e-3) -> np.ndarray:
    """Blockwise contrast normalization (line_detection.py:279-326)."""
    H, W = heatmap.shape
    inc = 1 - overlap_ratio
    h_block = round(H / (1 + (num_blocks - 1) * inc))
    w_block = round(W / (1 + (num_blocks - 1) * inc))
    count = np.zeros_like(heatmap)
    out = np.zeros_like(heatmap)
    for hi in range(num_blocks):
        for wi in range(num_blocks):
            h0 = round(hi * h_block * inc)
            w0 = round(wi * w_block * inc)
            h1 = h0 + h_block if hi < num_blocks - 1 else H
            w1 = w0 + w_block if wi < num_blocks - 1 else W
            sub = heatmap[h0:h1, w0:w1]
            if sub.max() > valid_thresh:
                sub = refine_heatmap(sub, ratio, valid_thresh)
            out[h0:h1, w0:w1] += sub
            count[h0:h1, w0:w1] += 1
    return np.clip(out / count, 0.0, 1.0)


def _bilinear(heatmap, ch, cw):
    hf = np.floor(ch).astype(int)
    hc = np.ceil(ch).astype(int)
    wf = np.floor(cw).astype(int)
    wc = np.ceil(cw).astype(int)
    return (heatmap[hf, wf] * (hc - ch) * (wc - cw)
            + heatmap[hf, wc] * (hc - ch) * (cw - wf)
            + heatmap[hc, wf] * (ch - hf) * (wc - cw)
            + heatmap[hc, wc] * (ch - hf) * (cw - wf))


@jax.jit
def _local_max_sample(heatmap, cand_pts, dist_thresh, patch_offsets):
    """Max heatmap value in a radius-limited circular patch around each
    sample point (line_detection.py:550-626).

    heatmap [H, W]; cand_pts [C, S, 2] float; dist_thresh [C, S];
    patch_offsets [P, 2] int.  -> [C, S]
    """
    H, W = heatmap.shape
    centers = jnp.round(cand_pts)
    pts = centers[:, :, None, :] + patch_offsets[None, None]  # [C,S,P,2]
    d = jnp.linalg.norm(cand_pts[:, :, None, :] - pts, axis=-1)
    mask = d < dist_thresh[..., None]
    py = jnp.clip(pts[..., 0], 0, H - 1).astype(jnp.int32)
    px = jnp.clip(pts[..., 1], 0, W - 1).astype(jnp.int32)
    samples = heatmap[py, px] * mask
    return jnp.max(samples, axis=-1)


class LineSegmentDetector:
    """Extract segments from junctions + a line heatmap
    (LineSegmentDetectionModule, line_detection.py:10-626)."""

    def __init__(self, detect_thresh: float = 0.5, num_samples: int = 64,
                 sampling_method: str = "local_max",
                 inlier_thresh: float = 0.99,
                 max_local_patch_radius: float = 3.0,
                 lambda_radius: float = 2.0,
                 use_candidate_suppression: bool = True,
                 nms_dist_tolerance: float = 3.0,
                 use_heatmap_refinement: bool = True,
                 heatmap_refine_cfg: Optional[dict] = None,
                 use_junction_refinement: bool = True,
                 junction_refine_cfg: Optional[dict] = None):
        self.detect_thresh = detect_thresh
        self.num_samples = num_samples
        self.sampling_method = sampling_method
        self.inlier_thresh = inlier_thresh
        self.patch_radius = max_local_patch_radius
        self.lambda_radius = lambda_radius
        self.use_candidate_suppression = use_candidate_suppression
        self.nms_dist_tolerance = nms_dist_tolerance
        self.use_heatmap_refinement = use_heatmap_refinement
        self.heatmap_refine_cfg = heatmap_refine_cfg or {
            "mode": "local", "ratio": 0.2, "valid_thresh": 0.001,
            "num_blocks": 20, "overlap_ratio": 0.5}
        self.use_junction_refinement = use_junction_refinement
        self.junction_refine_cfg = junction_refine_cfg or {
            "num_perturbs": 9, "perturb_interval": 0.25}
        r = int(max_local_patch_radius)
        oy, ox = np.mgrid[-r:r + 1, -r:r + 1]
        circle = (oy ** 2 + ox ** 2) <= max_local_patch_radius ** 2
        self._patch_offsets = np.stack(
            [oy[circle], ox[circle]], axis=1).astype(np.float32)

    # ------------------------------------------------------------------
    def detect(self, junctions: np.ndarray,
               heatmap: np.ndarray) -> np.ndarray:
        """-> segments [S, 2, 2] in (h, w)."""
        junctions = np.asarray(junctions, np.float64)
        heatmap = np.asarray(heatmap, np.float64)
        H, W = heatmap.shape
        J = len(junctions)
        if J < 2:
            return np.zeros((0, 2, 2))

        if self.use_heatmap_refinement:
            cfg = self.heatmap_refine_cfg
            if cfg["mode"] == "global":
                heatmap = refine_heatmap(heatmap, cfg["ratio"],
                                         cfg["valid_thresh"])
            else:
                heatmap = refine_heatmap_local(
                    heatmap, cfg["num_blocks"], cfg["overlap_ratio"],
                    cfg["ratio"], cfg["valid_thresh"])

        si, ei = np.triu_indices(J, 1)
        cand_mask = np.ones(len(si), bool)
        if self.use_candidate_suppression:
            cand_mask &= ~self._suppressed(junctions, si, ei)
        si, ei = si[cand_mask], ei[cand_mask]
        if len(si) == 0:
            return np.zeros((0, 2, 2))

        start = junctions[si]
        end = junctions[ei]
        feat = self._sample_candidates(heatmap, start, end)
        detected = feat.mean(axis=-1) > self.detect_thresh
        if self.inlier_thresh > 0:
            inlier = (feat > self.detect_thresh).mean(axis=-1)
            detected &= inlier >= self.inlier_thresh

        segments = np.stack([start[detected], end[detected]], axis=1)
        if self.use_junction_refinement and len(segments):
            segments = self._refine_junctions(segments, heatmap, H, W)
        return segments

    # ------------------------------------------------------------------
    def _sample_candidates(self, heatmap, start, end):
        """Sampled heatmap activation along each candidate
        (line_detection.py:158-243)."""
        H, W = heatmap.shape
        t = np.linspace(0, 1, self.num_samples)
        ch = np.clip(start[:, 0:1] * t + end[:, 0:1] * (1 - t), 0, H - 1)
        cw = np.clip(start[:, 1:2] * t + end[:, 1:2] * (1 - t), 0, W - 1)
        if self.sampling_method == "bilinear":
            return _bilinear(heatmap, ch, cw)
        seg_len = np.linalg.norm(start - end, axis=-1)
        norm_len = seg_len / math.sqrt(H * H + W * W)
        dist_thresh = (0.5 * math.sqrt(2.0)
                       + self.lambda_radius * norm_len)
        cand = np.stack([ch, cw], axis=-1).astype(np.float32)
        dth = np.broadcast_to(dist_thresh[:, None],
                              ch.shape).astype(np.float32)
        out = np.empty(ch.shape, np.float32)
        hm = jnp.asarray(heatmap.astype(np.float32))
        po = jnp.asarray(self._patch_offsets)
        chunk = 8192
        for i0 in range(0, len(cand), chunk):
            out[i0:i0 + chunk] = np.asarray(_local_max_sample(
                hm, jnp.asarray(cand[i0:i0 + chunk]),
                jnp.asarray(dth[i0:i0 + chunk]), po))
        return out

    def _suppressed(self, junctions, si, ei):
        """Long segments crossing a third junction are suppressed
        (line_detection.py:328-389)."""
        start = junctions[si]
        end = junctions[ei]
        line_dists = np.linalg.norm(end - start, axis=-1)
        dirs = (end - start) / (line_dists[:, None] + 1e-12)
        cand_vecs = junctions[None, :, :] - start[:, None, :]  # [S, J, 2]
        cand_norm = np.linalg.norm(cand_vecs, axis=-1)
        proj = np.einsum("sjk,sk->sj", cand_vecs, dirs) \
            / (line_dists[:, None] + 1e-12)
        proj_mask = (proj >= 0) & (proj <= 1)
        with np.errstate(invalid="ignore", divide="ignore"):
            cosang = np.einsum("sjk,sk->sj", cand_vecs, dirs) \
                / np.where(cand_norm > 0, cand_norm, 1.0)
        ang = np.arccos(np.clip(cosang, -1.0, 1.0))
        perp = cand_norm * np.sin(ang)
        on_line = (perp <= self.nms_dist_tolerance) & proj_mask
        counts = on_line.sum(axis=1)
        counts -= on_line[np.arange(len(si)), si].astype(int)
        counts -= on_line[np.arange(len(si)), ei].astype(int)
        return counts > 0

    def _refine_junctions(self, segments, heatmap, H, W):
        """Perturb endpoints on a 4-D grid, keep the best mean
        activation (line_detection.py:391-496), batched over segments
        instead of the reference's per-segment loop."""
        cfg = self.junction_refine_cfg
        num_perturbs = cfg["num_perturbs"]
        interval = cfg["perturb_interval"]
        side = (num_perturbs - 1) // 2
        vec = np.arange(-interval * side, interval * (side + 1), interval)
        g = np.stack(np.meshgrid(vec, vec, vec, vec, indexing="ij"),
                     axis=-1).reshape(-1, 2, 2)       # [P4, 2, 2]
        t = np.linspace(0, 1, self.num_samples)
        refined = np.empty_like(segments)
        chunk = max(1, int(2e7 // (len(g) * self.num_samples)))
        for i0 in range(0, len(segments), chunk):
            seg = segments[i0:i0 + chunk, None] + g[None]  # [C, P4, 2, 2]
            seg[..., 0] = np.clip(seg[..., 0], 0, H - 1)
            seg[..., 1] = np.clip(seg[..., 1], 0, W - 1)
            ch = np.clip(seg[..., 0, 0, None] * t
                         + seg[..., 1, 0, None] * (1 - t), 0, H - 1)
            cw = np.clip(seg[..., 0, 1, None] * t
                         + seg[..., 1, 1, None] * (1 - t), 0, W - 1)
            score = _bilinear(heatmap, ch, cw).mean(axis=-1)  # [C, P4]
            best = np.argmax(score, axis=1)
            refined[i0:i0 + chunk] = seg[np.arange(len(seg)), best]
        # deduplicate (the reference rebuilds a line map over unique
        # junctions, line_detection.py:485-496)
        return np.unique(refined.reshape(len(refined), 4),
                         axis=0).reshape(-1, 2, 2)
