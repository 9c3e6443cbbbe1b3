"""SOLD2 detector / extractor / matcher plugins.

TPU-native counterpart of /root/reference/src/limap/line2d/SOLD2/
{sold2.py, sold2_wrapper.py} and model/line_matching.py
(WunschLineMatcher).  The network forward runs as a jitted JAX function
(nets.py) on padded image buckets so a scene's frames share one
compiled program; the published ``sold2_wireframe.tar`` torch
checkpoint loads through :func:`nets.load_torch_state_dict` when a
``weight_path`` is supplied (this environment has no network egress, so
nothing is auto-downloaded; without weights the detector still runs for
pipeline smoke-testing with seeded random parameters).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.line2d.base import (BaseDetector, BaseMatcher,
                                   register_detector, register_extractor,
                                   register_matcher)
from limap_tpu.line2d.sold2 import nets
from limap_tpu.line2d.sold2.detection import (LineSegmentDetector,
                                              heatmap_from_logits,
                                              junctions_from_predictions)

_DEFAULT_DETECTOR_CFG = {  # config/export_line_features.yaml
    "grid_size": 8,
    "junc_detect_thresh": 1 / 65,
    "max_num_junctions": 300,
    "detect_thresh": 0.5,
    "num_samples": 64,
    "inlier_thresh": 0.99,
    "use_candidate_suppression": True,
    "nms_dist_tolerance": 3.0,
    "use_heatmap_refinement": True,
    "use_junction_refinement": True,
}


def _bresenham(p0, p1):
    """Integer raster of a segment (replaces skimage.draw.line,
    sold2_wrapper.py:8,101)."""
    y0, x0 = int(p0[0]), int(p0[1])
    y1, x1 = int(p1[0]), int(p1[1])
    n = max(abs(y1 - y0), abs(x1 - x0)) + 1
    ys = np.round(np.linspace(y0, y1, n)).astype(int)
    xs = np.round(np.linspace(x0, x1, n)).astype(int)
    return ys, xs


class SOLD2Engine:
    """Shared network + post-processing state (SOLD2LineDetector,
    sold2_wrapper.py:14)."""

    def __init__(self, weight_path: Optional[str] = None, seed: int = 0):
        self.grid_size = _DEFAULT_DETECTOR_CFG["grid_size"]
        self.junc_detect_thresh = _DEFAULT_DETECTOR_CFG["junc_detect_thresh"]
        self.max_num_junctions = _DEFAULT_DETECTOR_CFG["max_num_junctions"]
        self.params = None
        if weight_path is not None:
            ckpt = weight_path
            if os.path.isdir(weight_path):
                ckpt = os.path.join(weight_path, "line2d", "SOLD2",
                                    "pretrained_models",
                                    "sold2_wireframe.tar")
            self.params = self._load_checkpoint(ckpt)
        if self.params is None:
            self.params = nets.init_params(seed)
        self.line_detector = LineSegmentDetector(
            detect_thresh=_DEFAULT_DETECTOR_CFG["detect_thresh"],
            num_samples=_DEFAULT_DETECTOR_CFG["num_samples"],
            inlier_thresh=_DEFAULT_DETECTOR_CFG["inlier_thresh"],
            use_candidate_suppression=_DEFAULT_DETECTOR_CFG[
                "use_candidate_suppression"],
            nms_dist_tolerance=_DEFAULT_DETECTOR_CFG["nms_dist_tolerance"],
            use_heatmap_refinement=_DEFAULT_DETECTOR_CFG[
                "use_heatmap_refinement"],
            use_junction_refinement=_DEFAULT_DETECTOR_CFG[
                "use_junction_refinement"])
        self._forward = jax.jit(nets.sold2_forward)
        self.matcher = WunschLineMatcher()

    @staticmethod
    def _load_checkpoint(path):
        if not os.path.isfile(path):
            return None
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("model_state_dict", ckpt)
        sd = {k: v.numpy() for k, v in sd.items()}
        return nets.load_torch_state_dict(sd)

    def forward(self, img_gray: np.ndarray):
        """img [H, W] uint8/float -> dict of numpy maps (padded to the
        8-px grid, cropped back)."""
        img = np.asarray(img_gray, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        H, W = img.shape
        Hp = -(-H // 8) * 8
        Wp = -(-W // 8) * 8
        buf = np.zeros((1, Hp, Wp, 1), np.float32)
        buf[0, :H, :W, 0] = img
        out = self._forward(self.params, jnp.asarray(buf))
        return {
            "junctions": np.asarray(out["junctions"]),
            "heatmap": np.asarray(out["heatmap"])[:, :H, :W],
            "descriptors": np.asarray(out["descriptors"]),
        }, (H, W)

    def detect(self, img_gray: np.ndarray):
        """-> (segs [N, 5] x1 y1 x2 y2 saliency, desc grid, heatmap,
        descinfo) as in sold2_wrapper.py:62-112."""
        if img_gray.shape[0] < 80 or img_gray.shape[1] < 80:
            return (np.zeros((0, 5)), None, None, [])
        out, (H, W) = self.forward(img_gray)
        junctions = junctions_from_predictions(
            out["junctions"], self.grid_size, self.junc_detect_thresh,
            self.max_num_junctions)
        heatmap = heatmap_from_logits(out["heatmap"])
        segs_hw = self.line_detector.detect(junctions, heatmap)  # [S,2,2]
        descinfo = self.matcher.compute_descriptors(
            segs_hw, out["descriptors"], self.grid_size)
        # (h, w) -> (x, y) flat segs
        segs = np.flip(segs_hw, axis=2).reshape(len(segs_hw), 4)
        saliency = np.empty(len(segs_hw))
        for i, s in enumerate(np.round(segs_hw).astype(int)):
            ys, xs = _bresenham(
                np.clip(s[0], 0, [H - 1, W - 1]),
                np.clip(s[1], 0, [H - 1, W - 1]))
            saliency[i] = heatmap[ys, xs].sum()
        return (np.hstack([segs, saliency[:, None]]),
                out["descriptors"], heatmap, descinfo)

    def compute_descinfo(self, segs_xy: np.ndarray, desc_grid):
        segs_hw = np.flip(np.asarray(segs_xy[:, :4], np.float64)
                          .reshape(-1, 2, 2), axis=2)
        return self.matcher.compute_descriptors(segs_hw, desc_grid,
                                                self.grid_size)


class WunschLineMatcher:
    """Needleman-Wunsch line matching over descriptors sampled along
    segments (line_matching.py:12-443)."""

    def __init__(self, cross_check=True, num_samples=5, min_dist_pts=8,
                 top_k_candidates=10, gap=0.1):
        self.cross_check = cross_check
        self.num_samples = num_samples
        self.min_dist_pts = min_dist_pts
        self.top_k_candidates = top_k_candidates
        self.gap = gap

    # ---------------------------------------------------------- sampling
    def sample_line_points(self, segs_hw):
        """Regular samples with a min spacing; pad short lines
        (line_matching.py:291-342)."""
        n = len(segs_hw)
        S = self.num_samples
        lengths = np.linalg.norm(segs_hw[:, 0] - segs_hw[:, 1], axis=1)
        counts = np.clip(lengths // self.min_dist_pts, 2, S).astype(int)
        t = np.linspace(0, 1, S)[None, :, None]
        pts = np.zeros((n, S, 2))
        valid = np.zeros((n, S), bool)
        for c in range(2, S + 1):
            m = counts == c
            if not m.any():
                continue
            tc = np.linspace(0, 1, c)[None, :, None]
            p = segs_hw[m, None, 0] * (1 - tc) + segs_hw[m, None, 1] * tc
            pts[np.nonzero(m)[0][:, None], np.arange(c)[None, :]] = p
            valid[m, :c] = True
        del t
        return pts, valid

    def compute_descriptors(self, segs_hw, desc_grid_nhwc, grid_size=4):
        """-> [desc [D, n*S] L2-normalized, valid [n, S]]
        (line_matching.py:36-63)."""
        if len(segs_hw) == 0:
            return []
        pts, valid = self.sample_line_points(np.asarray(segs_hw,
                                                        np.float64))
        desc = np.asarray(desc_grid_nhwc)[0]  # [Hc, Wc, D]
        # grid_sample(align_corners=False) coordinate mapping
        u = pts.reshape(-1, 2) / grid_size - 0.5  # (h, w) in desc cells
        Hc, Wc, D = desc.shape
        h0 = np.floor(u[:, 0]).astype(int)
        w0 = np.floor(u[:, 1]).astype(int)
        fh = u[:, 0] - h0
        fw = u[:, 1] - w0

        def get(hh, ww):
            ok = (hh >= 0) & (hh < Hc) & (ww >= 0) & (ww < Wc)
            v = desc[np.clip(hh, 0, Hc - 1), np.clip(ww, 0, Wc - 1)]
            return v * ok[:, None]

        d = (get(h0, w0) * ((1 - fh) * (1 - fw))[:, None]
             + get(h0, w0 + 1) * ((1 - fh) * fw)[:, None]
             + get(h0 + 1, w0) * (fh * (1 - fw))[:, None]
             + get(h0 + 1, w0 + 1) * (fh * fw)[:, None])
        d = d / (np.linalg.norm(d, axis=1, keepdims=True) + 1e-12)
        return [d.T.astype(np.float32), valid]

    # ---------------------------------------------------------- matching
    def _score_matrix(self, descinfo1, descinfo2):
        desc1, valid1 = descinfo1
        desc2, valid2 = descinfo2
        n1, n2 = valid1.shape[0], valid2.shape[0]
        S = self.num_samples
        scores = desc1.T @ desc2
        scores[~valid1.reshape(-1)] = -1
        scores[:, ~valid2.reshape(-1)] = -1
        return scores.reshape(n1, S, n2, S).transpose(0, 2, 1, 3)

    @staticmethod
    def _line_scores(scores):
        s1 = scores.max(3)
        v1 = s1 != -1
        s1 = (s1 * v1).sum(2) / np.maximum(v1.sum(2), 1)
        s2 = scores.max(2)
        v2 = s2 != -1
        s2 = (s2 * v2).sum(2) / np.maximum(v2.sum(2), 1)
        return (s1 + s2) / 2

    def needleman_wunsch(self, scores):
        """Batched NW DP with zero-cost gaps (line_matching.py:419-443)."""
        b, n, m = scores.shape
        nw = scores - self.gap
        grid = np.zeros((b, n + 1, m + 1))
        for i in range(n):
            for j in range(m):
                grid[:, i + 1, j + 1] = np.maximum(
                    np.maximum(grid[:, i + 1, j], grid[:, i, j + 1]),
                    grid[:, i, j] + nw[:, i, j])
        return grid[:, -1, -1]

    def _match_one_way(self, scores):
        n1 = scores.shape[0]
        k = min(self.top_k_candidates, scores.shape[1])
        line_scores = self._line_scores(scores)
        topk = np.argsort(line_scores, axis=1)[:, -k:]
        top_scores = np.take_along_axis(scores, topk[:, :, None, None],
                                        axis=1)
        top_scores = np.concatenate(
            [top_scores, top_scores[..., ::-1]], axis=1)
        _, top2k, n, m = top_scores.shape
        nw = self.needleman_wunsch(top_scores.reshape(-1, n, m))
        nw = nw.reshape(n1, top2k)
        best = np.mod(np.argmax(nw, axis=1), top2k // 2)
        return topk[np.arange(n1), best]

    def compute_matches(self, descinfo1, descinfo2):
        scores = self._score_matrix(descinfo1, descinfo2)
        matches = self._match_one_way(scores)
        if self.cross_check:
            matches2 = self._match_one_way(scores.transpose(1, 0, 3, 2))
            mutual = matches2[matches] == np.arange(len(matches))
            matches = np.where(mutual, matches, -1)
        return matches

    def compute_matches_topk(self, descinfo1, descinfo2, topk=10):
        scores = self._score_matrix(descinfo1, descinfo2)
        line_scores = self._line_scores(scores)
        k = min(topk, scores.shape[1])
        return np.argsort(line_scores, axis=1)[:, -k:]


# ---------------------------------------------------------------- plugins
@register_detector("sold2")
@register_extractor("sold2")
class SOLD2Detector(BaseDetector):
    def __init__(self, options: Optional[dict] = None):
        super().__init__(options)
        options = options or {}
        self.engine = SOLD2Engine(weight_path=self.weight_path,
                                  seed=options.get("seed", 0))

    def get_module_name(self):
        return "sold2"

    def detect(self, camview):
        img = camview.read_image(set_gray=self.set_gray)
        segs, _, _, _ = self.engine.detect(img)
        return segs

    def extract(self, camview, segs):
        img = camview.read_image(set_gray=self.set_gray)
        out, _ = self.engine.forward(img)
        descinfo = self.engine.compute_descinfo(np.asarray(segs),
                                                out["descriptors"])
        if len(descinfo) == 0:
            return {"desc": np.zeros((128, 0), np.float32),
                    "valid": np.zeros((0, 5), bool)}
        return {"desc": descinfo[0], "valid": descinfo[1]}

    def detect_and_extract(self, camview):
        img = camview.read_image(set_gray=self.set_gray)
        segs, _, _, descinfo = self.engine.detect(img)
        if len(descinfo) == 0:
            descinfo = {"desc": np.zeros((128, 0), np.float32),
                        "valid": np.zeros((0, 5), bool)}
        else:
            descinfo = {"desc": descinfo[0], "valid": descinfo[1]}
        return segs, descinfo


SOLD2Extractor = SOLD2Detector


@register_matcher("sold2")
class SOLD2Matcher(BaseMatcher):
    def __init__(self, extractor, options: Optional[dict] = None):
        super().__init__(extractor, options)
        assert extractor.get_module_name() == "sold2"
        self.matcher = WunschLineMatcher()

    def get_module_name(self):
        return "sold2"

    def match_pair(self, descinfo1, descinfo2):
        d1 = [descinfo1["desc"], descinfo1["valid"]]
        d2 = [descinfo2["desc"], descinfo2["valid"]]
        if d1[1].shape[0] == 0 or d2[1].shape[0] == 0:
            return np.zeros((0, 2), int)
        if self.topk == 0:
            matches = self.matcher.compute_matches(d1, d2)
            ids1 = np.nonzero(matches != -1)[0]
            return np.stack([ids1, matches[ids1]], axis=1)
        topk_lines = self.matcher.compute_matches_topk(d1, d2, self.topk)
        n1, k = topk_lines.shape
        out = [np.stack([np.arange(n1), topk_lines[:, i]], axis=1)
               for i in range(k)]
        return np.concatenate(out, axis=0)
