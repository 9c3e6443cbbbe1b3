"""SfM model: 3D points + visibility, visual-neighbor ranking, ranges.

Re-implements /root/reference/src/limap/pointsfm/sfm_model.{h,cc}
(itself on colmap::mvs::Model): per-image point counts, pairwise shared
points, percentile triangulation angles, neighbor ranking by
IoU/Dice/overlap, and robust scene ranges.  Vectorized NumPy — the data
is tiny relative to the geometry kernels.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


class SfmModel:
    def __init__(self):
        self.points: List[np.ndarray] = []         # [3] xyz
        self.tracks: List[List[int]] = []          # image indices per point
        self.reg_image_ids: List[int] = []         # index -> img_id
        self.centers: List[np.ndarray] = []        # per image camera center

    # ------------------------------------------------------------ build
    def add_image(self, center, img_id: Optional[int] = None) -> None:
        if img_id is None:
            img_id = len(self.reg_image_ids)
        self.reg_image_ids.append(int(img_id))
        self.centers.append(np.asarray(center, np.float64))

    def add_point(self, xyz, image_idx_list) -> None:
        """image_idx_list holds *indices* into reg_image_ids (the
        reference's convention, sfm_model.cc addPoint)."""
        self.points.append(np.asarray(xyz, np.float64))
        self.tracks.append([int(i) for i in image_idx_list])

    @classmethod
    def from_imagecols_and_points(cls, imagecols, points3d: Dict[int, dict]):
        """points3d: {point_id: {"xyz": [3], "image_ids": [img ids]}}."""
        model = cls()
        img_ids = imagecols.get_img_ids()
        id2idx = {img_id: i for i, img_id in enumerate(img_ids)}
        for img_id in img_ids:
            model.add_image(imagecols.campose(img_id).center(), img_id)
        for _, rec in points3d.items():
            idxs = [id2idx[i] for i in rec["image_ids"] if i in id2idx]
            if idxs:
                model.add_point(rec["xyz"], idxs)
        return model

    # ------------------------------------------------------- statistics
    def num_images(self) -> int:
        return len(self.reg_image_ids)

    def compute_num_points(self) -> np.ndarray:
        num = np.zeros(self.num_images(), np.int64)
        for track in self.tracks:
            for idx in track:
                num[idx] += 1
        return num

    def compute_shared_points(self) -> np.ndarray:
        """Dense [I, I] pairwise shared-point counts."""
        I = self.num_images()
        shared = np.zeros((I, I), np.int64)
        for track in self.tracks:
            t = np.unique(track)
            shared[np.ix_(t, t)] += 1
        np.fill_diagonal(shared, 0)
        return shared

    def compute_triangulation_angles(self,
                                     percentile: float = 75.0) -> np.ndarray:
        """[I, I] percentile triangulation angle (radians) over shared
        points (colmap::mvs::Model::ComputeTriangulationAngles)."""
        I = self.num_images()
        centers = np.asarray(self.centers)
        angle_lists: Dict[Tuple[int, int], List[float]] = {}
        for p, track in zip(self.points, self.tracks):
            t = np.unique(track)
            if len(t) < 2:
                continue
            rays = centers[t] - p[None]
            norms = np.linalg.norm(rays, axis=1)
            rays = rays / np.maximum(norms[:, None], 1e-12)
            cos = rays @ rays.T
            ang = np.arccos(np.clip(cos, -1, 1))
            for ai in range(len(t)):
                for bi in range(ai + 1, len(t)):
                    angle_lists.setdefault(
                        (int(t[ai]), int(t[bi])), []).append(ang[ai, bi])
        out = np.zeros((I, I))
        for (a, b), angs in angle_lists.items():
            v = np.percentile(angs, percentile)
            out[a, b] = out[b, a] = v
        return out

    # -------------------------------------------------------- neighbors
    def _ranked_neighbors(self, metric: str, n_neighbors: int,
                          min_triangulation_angle: float
                          ) -> Dict[int, List[int]]:
        I = self.num_images()
        shared = self.compute_shared_points()
        num = self.compute_num_points()
        tri_ang = self.compute_triangulation_angles()
        min_rad = np.deg2rad(min_triangulation_angle)

        inter = shared.astype(np.float64)
        union = num[:, None] + num[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            if metric == "overlap":
                score = inter
            elif metric == "iou":
                score = np.where(union > 0, inter / union, 0.0)
            elif metric == "dice":
                score = np.where(union + inter > 0,
                                 2 * inter / (union + inter), 0.0)
            else:
                raise ValueError(f"unknown neighbor metric {metric!r}")
        valid = (shared > 0) & (tri_ang >= min_rad)
        score = np.where(valid, score, -1.0)
        np.fill_diagonal(score, -1.0)

        neighbors = {}
        for i in range(I):
            order = np.argsort(-score[i], kind="stable")
            sel = [int(j) for j in order[:n_neighbors] if score[i][j] > 0]
            neighbors[self.reg_image_ids[i]] = [
                self.reg_image_ids[j] for j in sel]
        return neighbors

    def GetMaxOverlapImages(self, n, min_triangulation_angle=1.0):
        return self._ranked_neighbors("overlap", n, min_triangulation_angle)

    def GetMaxIoUImages(self, n, min_triangulation_angle=1.0):
        return self._ranked_neighbors("iou", n, min_triangulation_angle)

    def GetMaxDiceCoeffImages(self, n, min_triangulation_angle=1.0):
        return self._ranked_neighbors("dice", n, min_triangulation_angle)

    # ----------------------------------------------------------- ranges
    def ComputeRanges(self, range_robust=(0.05, 0.95), kstretch=1.25):
        """Robust percentile range with stretch (sfm_model.cc
        ComputeRanges + get_robust_range)."""
        if not self.points:
            return (np.full(3, -1e9), np.full(3, 1e9))
        pts = np.asarray(self.points)
        lo = np.quantile(pts, range_robust[0], axis=0)
        hi = np.quantile(pts, range_robust[1], axis=0)
        center = 0.5 * (lo + hi)
        half = 0.5 * (hi - lo) * kstretch
        return (center - half, center + half)


def compute_neighbors(model: SfmModel, n_neighbors: int,
                      min_triangulation_angle: float = 1.0,
                      neighbor_type: str = "dice") -> Dict[int, List[int]]:
    """pointsfm/functions.py:20-38 equivalent."""
    if neighbor_type == "iou":
        return model.GetMaxIoUImages(n_neighbors, min_triangulation_angle)
    if neighbor_type == "overlap":
        return model.GetMaxOverlapImages(n_neighbors, min_triangulation_angle)
    if neighbor_type == "dice":
        return model.GetMaxDiceCoeffImages(n_neighbors,
                                           min_triangulation_angle)
    raise NotImplementedError(neighbor_type)


def compute_metainfos(cfg: dict, model: SfmModel, n_neighbors: int = 20):
    """pointsfm/functions.py:41-55 equivalent."""
    neighbors = compute_neighbors(
        model, n_neighbors,
        min_triangulation_angle=cfg.get("min_triangulation_angle", 1.0),
        neighbor_type=cfg.get("neighbor_type", "dice"))
    rcfg = cfg.get("ranges", {})
    ranges = model.ComputeRanges(
        rcfg.get("range_robust", (0.05, 0.95)), rcfg.get("k_stretch", 1.25))
    return neighbors, ranges
