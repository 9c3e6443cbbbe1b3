"""Point-line bipartite structures (2D and 3D) + junctions.

Re-implements /root/reference/src/limap/structures/pl_bipartite{_base}.h:
adjacency between points/keypoints and lines with distance-threshold
attachment, line-line intersection junctions, and the 3D instantiation
over PointTrack/LineTrack.  Keypoint attachment is computed as one
batched point-segment distance matrix rather than per-point loops.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from limap_tpu.base.lines import Segments


@dataclasses.dataclass
class Point2d:
    """(xy, point3D_id) (base/pointtrack.h:34)."""

    p: np.ndarray
    point3D_id: int = -1


@dataclasses.dataclass
class Junction:
    """A point with the ids of its incident lines
    (pl_bipartite_base.h)."""

    p: object
    line_ids: List[int]


@dataclasses.dataclass(frozen=True)
class PL_Bipartite2dConfig:
    threshold_keypoints: float = 2.0
    threshold_intersection: float = 2.0
    threshold_merge_junctions: float = 2.0

    @classmethod
    def from_dict(cls, d):
        if d is None:
            return cls()
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


class PL_BipartiteBase:
    """Generic bipartite (pl_bipartite_base.h:31-97)."""

    def __init__(self):
        self.points_: Dict[int, object] = {}
        self.lines_: Dict[int, object] = {}
        self.np2l: Dict[int, List[int]] = {}  # point -> lines
        self.nl2p: Dict[int, List[int]] = {}  # line -> points

    def count_points(self):
        return len(self.points_)

    def count_lines(self):
        return len(self.lines_)

    def count_edges(self):
        return sum(len(v) for v in self.np2l.values())

    def add_point(self, p, point_id: int, neighbors: List[int]):
        self.points_[point_id] = p
        self.np2l[point_id] = list(neighbors)
        for l in neighbors:
            self.nl2p.setdefault(l, []).append(point_id)

    def add_line(self, line, line_id: int):
        self.lines_[line_id] = line
        self.nl2p.setdefault(line_id, [])

    def point(self, point_id):
        return self.points_[point_id]

    def line(self, line_id):
        return self.lines_[line_id]

    def get_point_ids(self):
        return sorted(self.points_.keys())

    def get_line_ids(self):
        return sorted(self.lines_.keys())

    def neighbor_points(self, line_id) -> List[int]:
        return self.nl2p.get(line_id, [])

    def neighbor_lines(self, point_id) -> List[int]:
        return self.np2l.get(point_id, [])

    def pdegree(self, point_id):
        return len(self.np2l.get(point_id, []))

    def ldegree(self, line_id):
        return len(self.nl2p.get(line_id, []))

    def get_default_new_point_id(self):
        return max(self.points_.keys(), default=-1) + 1


class PL_Bipartite2d(PL_BipartiteBase):
    """2D instantiation (pl_bipartite.h:35-60)."""

    def __init__(self, config: PL_Bipartite2dConfig = PL_Bipartite2dConfig()):
        super().__init__()
        self.config = config

    def init_lines(self, segs: np.ndarray):
        """segs: (N, >=4); line ids are row indices."""
        segs = np.asarray(segs, np.float64)
        for i, s in enumerate(segs):
            self.add_line(s[:4].copy(), i)

    def _line_segments(self) -> Tuple[Segments, List[int]]:
        ids = self.get_line_ids()
        arr = np.stack([self.lines_[i] for i in ids]) if ids else \
            np.zeros((0, 4))
        return Segments(jnp.asarray(arr[:, :2], jnp.float32),
                        jnp.asarray(arr[:, 2:4], jnp.float32)), ids

    def add_keypoints_with_point3D_ids(self, points: np.ndarray,
                                       point3D_ids, ids=None):
        """Batch attach keypoints by point-segment distance
        (pl_bipartite.cc:56-82), one distance matrix for all points."""
        points = np.asarray(points, np.float64).reshape(-1, 2)
        seg, line_ids = self._line_segments()
        if len(points) == 0:
            return
        if seg.start.shape[0]:
            d = np.asarray(seg.point_distance(
                jnp.asarray(points, jnp.float32)[:, None, :]))
            close = d <= self.config.threshold_keypoints  # [P, L]
        else:
            close = np.zeros((len(points), 0), bool)
        for i, (p, pid3) in enumerate(zip(points, point3D_ids)):
            point_id = (ids[i] if ids is not None
                        else self.get_default_new_point_id())
            neighbors = [line_ids[j] for j in np.nonzero(close[i])[0]]
            self.add_point(Point2d(p, int(pid3)), point_id, neighbors)

    def compute_intersections(self) -> List[Junction]:
        """Line-line intersection junctions within the segment extents
        (pl_bipartite.h:52, cc intersect)."""
        seg, line_ids = self._line_segments()
        n = seg.start.shape[0]
        if n < 2:
            return []
        th = self.config.threshold_intersection
        s = np.asarray(seg.start)
        e = np.asarray(seg.end)
        juncs = []
        coords = np.asarray(seg.coords())
        for i in range(n):
            for j in range(i + 1, n):
                p_h = np.cross(coords[i], coords[j])
                if abs(p_h[2]) < 1e-9:
                    continue
                p = p_h[:2] / p_h[2]
                # inside (extended by threshold) both segments
                ok = True
                for k in (i, j):
                    d = e[k] - s[k]
                    L = np.linalg.norm(d)
                    t = (p - s[k]) @ d / max(L * L, 1e-12)
                    if t * L < -th or (t - 1) * L > th:
                        ok = False
                        break
                if ok:
                    juncs.append(Junction(p, [line_ids[i], line_ids[j]]))
        return self._merge_junctions(juncs)

    def _merge_junctions(self, juncs: List[Junction]) -> List[Junction]:
        th = self.config.threshold_merge_junctions
        merged: List[Junction] = []
        for j in juncs:
            hit = None
            for m in merged:
                if np.linalg.norm(np.asarray(m.p) - np.asarray(j.p)) <= th:
                    hit = m
                    break
            if hit is None:
                merged.append(Junction(np.asarray(j.p), list(j.line_ids)))
            else:
                hit.line_ids = sorted(set(hit.line_ids) | set(j.line_ids))
        return merged


class PL_Bipartite3d(PL_BipartiteBase):
    """3D instantiation over PointTrack / LineTrack ids
    (pl_bipartite.h:62-73)."""

    def get_point_cloud(self) -> np.ndarray:
        return np.stack([np.asarray(p.p) for p in
                         self.points_.values()]) if self.points_ else \
            np.zeros((0, 3))

    def get_line_cloud(self) -> np.ndarray:
        return np.stack([np.asarray(t.line) for t in
                         self.lines_.values()]) if self.lines_ else \
            np.zeros((0, 2, 3))


@dataclasses.dataclass
class PointTrack:
    """3D point + observations (base/pointtrack.h:36)."""

    p: np.ndarray
    image_id_list: List[int] = dataclasses.field(default_factory=list)
    p2d_id_list: List[int] = dataclasses.field(default_factory=list)
    p2d_list: List[np.ndarray] = dataclasses.field(default_factory=list)

    def count_images(self):
        return len(self.image_id_list)


def compute_2d_bipartites_from_points(
        points3d: Dict[int, dict], points2d: Dict[int, np.ndarray],
        all_2d_segs: Dict[int, np.ndarray],
        cfg: PL_Bipartite2dConfig = PL_Bipartite2dConfig()):
    """Build per-image 2D bipartites + 3D point map
    (runners/functions_structures.py:81-123 equivalent).

    points2d: {img_id: (P, 3) array of x, y, point3D_id}.
    Returns (all_bpt2ds {img_id: PL_Bipartite2d}, sfm_points {pid: xyz}).
    """
    all_bpt2ds = {}
    for img_id, segs in all_2d_segs.items():
        bpt = PL_Bipartite2d(cfg)
        bpt.init_lines(np.asarray(segs))
        kps = points2d.get(img_id)
        if kps is not None and len(kps):
            sel = kps[:, 2] >= 0
            bpt.add_keypoints_with_point3D_ids(kps[sel, :2],
                                               kps[sel, 2].astype(np.int64))
        all_bpt2ds[img_id] = bpt
    sfm_points = {int(pid): np.asarray(rec["xyz"])
                  for pid, rec in points3d.items()}
    return all_bpt2ds, sfm_points
