"""f64 NumPy oracle of the reference LIMAP triangulator semantics.

Independent, per-object re-derivation of the reference's
proposal -> score -> degree-filter -> cluster -> aggregate pipeline,
used to validate the batched TPU triangulator
(limap_tpu/triangulation/triangulator.py) and to anchor BASELINE
parity claims when the reference itself cannot be built in-env
(no network: Ceres/COLMAP FetchContent unavailable).

Semantics transcribed from (file:line = reference paths):
- proposals: triangulation/base_line_triangulator.cc:160-337
- algebraic triangulation + epipolar IoU: triangulation/functions.cc:77-233
- scoring: triangulation/global_line_triangulator.cc:71-161
- degree filter: global_line_triangulator.cc:168-232
- clustering + greedy union-find: global_line_triangulator.cc:234-351,
  merging/merging.cc:18-104
- endpoint aggregation: merging/aggregator.cc:53-103
- linker scores: base/line_linker.{h,cc}, base/line_dists.h

Everything is float64, scalar/loop-based NumPy: slow, exact, oracle-grade.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import numpy as np

EPS = 1e-12


# ---------------------------------------------------------------- cameras


class OracleView:
    """Pinhole view: K [3,3], R [3,3] (world->cam), t [3]."""

    def __init__(self, K, R, t):
        self.K = np.asarray(K, np.float64)
        self.R = np.asarray(R, np.float64)
        self.t = np.asarray(t, np.float64)
        self.K_inv = np.linalg.inv(self.K)

    def center(self):
        return -self.R.T @ self.t

    def ray_direction(self, p2d):
        """Normalized world-space ray (camera_view.h ray_direction)."""
        v = self.R.T @ self.K_inv @ np.array([p2d[0], p2d[1], 1.0])
        return v / np.linalg.norm(v)

    def projdepth(self, p3d):
        return (self.R @ p3d + self.t)[2]

    def project(self, p3d):
        q = self.K @ (self.R @ p3d + self.t)
        return q[:2] / q[2]

    def focal(self):
        return 0.5 * (self.K[0, 0] + self.K[1, 1])

    def uncertainty(self, depth, var2d):
        return var2d * depth / self.focal()


# ------------------------------------------------------------- primitives


def seg_length(seg):
    return np.linalg.norm(seg[1] - seg[0])


def seg_direction(seg):
    d = seg[1] - seg[0]
    return d / max(np.linalg.norm(d), EPS)


def seg_midpoint(seg):
    return 0.5 * (seg[0] + seg[1])


def project_seg(seg3d, view: OracleView):
    return np.stack([view.project(seg3d[0]), view.project(seg3d[1])])


def coords_2d(seg2d):
    """Normalized homogeneous line coords of a 2D segment."""
    a = np.array([seg2d[0][0], seg2d[0][1], 1.0])
    b = np.array([seg2d[1][0], seg2d[1][1], 1.0])
    c = np.cross(a, b)
    return c / max(np.linalg.norm(c[:2]), EPS)


def sensitivity(seg3d, view: OracleView):
    """Angle between the 3D direction and the mid-ray (linebase.cc:100-107)."""
    mid2d = seg_midpoint(project_seg(seg3d, view))
    ray = view.ray_direction(mid2d)
    cosv = min(abs(float(np.dot(seg_direction(seg3d), ray))), 1.0)
    return 90.0 - math.degrees(math.acos(cosv))


def line3d_uncertainty(seg3d, view: OracleView, var2d):
    d = 0.5 * (view.projdepth(seg3d[0]) + view.projdepth(seg3d[1]))
    return view.uncertainty(d, var2d)


# --------------------------------------------------- two-view geometry


def normal_direction(seg2d, view: OracleView):
    """World-space normal of the back-projection plane
    (functions.cc:28-35)."""
    cs = view.R.T @ view.K_inv @ np.array([seg2d[0][0], seg2d[0][1], 1.0])
    ce = view.R.T @ view.K_inv @ np.array([seg2d[1][0], seg2d[1][1], 1.0])
    n = np.cross(cs, ce)
    return n / max(np.linalg.norm(n), EPS)


def fundamental_matrix(view1: OracleView, view2: OracleView):
    relR = view2.R @ view1.R.T
    relT = view2.t - relR @ view1.t
    tskew = np.array([[0, -relT[2], relT[1]],
                      [relT[2], 0, -relT[0]],
                      [-relT[1], relT[0], 0.0]])
    E = tskew @ relR
    return view2.K_inv.T @ E @ view1.K_inv


def epipolar_iou(seg1, view1, seg2, view2):
    """compute_epipolar_IoU (functions.cc:77-100)."""
    F = fundamental_matrix(view1, view2)
    coor_l2 = coords_2d(seg2)

    def intersect(p):
        ep = F @ np.array([p[0], p[1], 1.0])
        ep = ep / np.linalg.norm(ep)
        h = np.cross(coor_l2, ep)
        return h[:2] / h[2]

    c_start = intersect(seg1[0])
    c_end = intersect(seg1[1])
    d2 = seg_direction(seg2)
    length = seg_length(seg2)
    c1 = float(np.dot(c_start - seg2[0], d2)) / length
    c2 = float(np.dot(c_end - seg2[0], d2)) / length
    if c1 > c2:
        c1, c2 = c2, c1
    return (min(c2, 1.0) - max(c1, 0.0)) / (max(c2, 1.0) - min(c1, 0.0))


def algebraic_triangulation(seg1, view1, seg2, view2):
    """Ray-plane intersection triangulation (functions.cc:194-233).

    Returns (seg3d [2,3], depths (z1s, z1e), ok).
    """
    c1s = view1.ray_direction(seg1[0])
    c1e = view1.ray_direction(seg1[1])
    c2s = view2.ray_direction(seg2[0])
    c2e = view2.ray_direction(seg2[1])
    B = view2.center() - view1.center()

    def solve_one(c1):
        A = np.stack([c1, -c2s, -c2e], axis=1)
        try:
            res = np.linalg.solve(A, B)
        except np.linalg.LinAlgError:
            return None
        return c1 * res[0] + view1.center()

    ps = solve_one(c1s)
    pe = solve_one(c1e)
    if ps is None or pe is None or np.any(np.isnan(ps)) \
            or np.any(np.isnan(pe)):
        return None, None, False
    z1s, z1e = view1.projdepth(ps), view1.projdepth(pe)
    if z1s < EPS or z1e < EPS:
        return None, None, False
    if view2.projdepth(ps) < EPS or view2.projdepth(pe) < EPS:
        return None, None, False
    return np.stack([ps, pe]), (z1s, z1e), True


# ------------------------------------------------------------- distances


def dists_perp_oneway(l1, l2):
    """Endpoint perpendicular distances of l1's endpoints to inf-line(l2)
    (line_dists.h:100-111)."""
    v2 = seg_direction(l2)
    out = []
    for p in (l1[0], l1[1]):
        disp = p - l2[0]
        d2 = float(np.dot(disp, disp)) - float(np.dot(disp, v2)) ** 2
        out.append(math.sqrt(max(d2, 0.0)))
    return out

def dist_perpendicular(l1, l2):
    return max(dists_perp_oneway(l1, l2) + dists_perp_oneway(l2, l1))


def get_innerseg(l1, l2):
    """Project l1's endpoints onto l2 and keep the overlap segment
    (line_dists.h:160-180); returns None if no overlap."""
    l1_dir = seg_direction(l1)
    denom = float(np.dot(l2[1] - l2[0], l1_dir))
    t1 = float(np.dot(l1[0] - l2[0], l1_dir)) / (denom + EPS)
    t2 = float(np.dot(l1[1] - l2[0], l1_dir)) / (denom + EPS)
    if t1 > t2:
        t1, t2 = t2, t1
    if t1 >= 1.0 or t2 <= 0.0:
        return None
    s = l2[0] + (l2[1] - l2[0]) * max(t1, 0.0)
    e = l2[0] + (l2[1] - l2[0]) * min(t2, 1.0)
    return np.stack([s, e])


def dist_innerseg(l1, l2):
    a = get_innerseg(l2, l1)
    b = get_innerseg(l1, l2)
    if a is None or b is None:
        return np.inf
    return dist_perpendicular(a, b)


def compute_overlap(l1, l2):
    """Intersection ratio of l1 projected onto l2 (line_dists.h:190-200)."""
    length = seg_length(l2)
    v = seg_direction(l2)
    p1 = float(np.dot(l1[0] - l2[0], v)) / length
    p2 = float(np.dot(l1[1] - l2[0], v)) / length
    if p1 > p2:
        p1, p2 = p2, p1
    return min(p2, 1.0) - max(p1, 0.0)


def compute_bioverlap(l1, l2):
    return max(compute_overlap(l1, l2), compute_overlap(l2, l1))


def compute_angle_deg(l1, l2):
    cosv = min(abs(float(np.dot(seg_direction(l1), seg_direction(l2)))), 1.0)
    return math.degrees(math.acos(cosv))


def dist_scaleinv_oneway(l1, l2, depths1):
    """dist_endpoints_scaleinv_oneway (line_dists.cc:55-60)."""
    ds = np.linalg.norm(l1[0] - l2[0])
    de = np.linalg.norm(l1[1] - l2[1])
    return max(ds / (depths1[0] + EPS), de / (depths1[1] + EPS))


# ---------------------------------------------------------------- linker


def expscore(val, sigma):
    return math.exp(-((val / sigma) ** 2) / 2.0)


def _multiplier(score_th):
    return 1.0 / math.sqrt(-math.log(score_th) * 2.0)


@dataclasses.dataclass
class Linker2dCfg:
    """LineLinker2dConfig defaults (line_linker.h:23-46)."""
    score_th: float = 0.5
    th_angle: float = 8.0
    use_angle: bool = True
    th_overlap: float = 0.1
    use_overlap: bool = True
    th_smartoverlap: float = 0.2
    th_smartangle: float = 1.0
    use_smartangle: bool = True
    th_perp: float = 5.0
    use_perp: bool = True
    th_innerseg: float = 5.0
    use_innerseg: bool = False


@dataclasses.dataclass
class Linker3dCfg:
    """LineLinker3dConfig defaults (line_linker.h:85-111)."""
    score_th: float = 0.5
    th_angle: float = 10.0
    use_angle: bool = True
    th_overlap: float = 0.01
    use_overlap: bool = True
    th_smartoverlap: float = 0.1
    th_smartangle: float = 1.0
    use_smartangle: bool = True
    th_perp: float = 0.02
    use_perp: bool = False
    th_innerseg: float = 0.02
    use_innerseg: bool = True
    th_scaleinv: float = 0.01
    use_scaleinv: bool = False

    def shared_parent_scoring(self):
        return dataclasses.replace(self, use_angle=True, use_overlap=False,
                                   use_perp=False, use_innerseg=False,
                                   use_scaleinv=True)

    def spatial_merging(self):
        return dataclasses.replace(self, use_angle=True, use_overlap=True,
                                   use_perp=False, use_innerseg=True,
                                   use_scaleinv=False)

    def avgtest_merging(self):
        return dataclasses.replace(self, use_angle=True, use_overlap=False,
                                   use_perp=True, use_innerseg=False,
                                   use_scaleinv=False)


def _gate(score, th):
    return score if score >= th else 0.0


def linker2d_score(l1, l2, cfg: Linker2dCfg):
    """LineLinker2d::compute_score (line_linker.cc:139-162)."""
    m = _multiplier(cfg.score_th)
    score = 1.0
    if cfg.use_angle:
        score = min(score, _gate(
            expscore(compute_angle_deg(l1, l2), cfg.th_angle * m),
            cfg.score_th))
    if score < cfg.score_th:
        return score
    if cfg.use_overlap:
        score = min(score,
                    1.0 if compute_bioverlap(l1, l2) > cfg.th_overlap else 0.0)
    if score < cfg.score_th:
        return score
    if cfg.use_angle and cfg.use_overlap and cfg.use_smartangle:
        angle = compute_angle_deg(l1, l2)
        th_angle = cfg.th_angle
        overlap = compute_bioverlap(l1, l2)
        if overlap < cfg.th_smartoverlap:
            ratio = min((cfg.th_smartoverlap - overlap)
                        / (cfg.th_smartoverlap - cfg.th_overlap), 1.0)
            th_angle = cfg.th_angle - ratio * (cfg.th_angle - cfg.th_smartangle)
        score = min(score, _gate(expscore(angle, th_angle * m), cfg.score_th))
    if score < cfg.score_th:
        return score
    if cfg.use_perp:
        score = min(score, _gate(
            expscore(dist_perpendicular(l1, l2), cfg.th_perp * m),
            cfg.score_th))
    if score < cfg.score_th:
        return score
    if cfg.use_innerseg:
        d = dist_innerseg(l1, l2)
        score = min(score, _gate(
            expscore(d, cfg.th_innerseg * m) if np.isfinite(d) else 0.0,
            cfg.score_th))
    return score


def linker3d_score(l1, l2, cfg: Linker3dCfg, unc1=1.0, unc2=1.0,
                   depths1=None, depths2=None):
    """LineLinker3d::compute_score (line_linker.cc:306-332).

    unc*: per-line uncertainty; depths*: (z_start, z_end) per line
    (needed by the scaleinv term).
    """
    m = _multiplier(cfg.score_th)
    score = 1.0
    if cfg.use_angle:
        score = min(score, _gate(
            expscore(compute_angle_deg(l1, l2), cfg.th_angle * m),
            cfg.score_th))
    if score < cfg.score_th:
        return score
    if cfg.use_overlap:
        score = min(score,
                    1.0 if compute_bioverlap(l1, l2) > cfg.th_overlap else 0.0)
    if score < cfg.score_th:
        return score
    if cfg.use_angle and cfg.use_overlap and cfg.use_smartangle:
        angle = compute_angle_deg(l1, l2)
        th_angle = cfg.th_angle
        overlap = compute_bioverlap(l1, l2)
        if overlap < cfg.th_smartoverlap:
            ratio = min((cfg.th_smartoverlap - overlap)
                        / (cfg.th_smartoverlap - cfg.th_overlap), 1.0)
            th_angle = cfg.th_angle - ratio * (cfg.th_angle - cfg.th_smartangle)
        score = min(score, _gate(expscore(angle, th_angle * m), cfg.score_th))
    if score < cfg.score_th:
        return score
    unc = min(unc1, unc2)
    if cfg.use_perp:
        score = min(score, _gate(
            expscore(dist_perpendicular(l1, l2), cfg.th_perp * unc * m),
            cfg.score_th))
    if score < cfg.score_th:
        return score
    if cfg.use_innerseg:
        d = dist_innerseg(l1, l2)
        score = min(score, _gate(
            expscore(d, cfg.th_innerseg * unc * m) if np.isfinite(d) else 0.0,
            cfg.score_th))
    if score < cfg.score_th:
        return score
    if cfg.use_scaleinv:
        d = dist_scaleinv_oneway(l1, l2, depths1 if depths1 is not None
                                 else (1.0, 1.0))
        score = min(score, _gate(expscore(d, cfg.th_scaleinv * m),
                                 cfg.score_th))
    return score


# ------------------------------------------------------------ triangulator


@dataclasses.dataclass
class OracleConfig:
    """GlobalLineTriangulatorConfig defaults
    (base_line_triangulator.h:20-43, global_line_triangulator.h:11-24)."""
    min_length_2d: float = 20.0
    line_tri_angle_threshold: float = 5.0
    IoU_threshold: float = 0.1
    sensitivity_threshold: float = 70.0
    var2d: float = 2.0
    fullscore_th: float = 1.0
    max_valid_conns: int = 1000
    min_num_outer_edges: int = 1
    num_outliers_aggregator: int = 2
    linker2d: Linker2dCfg = dataclasses.field(default_factory=Linker2dCfg)
    linker3d: Linker3dCfg = dataclasses.field(default_factory=Linker3dCfg)


@dataclasses.dataclass
class OracleTrack:
    line: np.ndarray                 # [2, 3] aggregated 3D segment
    supports: List[Tuple[int, int]]  # (img_id, line_id)
    line3d_list: List[np.ndarray]
    score_list: List[float]


class OracleTriangulator:
    """Reference-semantics line triangulator (f64, per-object loops)."""

    def __init__(self, views: Dict[int, OracleView],
                 all_lines_2d: Dict[int, np.ndarray],
                 cfg: Optional[OracleConfig] = None,
                 ranges: Optional[Tuple[np.ndarray, np.ndarray]] = None):
        self.views = views
        self.lines2d = {k: np.asarray(v, np.float64)
                        for k, v in all_lines_2d.items()}
        self.cfg = cfg or OracleConfig()
        self.ranges = ranges
        # per-node containers
        self.tris: Dict[int, List[List[tuple]]] = {
            i: [[] for _ in range(len(v))] for i, v in self.lines2d.items()}
        self.tris_best: Dict[int, List[Optional[tuple]]] = {
            i: [None] * len(v) for i, v in self.lines2d.items()}
        self.valid_edges: Dict[int, List[List[Tuple[int, int]]]] = {
            i: [[] for _ in range(len(v))] for i, v in self.lines2d.items()}
        self.neighbors: Dict[int, List[int]] = {}

    # -- proposals (base_line_triangulator.cc:160-337) --

    def _propose(self, img_id, line_id, ng_img_id, ng_line_id):
        cfg = self.cfg
        l1 = self.lines2d[img_id][line_id]
        l2 = self.lines2d[ng_img_id][ng_line_id]
        if seg_length(l2) <= cfg.min_length_2d:
            return None
        view1, view2 = self.views[img_id], self.views[ng_img_id]

        # degeneracy: ray-plane angles (base_line_triangulator.cc:292-301)
        n2 = normal_direction(l2, view2)
        for p in (l1[0], l1[1]):
            ray = view1.ray_direction(p)
            ang = 90.0 - math.degrees(
                math.acos(min(abs(float(np.dot(n2, ray))), 1.0)))
            if ang < cfg.line_tri_angle_threshold:
                return None
        # weak epipolar constraint
        if epipolar_iou(l1, view1, l2, view2) < cfg.IoU_threshold:
            return None
        seg3d, depths, ok = algebraic_triangulation(l1, view1, l2, view2)
        if not ok:
            return None
        # sensitivity cull: only when BOTH views are over threshold
        # (base_line_triangulator.cc:315-317)
        if sensitivity(seg3d, view1) > cfg.sensitivity_threshold and \
                sensitivity(seg3d, view2) > cfg.sensitivity_threshold:
            return None
        if self.ranges is not None:
            lo, hi = self.ranges
            if np.any(seg3d < lo) or np.any(seg3d > hi):
                return None
        unc = min(line3d_uncertainty(seg3d, view1, cfg.var2d),
                  line3d_uncertainty(seg3d, view2, cfg.var2d))
        return (seg3d, depths, unc)

    def triangulate_image(self, img_id,
                          matches: Dict[int, np.ndarray]):
        """TriangulateImage (base_line_triangulator.cc:71-109) +
        ScoringCallback."""
        cfg = self.cfg
        self.neighbors[img_id] = list(matches.keys())
        for ng_img_id, match in matches.items():
            for line_id, ng_line_id in np.asarray(match).reshape(-1, 2):
                l1 = self.lines2d[img_id][line_id]
                if seg_length(l1) <= cfg.min_length_2d:
                    continue
                res = self._propose(img_id, line_id, ng_img_id, ng_line_id)
                if res is not None:
                    self.tris[img_id][line_id].append(
                        (res[0], res[1], res[2], (ng_img_id, ng_line_id)))
        self._score_image(img_id)

    def triangulate_image_exhaustive(self, img_id, neighbors: List[int]):
        """TriangulateImageExhaustiveMatch
        (base_line_triangulator.cc:111-136)."""
        cfg = self.cfg
        self.neighbors[img_id] = list(neighbors)
        for ng_img_id in neighbors:
            for line_id in range(len(self.lines2d[img_id])):
                l1 = self.lines2d[img_id][line_id]
                if seg_length(l1) <= cfg.min_length_2d:
                    continue
                for ng_line_id in range(len(self.lines2d[ng_img_id])):
                    res = self._propose(img_id, line_id, ng_img_id,
                                        ng_line_id)
                    if res is not None:
                        self.tris[img_id][line_id].append(
                            (res[0], res[1], res[2],
                             (ng_img_id, ng_line_id)))
        self._score_image(img_id)

    # -- scoring (global_line_triangulator.cc:71-161) --

    def _score_image(self, img_id):
        cfg = self.cfg
        linker3d = cfg.linker3d.shared_parent_scoring()
        for line_id in range(len(self.lines2d[img_id])):
            tris = self.tris[img_id][line_id]
            n = len(tris)
            scores = [0.0] * n
            for i in range(n):
                l1, depths1, unc1, _node1 = tris[i]
                score_table: Dict[int, List[float]] = {}
                for j in range(n):
                    if i == j:
                        continue
                    l2, depths2, unc2, node2 = tris[j]
                    ng_img_id, ng_line_id = node2
                    if ng_img_id == tris[i][3][0]:
                        continue
                    view2 = self.views[ng_img_id]
                    s3d = linker3d_score(l1, l2, linker3d, unc1, unc2,
                                         depths1, depths2)
                    if s3d == 0:
                        continue
                    s2d = linker2d_score(
                        project_seg(l1, view2),
                        self.lines2d[ng_img_id][ng_line_id], cfg.linker2d)
                    if s2d == 0:
                        continue
                    score_table.setdefault(ng_img_id, []).append(
                        min(s3d, s2d))
                scores[i] = sum(max(v) for v in score_table.values())

            # valid edges: top max_valid_conns with score >= fullscore_th
            order = sorted(range(n), key=lambda k: (scores[k], k),
                           reverse=True)
            for rank in range(min(n, cfg.max_valid_conns)):
                i = order[rank]
                if scores[i] < cfg.fullscore_th:
                    continue
                self.valid_edges[img_id][line_id].append(tris[i][3])
            # best tri
            best, best_score = None, -1.0
            for i in range(n):
                if scores[i] > best_score:
                    best_score = scores[i]
                    best = (tris[i][0], tris[i][1], tris[i][2], scores[i])
            self.tris_best[img_id][line_id] = best
            self.tris[img_id][line_id] = []  # cleared as in reference

    # -- degree filter (global_line_triangulator.cc:168-232) --

    def _filter_by_outer_edges(self):
        cfg = self.cfg
        flags = {i: [True] * len(v) for i, v in self.lines2d.items()}
        counters = {i: [len(self.valid_edges[i][k]) for k in range(len(v))]
                    for i, v in self.lines2d.items()}
        parents: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
        for img_id, v in self.lines2d.items():
            for line_id in range(len(v)):
                for node in self.valid_edges[img_id][line_id]:
                    parents.setdefault(node, []).append((img_id, line_id))
        queue = []
        for img_id, v in self.lines2d.items():
            for line_id in range(len(v)):
                if counters[img_id][line_id] < cfg.min_num_outer_edges:
                    flags[img_id][line_id] = False
                    queue.append((img_id, line_id))
        while queue:
            node = queue.pop(0)
            for (pi, pl) in parents.get(node, []):
                if not flags[pi][pl]:
                    continue
                counters[pi][pl] -= 1
                if counters[pi][pl] < cfg.min_num_outer_edges:
                    flags[pi][pl] = False
                    queue.append((pi, pl))
        return flags

    # -- clustering + tracks (global_line_triangulator.cc:234-351) --

    def compute_line_tracks(self) -> List[OracleTrack]:
        cfg = self.cfg
        linker3d = cfg.linker3d.spatial_merging()
        flags = self._filter_by_outer_edges()

        edges = set()
        for img_id, v in self.lines2d.items():
            for line_id in range(len(v)):
                if not flags[img_id][line_id]:
                    continue
                for node2 in self.valid_edges[img_id][line_id]:
                    if not flags[node2[0]][node2[1]]:
                        continue
                    a, b = (img_id, line_id), node2
                    if a > b:
                        a, b = b, a
                    edges.add((a, b))

        # score the undirected edges; note the reference overrides the
        # combined min() with score_3d (global_line_triangulator.cc:283)
        nodes: List[Tuple[int, int]] = []
        node_index: Dict[Tuple[int, int], int] = {}
        graph_edges = []  # (score, idx1, idx2)

        def get_node(n):
            if n not in node_index:
                node_index[n] = len(nodes)
                nodes.append(n)
            return node_index[n]

        for (n1, n2) in sorted(edges):
            b1 = self.tris_best[n1[0]][n1[1]]
            b2 = self.tris_best[n2[0]][n2[1]]
            if b1 is None or b2 is None:
                continue
            s3d = linker3d_score(b1[0], b2[0], linker3d, b1[2], b2[2],
                                 b1[1], b2[1])
            score = s3d
            if score == 0:
                continue
            graph_edges.append((score, get_node(n1), get_node(n2)))

        labels = greedy_track_labels(
            len(nodes), graph_edges, [n[0] for n in nodes])

        n_tracks = max(labels) + 1 if labels else 0
        tracks = [OracleTrack(None, [], [], []) for _ in range(n_tracks)]
        for node_id, label in enumerate(labels):
            if label < 0:
                continue
            img_id, line_id = nodes[node_id]
            b = self.tris_best[img_id][line_id]
            tracks[label].supports.append((img_id, line_id))
            tracks[label].line3d_list.append(b[0])
            tracks[label].score_list.append(b[3])
        for t in tracks:
            t.line = aggregate_line3d_list(
                t.line3d_list, t.score_list, cfg.num_outliers_aggregator)
        return tracks


def greedy_track_labels(n_nodes, edges, node_image_ids):
    """ComputeLineTrackLabelsGreedy (merging/merging.cc:18-104).

    edges: list of (score, idx1, idx2). Only tracks with >= 2 nodes get
    labels; singletons stay -1.
    """
    edges = sorted(edges, reverse=True)
    parent = [-1] * n_nodes
    images_in_track = [{node_image_ids[i]} for i in range(n_nodes)]

    def root(i):
        while parent[i] != -1:
            i = parent[i]
        return i

    for (_s, i1, i2) in edges:
        r1, r2 = root(i1), root(i2)
        if r1 == r2:
            continue
        if len(images_in_track[r1]) < len(images_in_track[r2]):
            r1, r2 = r2, r1
        parent[r2] = r1
        images_in_track[r1] |= images_in_track[r2]
        images_in_track[r2] = set()

    labels = [-1] * n_nodes
    n_tracks = 0
    for i in range(n_nodes):
        if parent[i] == -1:
            continue
        p = parent[i]
        if parent[p] == -1 and labels[p] == -1:
            labels[p] = n_tracks
            n_tracks += 1
    for i in range(n_nodes):
        if parent[i] == -1:
            continue
        labels[i] = labels[root(i)]
    return labels


def aggregate_line3d_list(lines, scores, num_outliers=2):
    """Aggregator::aggregate_line3d_list (aggregator.cc:53-103)."""
    n = len(lines)
    if n == 0:
        return None
    if n < 4:
        best = int(np.argmax(scores))
        return np.asarray(lines[best], np.float64)
    endpoints = np.concatenate([np.asarray(l, np.float64) for l in lines])
    center = endpoints.mean(axis=0)
    centered = endpoints - center
    _u, _s, vt = np.linalg.svd(centered, full_matrices=False)
    direc = vt[0] / np.linalg.norm(vt[0])
    proj = np.sort(centered @ direc)
    start = center + direc * proj[num_outliers]
    end = center + direc * proj[2 * n - 1 - num_outliers]
    return np.stack([start, end])
