"""Global point-line-VP association and joint structural refinement.

Re-designs /root/reference/src/limap/optimize/global_pl_association
(GlobalAssociator, global_associator.h:76-155): one large Ceres problem
coupling point tracks, line tracks and VP tracks through soft
association residuals.  The TPU-native scheme keeps the same residual
set but solves by *block coordinate descent with batched LM*: each
entity family (lines, points, VPs) is a batch of small independent
problems once the other families are held fixed, so every BCD sweep is
three fully-parallel lm_solve calls — no sparse global factorization.

Cameras are held constant (the pointline_association runner's setting).
Residuals:
- point reprojection / line geometric (as in hybrid BA)
- point-line association: 3D point-to-infinite-line distance, weighted
  by 2D bipartite co-occurrence counts (construct_weights_pointline)
- VP-line association: sine between line direction and VP direction
- VP orthogonality / collinearity between VP pairs
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.base.camera import CameraViewsBatch
from limap_tpu.base.infinite_line import (InfiniteLines3d,
                                          MinimalInfiniteLines3d,
                                          minimal_to_plucker)
from limap_tpu.base.lines import Segments
from limap_tpu.base.linetrack import TrackBatch
from limap_tpu.optimize import residuals as res
from limap_tpu.optimize.lm import lm_solve, retract_quat_so2
from limap_tpu.optimize.line_ba import (pack_minimal_lines, robust_weight,
                                        unpack_minimal_lines)
from limap_tpu.structures import PL_Bipartite3d, PointTrack


@dataclasses.dataclass(frozen=True)
class GlobalAssociatorConfig:
    """GlobalAssociatorConfig (global_associator.h:19-74) subset."""

    lw_point: float = 0.1
    geometric_alpha: float = 10.0
    loss: str = "cauchy"
    loss_scale: float = 0.25
    # association
    lw_pointline_association: float = 10.0
    th_pixel: float = 2.0
    th_weight_pointline: float = 3.0
    lw_vpline_association: float = 1.0
    th_count_vpline: int = 3
    lw_vp_orthogonality: float = 1.0
    th_angle_orthogonality: float = 87.0
    lw_vp_collinearity: float = 0.0
    th_angle_collinearity: float = 1.0
    # hard association output
    th_hard_pl_dist3d: float = 2.0
    th_hard_vpline_angle3d: float = 5.0
    constant_vp: bool = False
    n_bcd_rounds: int = 3
    lm_iterations: int = 10
    # junction reassociation (global_associator.h:44-45)
    th_count_lineline: int = 3
    th_angle_lineline: float = 30.0

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "GlobalAssociatorConfig":
        if d is None:
            return cls()
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


def construct_weights_pointline(all_bpt2ds, point_track_of_2d,
                                line_track_of_2d) -> Dict[Tuple[int, int],
                                                          float]:
    """Soft point-line association weights by 2D co-occurrence counting
    (global_associator.h:140-142).

    point_track_of_2d: {img_id: {point_id_2d: point_track_id}};
    line_track_of_2d: {img_id: {line_id_2d: line_track_id}}.
    """
    weights: Dict[Tuple[int, int], float] = {}
    for img_id, bpt in all_bpt2ds.items():
        pmap = point_track_of_2d.get(img_id, {})
        lmap = line_track_of_2d.get(img_id, {})
        for pid2d in bpt.get_point_ids():
            ptrack = pmap.get(pid2d, -1)
            if ptrack < 0:
                continue
            for lid2d in bpt.neighbor_lines(pid2d):
                ltrack = lmap.get(lid2d, -1)
                if ltrack < 0:
                    continue
                key = (ptrack, ltrack)
                weights[key] = weights.get(key, 0.0) + 1.0
    return weights


def _pad_assoc(pairs: Dict[Tuple[int, int], float], n_left: int,
               max_assoc: int):
    """(left, right) -> per-left padded [n_left, A] index + weight."""
    idx = np.zeros((n_left, max_assoc), np.int32)
    w = np.zeros((n_left, max_assoc), np.float32)
    fill = np.zeros(n_left, np.int32)
    for (li, ri), wt in pairs.items():
        if li < n_left and fill[li] < max_assoc:
            idx[li, fill[li]] = ri
            w[li, fill[li]] = wt
            fill[li] += 1
    return jnp.asarray(idx), jnp.asarray(w)


class GlobalAssociator:
    """BCD solver over (points, lines, vps) with association coupling."""

    def __init__(self, cfg: GlobalAssociatorConfig =
                 GlobalAssociatorConfig()):
        self.cfg = cfg
        self.pl_weights: Dict[Tuple[int, int], float] = {}
        self.vpl_weights: Dict[Tuple[int, int], float] = {}
        self.vp_dirs = np.zeros((0, 3))

    # ------------------------------------------------------------ init
    def init_imagecols(self, imagecols) -> None:
        self.imagecols = imagecols
        self.views = imagecols.batch()
        self.id2idx = imagecols.img_id_to_index()

    def init_line_tracks(self, batch: TrackBatch) -> None:
        self.line_batch = batch

    def init_point_tracks(self, point_tracks: List[PointTrack],
                          max_supports: int = 32) -> None:
        """Pack point tracks into padded arrays."""
        P = len(point_tracks)
        S = max_supports
        xyz = np.zeros((P, 3), np.float32)
        img_index = np.zeros((P, S), np.int32)
        p2d = np.zeros((P, S, 2), np.float32)
        mask = np.zeros((P, S), bool)
        for pi, tr in enumerate(point_tracks):
            xyz[pi] = tr.p
            n = min(len(tr.image_id_list), S)
            for si in range(n):
                img_index[pi, si] = self.id2idx[tr.image_id_list[si]]
                p2d[pi, si] = tr.p2d_list[si]
                mask[pi, si] = True
        self.points = jnp.asarray(xyz)
        self.pt_img_index = jnp.asarray(img_index)
        self.pt_p2d = jnp.asarray(p2d)
        self.pt_mask = jnp.asarray(mask)

    def init_vp_tracks(self, vptracks) -> None:
        self.vp_dirs = np.stack([t.direction for t in vptracks]) \
            if vptracks else np.zeros((0, 3))

    def set_pointline_weights(self, weights: Dict[Tuple[int, int], float]):
        self.pl_weights = {k: v for k, v in weights.items()
                           if v >= self.cfg.th_weight_pointline}

    def set_vpline_weights(self, weights: Dict[Tuple[int, int], float]):
        """(vp_track_id, line_track_id) -> count."""
        self.vpl_weights = {k: v for k, v in weights.items()
                            if v >= self.cfg.th_count_vpline}

    # ----------------------------------------------------------- solve
    def solve(self):
        cfg = self.cfg
        batch = self.line_batch
        T = batch.num_tracks
        P = self.points.shape[0]
        V = len(self.vp_dirs)
        A = 8  # max associations per entity

        line_params = pack_minimal_lines(
            MinimalInfiniteLines3d.from_segments(batch.line))
        points = self.points
        vps = jnp.asarray(self.vp_dirs, jnp.float32)

        # association tables
        lp_pairs = {(l, p): w for (p, l), w in self.pl_weights.items()}
        line_assoc_idx, line_assoc_w = _pad_assoc(lp_pairs, T, A)
        pl_pairs = dict(self.pl_weights)
        point_assoc_idx, point_assoc_w = _pad_assoc(pl_pairs, P, A)
        lv_pairs = {(l, v): w for (v, l), w in self.vpl_weights.items()}
        line_vp_idx, line_vp_w = _pad_assoc(lv_pairs, T, A)

        sup_views = self.views.select(batch.img_index)
        weights = res.compute_line_weights(batch.line2d) * batch.mask
        pt_views = self.views.select(self.pt_img_index)

        def line_residual(params, kvec, qvec, tvec, ps, pe, w, a_idx, a_w,
                          v_idx, v_w, pts_now, vps_now):
            line = unpack_minimal_lines(params)
            vb = CameraViewsBatch(kvec, qvec, tvec)
            r = res.line_geometric_residual(
                line.uvec[None], line.wvec[None], vb, Segments(ps, pe),
                cfg.geometric_alpha)
            r = jnp.where((w > 0)[:, None], r, 0.0)
            r2 = jax.lax.stop_gradient(jnp.sum(r * r, -1))
            rw = robust_weight(r2, cfg.loss, cfg.loss_scale)
            r = jnp.where((w > 0)[:, None],
                          r * jnp.sqrt(w * rw + 1e-12)[:, None], 0.0)
            out = [r.reshape(-1)]
            # point-line association: distance of associated points
            d, m = minimal_to_plucker(line.uvec, line.wvec)
            inf = InfiniteLines3d(d[None], m[None])
            pd = inf.point_distance(pts_now[a_idx])
            pd = jnp.where(a_w > 0, pd * jnp.sqrt(
                cfg.lw_pointline_association * a_w), 0.0)
            out.append(pd)
            # vp-line association: sine(line dir, vp dir)
            if V:
                vdir = vps_now[v_idx]
                cr = jnp.cross(jnp.broadcast_to(d[None], vdir.shape), vdir)
                sine = jnp.linalg.norm(cr, axis=-1) \
                    / (jnp.linalg.norm(vdir, axis=-1) + 1e-12)
                out.append(jnp.where(v_w > 0, sine * jnp.sqrt(
                    cfg.lw_vpline_association * v_w), 0.0))
            return jnp.concatenate(out)

        def point_residual(xyz, kvec, qvec, tvec, p2d, msk, a_idx, a_w,
                           lines_now):
            vb = CameraViewsBatch(kvec, qvec, tvec)
            r = (vb.project(xyz[None]) - p2d) * jnp.sqrt(cfg.lw_point)
            r = jnp.where(msk[:, None], r, 0.0)
            out = [r.reshape(-1)]
            mline = unpack_minimal_lines(lines_now[a_idx])
            d, m = minimal_to_plucker(mline.uvec, mline.wvec)
            inf = InfiniteLines3d(d, m)
            pd = inf.point_distance(jnp.broadcast_to(xyz, d.shape))
            out.append(jnp.where(a_w > 0, pd * jnp.sqrt(
                cfg.lw_pointline_association * a_w), 0.0))
            return jnp.concatenate(out)

        for _ in range(cfg.n_bcd_rounds):
            # ---- lines ----
            aux = (sup_views.kvec, sup_views.qvec, sup_views.tvec,
                   batch.line2d.start, batch.line2d.end, weights,
                   line_assoc_idx, line_assoc_w, line_vp_idx, line_vp_w,
                   jnp.broadcast_to(points, (T,) + points.shape),
                   jnp.broadcast_to(vps, (T,) + vps.shape))
            result = lm_solve(line_params, line_residual, retract_quat_so2,
                              4, aux, num_iterations=cfg.lm_iterations)
            line_params = result.params

            # ---- points ----
            if P:
                aux_p = (pt_views.kvec, pt_views.qvec, pt_views.tvec,
                         self.pt_p2d, self.pt_mask, point_assoc_idx,
                         point_assoc_w,
                         jnp.broadcast_to(line_params,
                                          (P,) + line_params.shape))
                res_p = lm_solve(points, point_residual,
                                 lambda p, d: p + d, 3, aux_p,
                                 num_iterations=cfg.lm_iterations)
                points = res_p.params

            # ---- vps ----
            if V and not cfg.constant_vp:
                vps = self._solve_vps(vps, line_params, line_vp_idx,
                                      line_vp_w, lv_pairs)

        self.line_params = line_params
        self.points_out = points
        self.vps_out = np.asarray(vps)
        return line_params, points, vps

    def _solve_vps(self, vps, line_params, line_vp_idx, line_vp_w,
                   lv_pairs):
        """VP update in two stages:

        1. weighted principal direction of each VP's associated lines
           (the dominant vp-line association term);
        2. a few joint Gauss-Newton steps over ALL VPs coupling the
           vp-line sine residuals with the VP-pair structural
           residuals of the reference (global_associator.cc:265-305):
           |cosine| between near-orthogonal pairs
           (VPOrthogonalityFunctor, weight 1e2 * lw_vp_orthogonality)
           and sine between near-collinear pairs
           (VPCollinearityFunctor, weight 1e2 * lw_vp_collinearity),
           with pair sets built from the current estimates at the
           configured angle thresholds; directions re-normalized after
           every step (SphereManifold<3>).
        """
        cfg = self.cfg
        V = vps.shape[0]
        lines = unpack_minimal_lines(line_params)
        d, _ = minimal_to_plucker(lines.uvec, lines.wvec)
        d_np = np.asarray(d)
        vps_np = np.array(vps)
        # stage 1: principal directions
        for v in range(V):
            members = [l for (l, vv) in lv_pairs if vv == v]
            if not members:
                continue
            ws = np.asarray([lv_pairs[(l, v)] for l in members])
            dirs = d_np[members]
            ref = vps_np[v]
            dirs = dirs * np.sign(dirs @ ref)[:, None]
            new = (dirs * ws[:, None]).sum(0)
            n = np.linalg.norm(new)
            if n > 1e-9:
                vps_np[v] = new / n

        # stage 2: joint GN with pair constraints
        pairs_orth, pairs_coll = self._vp_pairs(vps_np)
        if (len(pairs_orth) and cfg.lw_vp_orthogonality > 0) or \
                (len(pairs_coll) and cfg.lw_vp_collinearity > 0):
            vps_np = self._vp_pair_refine(vps_np, d_np, lv_pairs,
                                          pairs_orth, pairs_coll)
        return jnp.asarray(vps_np)

    def _vp_pairs(self, vps_np):
        """Pair sets at the reference thresholds
        (construct_pairs_vp_orthogonality/_collinearity,
        global_associator.cc:453+)."""
        cfg = self.cfg
        V = len(vps_np)
        orth, coll = [], []
        for i in range(V):
            for j in range(i + 1, V):
                c = abs(float(np.dot(vps_np[i], vps_np[j])))
                ang = np.degrees(np.arccos(min(c, 1.0)))
                if ang >= cfg.th_angle_orthogonality:
                    orth.append((i, j))
                if ang <= cfg.th_angle_collinearity:
                    coll.append((i, j))
        return orth, coll

    def _vp_pair_refine(self, vps_np, d_np, lv_pairs, pairs_orth,
                        pairs_coll, n_steps: int = 5):
        """Small dense GN over the stacked VP directions."""
        cfg = self.cfg
        V = len(vps_np)
        members = [[l for (l, vv) in lv_pairs if vv == v]
                   for v in range(V)]
        mem_w = [np.asarray([lv_pairs[(l, v)] for l in ms])
                 for v, ms in enumerate(members)]
        po = np.asarray(pairs_orth, np.int64).reshape(-1, 2)
        pc = np.asarray(pairs_coll, np.int64).reshape(-1, 2)
        w_orth = 10.0 * np.sqrt(max(cfg.lw_vp_orthogonality, 0.0))
        w_coll = 10.0 * np.sqrt(max(cfg.lw_vp_collinearity, 0.0))

        def residuals(x):
            out = []
            for v in range(V):
                if len(members[v]) == 0:
                    continue
                dirs = d_np[members[v]]
                cr = np.cross(np.broadcast_to(x[v], dirs.shape), dirs)
                sine = np.linalg.norm(cr, axis=-1)
                out.append(sine * np.sqrt(cfg.lw_vpline_association
                                          * mem_w[v]))
            if len(po):
                out.append(w_orth * np.abs(
                    np.sum(x[po[:, 0]] * x[po[:, 1]], axis=-1)))
            if len(pc):
                cr = np.cross(x[pc[:, 0]], x[pc[:, 1]])
                out.append(w_coll * np.linalg.norm(cr, axis=-1))
            return np.concatenate(out) if out else np.zeros(0)

        x = vps_np.astype(np.float64).copy()
        for _ in range(n_steps):
            r0 = residuals(x)
            if len(r0) == 0:
                break
            # numeric Jacobian (V*3 tiny)
            J = np.zeros((len(r0), V * 3))
            eps = 1e-6
            for k in range(V * 3):
                xp = x.copy().reshape(-1)
                xp[k] += eps
                J[:, k] = (residuals(xp.reshape(V, 3)) - r0) / eps
            A = J.T @ J + 1e-8 * np.eye(V * 3)
            delta = -np.linalg.solve(A, J.T @ r0)
            x = x + delta.reshape(V, 3)
            x = x / np.linalg.norm(x, axis=-1, keepdims=True)
        return x.astype(np.float32)

    # ----------------------------------------- junction reassociation
    def reassociate_junctions(self, all_bpt2ds, line_track_of_2d,
                              linetracks):
        """Create 3D junction point tracks where >= th_count_lineline
        2D junction points connect the same pair of (sufficiently
        non-parallel) line tracks, and associate them to both tracks
        (ReassociateJunctions, global_associator.cc:42-174).

        all_bpt2ds: {img_id: PL_Bipartite2d}; line_track_of_2d:
        {img_id: {line2d_id: track_id}}; linetracks: list of LineTrack
        (3D lines used for the junction midpoint).
        Returns (new_point_tracks, new_pl_weights) — the caller appends
        the tracks and merges the weights before solve().
        """
        cfg = self.cfg
        # count (track1, track2) -> [(img_id, point2d_id)]
        counter: Dict[Tuple[int, int], list] = {}
        for img_id, bpt in all_bpt2ds.items():
            lmap = line_track_of_2d.get(img_id, {})
            for p2d_id in bpt.get_point_ids():
                if bpt.pdegree(p2d_id) <= 1:
                    continue
                l2d_ids = [lid for lid in bpt.neighbor_lines(p2d_id)
                           if lmap.get(lid, -1) >= 0]
                for i in range(len(l2d_ids) - 1):
                    t1 = lmap[l2d_ids[i]]
                    seg1 = np.asarray(bpt.line(l2d_ids[i]), np.float64)
                    d1 = seg1[2:4] - seg1[:2]
                    d1 = d1 / (np.linalg.norm(d1) + 1e-12)
                    for j in range(i + 1, len(l2d_ids)):
                        t2 = lmap[l2d_ids[j]]
                        if t1 == t2:
                            continue
                        seg2 = np.asarray(bpt.line(l2d_ids[j]),
                                          np.float64)
                        d2 = seg2[2:4] - seg2[:2]
                        d2 = d2 / (np.linalg.norm(d2) + 1e-12)
                        cos2d = min(abs(float(d1 @ d2)), 1.0)
                        if np.degrees(np.arccos(cos2d)) \
                                < cfg.th_angle_lineline:
                            continue
                        key = (min(t1, t2), max(t1, t2))
                        counter.setdefault(key, []).append(
                            (img_id, p2d_id))

        new_tracks = []
        new_weights: Dict[Tuple[int, int], float] = {}
        base_pid = self.points.shape[0]
        for (t1, t2), obs in counter.items():
            if len(obs) < cfg.th_count_lineline:
                continue
            line1 = np.asarray(linetracks[t1].line, np.float64)
            line2 = np.asarray(linetracks[t2].line, np.float64)
            d1 = line1[1] - line1[0]
            d1 = d1 / (np.linalg.norm(d1) + 1e-12)
            d2 = line2[1] - line2[0]
            d2 = d2 / (np.linalg.norm(d2) + 1e-12)
            ip = float(d1 @ d2)
            cos3d = min(abs(ip), 1.0)
            if np.degrees(np.arccos(cos3d)) < cfg.th_angle_lineline:
                continue
            # closest-approach midpoint of the two infinite 3D lines
            # (global_associator.cc:145-153)
            A = np.array([[1.0, -ip], [-ip, 1.0]])
            b = np.array([float(d1 @ (line2[0] - line1[0])),
                          float(d2 @ (line1[0] - line2[0]))])
            st = np.linalg.solve(A, b)
            point = 0.5 * (line1[0] + st[0] * d1
                           + line2[0] + st[1] * d2)
            pid = base_pid + len(new_tracks)
            img_ids = [o[0] for o in obs]
            p2d_ids = [o[1] for o in obs]
            p2ds = [np.asarray(all_bpt2ds[i].point(p).p)
                    for (i, p) in obs]
            new_tracks.append(PointTrack(point, img_ids, p2d_ids, p2ds))
            # update the 2D bipartites' 3D assignment
            for (i, p) in obs:
                pt2d = all_bpt2ds[i].point(p)
                pt2d.point3D_id = pid
            new_weights[(pid, t1)] = float(len(obs))
            new_weights[(pid, t2)] = float(len(obs))
        return new_tracks, new_weights

    # ----------------------------------------------------------- output
    def get_output_lines(self, num_outliers: int = 2) -> TrackBatch:
        from limap_tpu.optimize.line_ba import get_output_tracks
        refined = unpack_minimal_lines(self.line_params)
        return get_output_tracks(self.line_batch, self.views, refined,
                                 num_outliers)

    def get_output_vps(self) -> np.ndarray:
        return self.vps_out

    def get_bipartite3d_pointline(self) -> PL_Bipartite3d:
        """Hard association by 3D distance (global_associator.h:103-107)."""
        bpt = PL_Bipartite3d()
        batch = self.get_output_lines()
        lines = np.stack([np.asarray(batch.line.start),
                          np.asarray(batch.line.end)], axis=1)
        pts = np.asarray(self.points_out)
        from limap_tpu.base.linetrack import batch_to_tracks
        tracks = batch_to_tracks(batch)
        for li, tr in enumerate(tracks):
            bpt.add_line(tr, li)
        seg = Segments(jnp.asarray(lines[:, 0]), jnp.asarray(lines[:, 1]))
        inf = InfiniteLines3d.from_segments(seg)
        for pi, p in enumerate(pts):
            d = np.asarray(inf.point_distance(jnp.asarray(p)[None]))
            neighbors = [int(li) for li in np.nonzero(
                d <= self.cfg.th_hard_pl_dist3d)[0]
                if (pi, li) in self.pl_weights]
            bpt.add_point(PointTrack(p), pi, neighbors)
        return bpt
