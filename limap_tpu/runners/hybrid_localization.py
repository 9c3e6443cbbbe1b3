"""Hybrid point-line visual localization pipeline.

Mirrors /root/reference/src/limap/runners/hybrid_localization.py:94 and
optimize/hybrid_localization/functions.py: per-query 2D-2D line matching
against retrieved database images (epipolar-IoU or a learned matcher),
lifting to 2D-3D via the track inverse map, reprojection filtering, then
:func:`limap_tpu.estimators.pl_estimate_absolute_pose` per query.  The
epipolar matching and reprojection filters are batched kernels over all
candidate pairs.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

import limap_tpu.runners.functions as runners
from limap_tpu.base.camera import CameraPose, CameraViewsBatch
from limap_tpu.base.functions import get_invert_idmap_from_linetracks
from limap_tpu.base.lines import Segments
from limap_tpu.estimators import pl_estimate_absolute_pose
from limap_tpu.triangulation.functions import compute_epipolar_iou
from limap_tpu.util import io as limapio


def _views_row(camera, pose, n):
    kvec = jnp.asarray(np.tile(camera.kvec(), (n, 1)), jnp.float32)
    qvec = jnp.asarray(np.tile(pose.qvec, (n, 1)), jnp.float32)
    tvec = jnp.asarray(np.tile(pose.tvec, (n, 1)), jnp.float32)
    return CameraViewsBatch(kvec, qvec, tvec)


def match_line_2to2_epipolar_iou(ref_segs, tgt_segs, ref_cam, ref_pose,
                                 tgt_cam, tgt_pose,
                                 iou_threshold: float = 0.2) -> np.ndarray:
    """All-pairs epipolar IoU matching (functions.py:6-24), one batched
    kernel over the [Nr, Nt] pair grid."""
    nr, nt = len(ref_segs), len(tgt_segs)
    if nr == 0 or nt == 0:
        return np.zeros((0, 2), np.int64)
    ref = np.asarray(ref_segs, np.float32)
    tgt = np.asarray(tgt_segs, np.float32)
    ii, jj = np.meshgrid(np.arange(nr), np.arange(nt), indexing="ij")
    l1 = Segments(jnp.asarray(ref[ii.ravel(), :2]),
                  jnp.asarray(ref[ii.ravel(), 2:4]))
    l2 = Segments(jnp.asarray(tgt[jj.ravel(), :2]),
                  jnp.asarray(tgt[jj.ravel(), 2:4]))
    v1 = _views_row(ref_cam, ref_pose, nr * nt)
    v2 = _views_row(tgt_cam, tgt_pose, nr * nt)
    iou = np.asarray(compute_epipolar_iou(l1, v1, l2, v2)).reshape(nr, nt)
    return np.argwhere(iou > iou_threshold)


def match_line_2to3(pairs_2to2: np.ndarray, line2track: Dict[int, np.ndarray],
                    tgt_img_id: int) -> List[Tuple[int, int]]:
    """Lift 2D-2D matches to (ref_line_id, track_id)
    (functions.py:54-64)."""
    track_ids = line2track[tgt_img_id]
    out = []
    for ref_line_id, tgt_line_id in np.asarray(pairs_2to2).reshape(-1, 2):
        tid = int(track_ids[int(tgt_line_id)])
        if tid != -1:
            out.append((int(ref_line_id), tid))
    return out


def reprojection_filter_matches_2to3(
        ref_segs: np.ndarray, ref_camview, all_pairs_2to3: Dict[int,
                                                                List[int]],
        linetracks, dist_thres: float = 10.0, sine_thres: float = 0.4,
        angle_scale: float = 1.0) -> List[Tuple[int, int]]:
    """Pick the best track per query line by reprojection
    (functions.py:96-147, midpoint distance + angle loss)."""
    matches = []
    for ref_line_id, track_ids in all_pairs_2to3.items():
        seg = np.asarray(ref_segs[ref_line_id], np.float64)
        mp_ref = 0.5 * (seg[:2] + seg[2:4])
        dir_ref = seg[2:4] - seg[:2]
        dir_ref = dir_ref / (np.linalg.norm(dir_ref) + 1e-12)
        best_id, min_loss = None, np.inf
        for tid in np.unique(track_ids):
            l3d = linetracks[tid].line
            p1 = ref_camview.projection(l3d[0])
            p2 = ref_camview.projection(l3d[1])
            mp = 0.5 * (p1 + p2)
            d2d = p2 - p1
            length = np.linalg.norm(d2d)
            if length < 1e-9:
                continue
            d2d = d2d / length
            dist = np.linalg.norm(mp_ref - mp)
            cos = np.clip(abs(dir_ref @ d2d), 0, 1.0)
            sine = np.sqrt(1.0 - cos * cos)
            if sine > sine_thres or dist > dist_thres:
                continue
            loss = dist + angle_scale * length * sine
            if loss < min_loss:
                min_loss, best_id = loss, int(tid)
        if best_id is not None:
            matches.append((ref_line_id, best_id))
    return matches


def _point3d_xyz(ref_sfm, pid):
    """xyz of a 3D point from a pycolmap-style Reconstruction or a plain
    {id: xyz} mapping."""
    pts = getattr(ref_sfm, "points3D", ref_sfm)
    p = pts[pid]
    return np.asarray(getattr(p, "xyz", p), np.float64)


def get_hloc_keypoints_from_log(logs, query_img_name, ref_sfm=None,
                                resize_scales=None):
    """Extract 2D-3D point correspondences from an hloc localization log
    (runners/hybrid_localization.py:74-92).

    ``logs`` is the dict hloc pickles per run: ``logs["loc"][name]`` has
    ``keypoints_query`` plus either ``3d_points`` (InLoc-style, when
    ``ref_sfm`` is None) or ``points3D_ids`` resolved against
    ``ref_sfm`` (a pycolmap Reconstruction or any {id: xyz} mapping).
    Returns (p2ds [N, 2], p3ds [N, 3], inlier_mask).
    """
    entry = logs["loc"][query_img_name]
    p2ds = np.asarray(entry["keypoints_query"], np.float64)
    if ref_sfm is None:  # inloc
        p3ds = np.asarray(entry["3d_points"], np.float64)
    else:
        p3ds = np.asarray([_point3d_xyz(ref_sfm, j)
                           for j in entry["points3D_ids"]], np.float64)
    inliers = np.asarray(entry["PnP_ret"]["inlier_mask"])
    if resize_scales is not None and query_img_name in resize_scales:
        scale = resize_scales[query_img_name]
        p2ds = (p2ds + 0.5) * scale - 0.5
    return p2ds, p3ds, inliers


def hybrid_localization(cfg: dict, imagecols_db, imagecols_query,
                        point_corresp: Dict[int, Tuple[np.ndarray,
                                                       np.ndarray]],
                        linemap_db, retrieval: Dict[int, List[int]],
                        results_path: Optional[str] = None,
                        logger=None) -> Dict[int, CameraPose]:
    """Localize every query image with points + lines.

    Args:
      cfg: localization config (see cfgs/localization/default.yaml).
      imagecols_db / imagecols_query: database / query collections (query
        poses used only as coarse priors for epipolar matching).
      point_corresp: {query_img_id: (p3ds [N,3], p2ds [N,2])}.
      linemap_db: list of LineTrack from the db reconstruction.
      retrieval: {query_img_id: [db_img_id, ...]} visual neighbors.
      results_path: optional txt output (name qw qx qy qz tx ty tz).
    """
    cfg = runners.setup(cfg)
    loc_cfg = cfg.get("localization", {})

    # [1] detect 2D lines on db + queries
    all_db_segs, _ = runners.compute_2d_segs(cfg, imagecols_db,
                                             compute_descinfo=False)
    all_query_segs, _ = runners.compute_2d_segs(cfg, imagecols_query,
                                                compute_descinfo=False)

    # [2] inverse map: per-db-image line -> track id
    line2track = get_invert_idmap_from_linetracks(all_db_segs, linemap_db)

    iou_th = loc_cfg.get("epipolar_filter", {}).get("IoU_threshold", 0.2) \
        if isinstance(loc_cfg.get("epipolar_filter"), dict) \
        else loc_cfg.get("IoU_threshold", 0.2)

    # optional learned 2D-2D matcher (reference hybrid_localization.py
    # :191-244: cfg["localization"]["2d_matcher"] in ["epipolar",
    # "nn_endpoints", "superglue_endpoints", ...])
    matcher_name = loc_cfg.get("2d_matcher", "epipolar")
    matcher = None
    db_descinfos = {}
    query_descinfos = {}
    if matcher_name != "epipolar":
        from limap_tpu.line2d import get_extractor, get_matcher
        default_extractor = ("superpoint_endpoints"
                             if matcher_name == "superglue_endpoints"
                             else "patch_endpoints")
        extractor = get_extractor(
            loc_cfg.get("extractor", {"method": default_extractor}),
            weight_path=cfg.get("weight_path"))
        matcher = get_matcher(
            {"method": matcher_name,
             **loc_cfg.get("matcher_options", {})}, extractor,
            weight_path=cfg.get("weight_path"))
        for ic, segs_map, out in (
                (imagecols_db, all_db_segs, db_descinfos),
                (imagecols_query, all_query_segs, query_descinfos)):
            for img_id in ic.get_img_ids():
                out[img_id] = extractor.extract(
                    ic.camview(img_id), segs_map[img_id])

    poses = {}
    for q_id in imagecols_query.get_img_ids():
        q_cam = imagecols_query.camview(q_id).cam
        q_pose = imagecols_query.campose(q_id)
        q_segs = all_query_segs[q_id]

        # [3] 2D-2D matching vs retrieved neighbors (learned matcher or
        # epipolar IoU)
        pairs_2to3: Dict[int, List[int]] = {}
        for db_id in retrieval.get(q_id, []):
            db_segs = all_db_segs.get(db_id)
            if db_segs is None or len(db_segs) == 0 or len(q_segs) == 0:
                continue
            if matcher is not None:
                p22 = np.asarray(matcher.match_pair(
                    query_descinfos[q_id],
                    db_descinfos[db_id])).reshape(-1, 2)
            else:
                p22 = match_line_2to2_epipolar_iou(
                    q_segs, db_segs, q_cam, q_pose,
                    imagecols_db.camview(db_id).cam,
                    imagecols_db.campose(db_id), iou_th)
            for rid, tid in match_line_2to3(p22, line2track, db_id):
                pairs_2to3.setdefault(rid, []).append(tid)

        # [4] reprojection filter to unique 2D-3D line matches
        matches = reprojection_filter_matches_2to3(
            q_segs, imagecols_query.camview(q_id), pairs_2to3, linemap_db,
            dist_thres=loc_cfg.get("reprojection_filter_dist", 10.0))
        l3d_ids = [tid for (_, tid) in matches]
        l2ds = np.asarray([np.asarray(q_segs[rid][:4]).reshape(2, 2)
                           for (rid, _) in matches]).reshape(-1, 2, 2)
        l3ds = np.asarray([t.line for t in linemap_db]).reshape(-1, 2, 3)

        # [5] PnPL
        p3ds, p2ds = point_corresp.get(q_id, (np.zeros((0, 3)),
                                              np.zeros((0, 2))))
        pose, _ = pl_estimate_absolute_pose(
            cfg.get("estimation", cfg), l3ds, l3d_ids, l2ds, p3ds, p2ds,
            q_cam, campose=q_pose if q_pose.initialized else None)
        poses[q_id] = pose

    if results_path is not None:
        limapio.check_directory(results_path)
        with open(results_path, "w") as f:
            for q_id, pose in poses.items():
                name = imagecols_query.image_name(q_id)
                q = pose.qvec
                t = pose.tvec
                f.write(f"{name} {q[0]} {q[1]} {q[2]} {q[3]} "
                        f"{t[0]} {t[1]} {t[2]}\n")
    return poses
