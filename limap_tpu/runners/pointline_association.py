"""Point-line(-VP) association runner.

Mirrors /root/reference/runners/pointline_association.py:49-173: resume
from a saved line map, build 2D bipartites from the SfM points, cluster
VP tracks, run the global associator (iterating VP-track merging to a
fixpoint), and save the jointly refined tracks.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

import limap_tpu.runners.functions as runners
from limap_tpu.base.functions import get_invert_idmap_from_linetracks
from limap_tpu.base.linetrack import batch_to_tracks, tracks_to_batch
from limap_tpu.optimize.global_pl_association import (
    GlobalAssociator, GlobalAssociatorConfig, construct_weights_pointline)
from limap_tpu.structures import (PL_Bipartite2dConfig, PointTrack,
                                  compute_2d_bipartites_from_points)
from limap_tpu.util import io as limapio
from limap_tpu.vplib import (GlobalVPTrackConstructor, get_vp_detector,
                             merge_vptracks_by_direction)


def pointline_association(cfg: dict, imagecols, linetracks,
                          all_2d_segs: Dict[int, np.ndarray],
                          points3d: Dict[int, dict],
                          points2d: Dict[int, np.ndarray],
                          use_vp: bool = True):
    """Jointly refine points + lines (+ VPs).

    Args:
      cfg: config with "structures"/"global_pl_association" sections.
      imagecols: scene cameras.
      linetracks: line map (e.g. loaded from finaltracks).
      all_2d_segs: per-image detections.
      points3d: {pid: {xyz, image_ids}}; points2d: {img_id: (P,3) x,y,pid}.
    Returns (new_linetracks, refined_points, vps).
    """
    cfg = runners.setup(cfg)
    id2idx = imagecols.img_id_to_index()

    # [1] 2D bipartites from SfM points (runners/functions_structures.py:81)
    bpt_cfg = PL_Bipartite2dConfig.from_dict(
        cfg.get("structures", {}).get("bpt2d"))
    all_bpt2ds, sfm_points = compute_2d_bipartites_from_points(
        points3d, points2d, all_2d_segs, bpt_cfg)

    # [2] point tracks from points3d + 2D observations
    point_tracks = []
    pid_to_idx = {}
    for pid, rec in points3d.items():
        tr = PointTrack(np.asarray(rec["xyz"]))
        for img_id in rec["image_ids"]:
            if img_id not in id2idx:
                continue
            tr.image_id_list.append(img_id)
            tr.p2d_list.append(np.zeros(2))
        pid_to_idx[int(pid)] = len(point_tracks)
        point_tracks.append(tr)
    # fill 2D observations from points2d
    for img_id, arr in points2d.items():
        for x, y, pid in np.asarray(arr):
            idx = pid_to_idx.get(int(pid))
            if idx is None:
                continue
            tr = point_tracks[idx]
            for k, im in enumerate(tr.image_id_list):
                if im == img_id and not tr.p2d_list[k].any():
                    tr.p2d_list[k] = np.array([x, y])
                    break

    # [3] optional VP tracks
    vptracks = []
    vpresults = None
    if use_vp:
        vpdet = get_vp_detector(cfg.get("vpdet_config",
                                        {"method": "jlinkage"}))
        vpresults = vpdet.detect_vp_all_images(all_2d_segs)
        constructor = GlobalVPTrackConstructor()
        constructor.Init(vpresults)
        vptracks = constructor.cluster_line_tracks(linetracks, imagecols)

    # [4] association weights from bipartite co-occurrence
    line2track = get_invert_idmap_from_linetracks(all_2d_segs, linetracks)
    point_track_of_2d = {}
    for img_id, bpt in all_bpt2ds.items():
        m = {}
        for pid2d in bpt.get_point_ids():
            p3id = bpt.point(pid2d).point3D_id
            m[pid2d] = pid_to_idx.get(int(p3id), -1)
        point_track_of_2d[img_id] = m
    line_track_of_2d = {img_id: {i: int(t) for i, t in enumerate(arr)}
                        for img_id, arr in line2track.items()}
    pl_weights = construct_weights_pointline(all_bpt2ds, point_track_of_2d,
                                             line_track_of_2d)

    vpl_weights = {}
    if vpresults is not None:
        for v_id, track in enumerate(vptracks):
            vp_nodes = set(track.supports)
            for lt_id, ltrack in enumerate(linetracks):
                cnt = 0
                for img_id, line_id in zip(ltrack.image_id_list,
                                           ltrack.line_id_list):
                    resu = vpresults.get(img_id)
                    if resu is None or line_id >= resu.count_lines():
                        continue
                    if resu.HasVP(line_id) and \
                            (img_id, resu.GetVPLabel(line_id)) in vp_nodes:
                        cnt += 1
                if cnt:
                    vpl_weights[(v_id, lt_id)] = cnt

    # [5] global association with VP-merge fixpoint
    # (pointline_association.py:112-136)
    assoc_cfg = GlobalAssociatorConfig.from_dict(
        cfg.get("global_pl_association"))
    n_vps = len(vptracks)
    for _ in range(5):
        assoc = GlobalAssociator(assoc_cfg)
        assoc.init_imagecols(imagecols)
        assoc.init_line_tracks(tracks_to_batch(linetracks, id2idx))
        assoc.init_point_tracks(point_tracks)
        assoc.init_vp_tracks(vptracks)
        assoc.set_pointline_weights(pl_weights)
        assoc.set_vpline_weights(vpl_weights)
        assoc.solve()
        if vptracks:
            for v_id, t in enumerate(vptracks):
                t.direction = assoc.get_output_vps()[v_id]
            vptracks = merge_vptracks_by_direction(vptracks)
            if len(vptracks) == n_vps:
                break
            n_vps = len(vptracks)
            # remap vp-line weights after merge: recompute indices
            vpl_weights = {}
            for v_id, track in enumerate(vptracks):
                vp_nodes = set(track.supports)
                for lt_id, ltrack in enumerate(linetracks):
                    cnt = sum(
                        1 for img_id, line_id in zip(ltrack.image_id_list,
                                                     ltrack.line_id_list)
                        if vpresults.get(img_id) is not None
                        and line_id < vpresults[img_id].count_lines()
                        and vpresults[img_id].HasVP(line_id)
                        and (img_id, vpresults[img_id].GetVPLabel(line_id))
                        in vp_nodes)
                    if cnt:
                        vpl_weights[(v_id, lt_id)] = cnt
        else:
            break

    new_batch = assoc.get_output_lines()
    new_tracks = batch_to_tracks(new_batch)
    refined_points = np.asarray(assoc.points_out)

    out_dir = os.path.join(cfg["dir_save"],
                           cfg.get("output_folder", "associated_tracks"))
    limapio.save_folder_linetracks_with_info(
        out_dir, new_tracks, config=cfg, imagecols=imagecols,
        all_2d_segs=all_2d_segs)
    return new_tracks, refined_points, assoc.get_output_vps()
