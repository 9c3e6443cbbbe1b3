"""RGB-only line triangulation pipeline (the flagship runner).

Mirrors /root/reference/src/limap/runners/line_triangulation.py:18-271:
[A] metainfos -> [B] detection+description -> [C] matching ->
[D] multi-view triangulation -> filters/remerge -> [E] BA -> [F] save.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

import limap_tpu.runners.functions as runners
from limap_tpu.base.line_linker import LineLinker3dConfig
from limap_tpu.base.linetrack import HostTrackBatch, LineTrack, \
    batch_to_tracks, tracks_to_batch
from limap_tpu.merging import compact_track_batch, filter_chain_batch
from limap_tpu.optimize import (LineBAConfig, get_output_tracks,
                                solve_line_bundle_adjustment)
from limap_tpu.triangulation.triangulator import (GlobalLineTriangulator,
                                                  TriangulatorConfig)
from limap_tpu.util import io as limapio
from limap_tpu.util.profiler import StageProfiler

DEFAULT_VAR2D = {"lsd": 2.0, "tpu_lsd": 2.0, "sold2": 5.0, "hawpv3": 5.0,
                 "tp_lsd": 5.0, "deeplsd": 4.0}


def line_triangulation(cfg: dict, imagecols, neighbors: Optional[dict] = None,
                       ranges=None, points3d: Optional[dict] = None
                       ) -> List[LineTrack]:
    """Main interface of multi-view line triangulation."""
    cfg = runners.setup(cfg)
    prof = StageProfiler()
    detector = cfg["line2d"]["detector"]["method"]
    if cfg["triangulation"].get("var2d", -1) == -1:
        cfg["triangulation"]["var2d"] = DEFAULT_VAR2D.get(detector, 2.0)
    if not imagecols.IsUndistorted():
        imagecols = runners.undistort_images(
            imagecols,
            os.path.join(cfg["dir_save"],
                         cfg.get("undistortion_output_dir",
                                 "undistorted_images")),
            skip_exists=cfg.get("load_undistort", False)
            or cfg.get("skip_exists", False))
    if cfg.get("max_image_dim", -1) not in (-1, None):
        imagecols.set_max_image_dim(cfg["max_image_dim"])
    limapio.save_npy(os.path.join(cfg["dir_save"], "imagecols.npy"),
                     imagecols.as_dict())

    # [A] metainfos
    if neighbors is None:
        _, neighbors, ranges = runners.compute_sfminfos(cfg, imagecols,
                                                        points3d)
    else:
        neighbors = imagecols.update_neighbors(neighbors)
        for img_id in neighbors:
            neighbors[img_id] = neighbors[img_id][:cfg["n_neighbors"]]
        limapio.save_txt_metainfos(
            os.path.join(cfg["dir_save"], "metainfos.txt"), neighbors,
            ranges if ranges is not None
            else runners.compute_pose_ranges(imagecols))

    # [B] 2D segments (+ descriptors unless exhaustive matching)
    use_exhaustive = cfg["triangulation"].get("use_exhaustive_matcher", False)
    with prof.stage("detect_describe"):
        all_2d_segs, descinfo_folder = runners.compute_2d_segs(
            cfg, imagecols, compute_descinfo=not use_exhaustive)

    # [C] matches
    if not use_exhaustive:
        with prof.stage("match"):
            matches_dir = runners.compute_matches(
                cfg, descinfo_folder, imagecols.get_img_ids(), neighbors)

    # [D] triangulation
    tri_cfg = TriangulatorConfig.from_dict(cfg["triangulation"])
    triangulator = GlobalLineTriangulator(tri_cfg)
    triangulator.init(all_2d_segs, imagecols)
    triangulator.set_ranges(ranges)
    if cfg["triangulation"].get("use_vp", False):
        from limap_tpu.vplib import get_vp_detector
        vpdet = get_vp_detector(cfg["triangulation"].get(
            "vpdet_config", {"method": "jlinkage"}))
        vpresults = vpdet.detect_vp_all_images(
            all_2d_segs, imagecols.get_map_camviews())
        triangulator.init_vp_results(vpresults)

    with prof.stage("triangulate_score"):
        if use_exhaustive:
            for img_id in imagecols.get_img_ids():
                triangulator.triangulate_image_exhaustive(
                    img_id, neighbors[img_id])
        else:
            matches_by_image = {
                img_id: np.load(
                    os.path.join(matches_dir, f"matches_{img_id}.npy"),
                    allow_pickle=True).item()
                for img_id in imagecols.get_img_ids()}
            # batched fast path: G independent images per device call
            triangulator.triangulate_all(matches_by_image)
    with prof.stage("track_build"):
        tb, tb_host = triangulator.compute_track_batch(return_host=True)

    # filters (line_triangulation.py:171-200) — batch-resident: the
    # whole reproj -> remerge -> reproj -> sensitivity -> overlap tail
    # runs on the device TrackBatch (equivalence with the LineTrack
    # list chain asserted in tests/test_batch_chain.py)
    id2row = imagecols.img_id_to_index()
    views = imagecols.batch()
    f2d = cfg["triangulation"]["filtering2d"]

    prof.times.setdefault("filters_remerge", 0.0)
    import time as _time
    _t0 = _time.perf_counter()
    if tb is not None:
        linker3d = None
        if not cfg["triangulation"]["remerging"].get("disable", False):
            linker3d = LineLinker3dConfig.from_dict(
                cfg["triangulation"]["remerging"].get("linker3d"))
        tb, tb_host = filter_chain_batch(tb, views, f2d, linker3d,
                                         host=tb_host)
        # drop dead tracks/supports before BA (smaller static shapes)
        tb, tb_host = compact_track_batch(
            tb_host.refresh(tb, with_line=True), return_host=True)
        if not int(np.asarray(tb.track_mask).sum()):
            tb = None
    prof.times["filters_remerge"] += _time.perf_counter() - _t0

    # [E] geometric refinement
    if not cfg["refinement"].get("disable", False) and tb is not None:
        with prof.stage("bundle_adjustment"):
            ba_cfg = LineBAConfig.from_dict(cfg["refinement"])
            refined, _ = solve_line_bundle_adjustment(tb, views, ba_cfg)
            tb = get_output_tracks(tb, views, refined,
                                   ba_cfg.num_outliers_aggregator)
    linetracks = [t for t in batch_to_tracks(tb, host=tb_host)
                  if t.count_lines() > 0] if tb is not None else []

    # [F] save
    limapio.save_txt_linetracks(
        os.path.join(cfg["dir_save"], "alltracks.txt"), linetracks,
        n_visible_views=4)
    limapio.save_folder_linetracks_with_info(
        os.path.join(cfg["dir_save"], cfg.get("output_folder",
                                              "finaltracks")),
        linetracks, config=cfg, imagecols=imagecols,
        all_2d_segs=all_2d_segs)
    # structured metrics: stage wall-clock + track-quality stats
    # (the reference prints tqdm progress only, SURVEY §5)
    from limap_tpu.evaluation.evaluator import report_track_stats
    metrics = {"stages_s": prof.report(),
               "tracks": report_track_stats(
                   linetracks, cfg["n_visible_views"]),
               "overflow_edges": int(getattr(triangulator,
                                             "overflow_edges", 0))}
    import json as _json
    with open(os.path.join(cfg["dir_save"], "metrics.json"), "w") as f:
        _json.dump(metrics, f, indent=1)

    valid = [t.line for t in linetracks
             if t.count_images() >= cfg["n_visible_views"]]
    limapio.save_obj(
        os.path.join(
            cfg["dir_save"],
            f"triangulated_lines_nv{cfg['n_visible_views']}.obj"),
        np.stack(valid) if valid else np.zeros((0, 2, 3)))
    return linetracks
