"""Fit&Merge pipeline: depth-assisted line mapping.

Mirrors /root/reference/src/limap/runners/line_fitnmerge.py:133-312:
[A] metainfos -> [B] 2D detection -> [C] depth fitting -> [D] merging ->
filters/remerge -> [E] optional BA -> [F] save.  Stages [C]/[D]/[E] run
as batched kernels over all segments/tracks at once.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import limap_tpu.runners.functions as runners
from limap_tpu.base import CameraViewsBatch, LineLinker, Segments
from limap_tpu.base.line_linker import LineLinker3dConfig
from limap_tpu.base.linetrack import LineTrack, batch_to_tracks, \
    tracks_to_batch
from limap_tpu.fitting import estimate_segs3d_from_depth
from limap_tpu.merging import (filter_tracks_by_reprojection,
                               merge_to_linetracks, remerge,
                               set_uncertainty_segs3d)
from limap_tpu.optimize import (LineBAConfig, get_output_tracks,
                                solve_line_bundle_adjustment)
from limap_tpu.util import io as limapio

DEFAULT_VAR2D = {"lsd": 2.0, "tpu_lsd": 2.0, "sold2": 5.0, "hawpv3": 5.0,
                 "tp_lsd": 5.0, "deeplsd": 4.0}


def fit_3d_segs(all_2d_segs: Dict[int, np.ndarray], imagecols, depths,
                fitting_config: dict, seed: int = 0):
    """Fit 3D segments for every image (line_fitnmerge.py:17-70), with
    the per-image batched RANSAC kernel.

    depths: {img_id: BaseDepthReader}.
    Returns {img_id: (N, 2, 3) array} (zero rows = failures).
    """
    out = {}
    key = jax.random.PRNGKey(seed)
    batch = imagecols.batch()
    id2idx = imagecols.img_id_to_index()
    for img_id in imagecols.get_img_ids():
        segs = np.asarray(all_2d_segs[img_id], np.float32)
        view = imagecols.camview(img_id)
        if len(segs) == 0:
            out[img_id] = np.zeros((0, 2, 3), np.float32)
            continue
        depth = depths[img_id].read_depth(img_hw=[view.h(), view.w()])
        vb = batch.select(id2idx[img_id])
        key, sub = jax.random.split(key)
        seg2d = Segments(jnp.asarray(segs[:, :2]), jnp.asarray(segs[:, 2:4]))
        fitted = estimate_segs3d_from_depth(
            seg2d, jnp.asarray(depth, jnp.float32), vb, sub,
            ransac_th=fitting_config.get("ransac_th", 0.75),
            min_percentage_inliers=fitting_config.get(
                "min_percentage_inliers", 0.9),
            var2d=fitting_config.get("var2d", 2.0))
        ok = np.asarray(fitted.score) > 0
        arr = np.stack([np.asarray(fitted.start), np.asarray(fitted.end)],
                       axis=1)
        arr[~ok] = 0.0
        out[img_id] = arr
    return out


def _pad_per_image(all_2d_segs, seg3d_list, img_ids):
    L = max((len(all_2d_segs[i]) for i in img_ids), default=1)
    L = max(L, 1)
    I = len(img_ids)
    l2d = np.zeros((I, L, 4), np.float32)
    l3d = np.zeros((I, L, 2, 3), np.float32)
    mask = np.zeros((I, L), bool)
    for row, img_id in enumerate(img_ids):
        segs = np.asarray(all_2d_segs[img_id], np.float32)
        n = len(segs)
        if n:
            l2d[row, :n] = segs[:, :4]
            l3d[row, :n] = seg3d_list[img_id][:n]
            lengths = np.linalg.norm(l3d[row, :n, 1] - l3d[row, :n, 0],
                                     axis=-1)
            mask[row, :n] = lengths > 0
    return l2d, l3d, mask


def line_fitnmerge(cfg: dict, imagecols, depths,
                   neighbors: Optional[dict] = None,
                   ranges=None) -> List[LineTrack]:
    """Main interface (line_fitnmerge.py:133)."""
    cfg = runners.setup(cfg)
    from limap_tpu.util.profiler import StageProfiler
    prof = StageProfiler()
    detector = cfg["line2d"]["detector"]["method"]
    if cfg["fitting"].get("var2d", -1) == -1:
        cfg["fitting"]["var2d"] = DEFAULT_VAR2D.get(detector, 2.0)
    if cfg["merging"].get("var2d", -1) == -1:
        cfg["merging"]["var2d"] = DEFAULT_VAR2D.get(detector, 2.0)
    if cfg.get("max_image_dim", -1) not in (-1, None):
        imagecols.set_max_image_dim(cfg["max_image_dim"])

    # [A] metainfos
    if neighbors is None:
        _, neighbors, ranges = runners.compute_sfminfos(cfg, imagecols)
    else:
        neighbors = imagecols.update_neighbors(neighbors)
        for img_id in neighbors:
            neighbors[img_id] = neighbors[img_id][:cfg["n_neighbors"]]

    # [B] 2D segments
    with prof.stage("detect"):
        all_2d_segs, _ = runners.compute_2d_segs(cfg, imagecols,
                                                 compute_descinfo=False)

    # [C] fit 3D segments from depth
    fname_fit = "fitted_3d_segs.npy"
    if not cfg.get("load_fit", False):
        with prof.stage("fit_3d_segs"):
            seg3d_list = fit_3d_segs(all_2d_segs, imagecols, depths,
                                     cfg["fitting"])
        limapio.save_npy(os.path.join(cfg["dir_save"], fname_fit), seg3d_list)
    else:
        seg3d_list = limapio.read_npy(
            os.path.join(cfg["dir_load"], fname_fit)).item()

    # [D] merge into tracks
    img_ids = imagecols.get_img_ids()
    id2row = {img_id: i for i, img_id in enumerate(img_ids)}
    l2d, l3d, mask = _pad_per_image(all_2d_segs, seg3d_list, img_ids)
    views = imagecols.batch()
    K = max(len(neighbors[i]) for i in img_ids) if img_ids else 1
    nbrs = np.zeros((len(img_ids), max(K, 1)), np.int64)
    nmask = np.zeros_like(nbrs, bool)
    for row, img_id in enumerate(img_ids):
        for k, ng in enumerate(neighbors[img_id][:K]):
            nbrs[row, k] = id2row[ng]
            nmask[row, k] = True

    linker = LineLinker.from_dicts(cfg["merging"].get("linker2d"),
                                   cfg["merging"].get("linker3d"))
    seg3d = Segments(jnp.asarray(l3d[:, :, 0]), jnp.asarray(l3d[:, :, 1]))
    vb = CameraViewsBatch(views.kvec[:, None], views.qvec[:, None],
                          views.tvec[:, None])
    seg3d = set_uncertainty_segs3d(seg3d, vb, cfg["merging"]["var2d"])
    seg2d = Segments(jnp.asarray(l2d[..., :2]), jnp.asarray(l2d[..., 2:4]))

    with prof.stage("merge_to_tracks"):
        linetracks = merge_to_linetracks(
            seg2d, seg3d, jnp.asarray(mask), views, jnp.asarray(nbrs),
            jnp.asarray(nmask), linker, image_ids=np.asarray(img_ids))

    # filters + remerge fixpoint (line_fitnmerge.py:237-255)
    def filter_reproj(tracks):
        if not tracks:
            return tracks
        tb = tracks_to_batch(tracks, id2row)
        tb = filter_tracks_by_reprojection(
            tb, views, cfg["filtering2d"]["th_angular_2d"],
            cfg["filtering2d"]["th_perp_2d"], num_outliers=0)
        kept = batch_to_tracks(tb)
        return [t for t in kept if t.count_lines() > 0]

    linetracks = filter_reproj(linetracks)
    if not cfg["remerging"].get("disable", False) and linetracks:
        linker3d = LineLinker3dConfig.from_dict(
            cfg["remerging"].get("linker3d"))
        linetracks = remerge(linetracks, views, id2row, linker3d,
                             num_outliers=0)
        linetracks = filter_reproj(linetracks)

    # [E] optional BA
    if not cfg["refinement"].get("disable", True) and linetracks:
        tb = tracks_to_batch(linetracks, id2row)
        ba_cfg = LineBAConfig.from_dict(cfg["refinement"])
        refined, _ = solve_line_bundle_adjustment(tb, views, ba_cfg)
        tb = get_output_tracks(tb, views, refined,
                               ba_cfg.num_outliers_aggregator)
        linetracks = batch_to_tracks(tb)

    linetracks = [t for t in linetracks if t.length() > 0]

    # structured metrics (mirrors line_triangulation)
    from limap_tpu.evaluation.evaluator import report_track_stats
    import json as _json
    with open(os.path.join(cfg["dir_save"],
                           "fitnmerge_metrics.json"), "w") as f:
        _json.dump({"stages_s": prof.report(),
                    "tracks": report_track_stats(
                        linetracks, cfg["n_visible_views"])}, f,
                   indent=1)

    # [F] save
    output_folder = cfg.get("output_folder") or "fitnmerge_finaltracks"
    limapio.save_folder_linetracks_with_info(
        os.path.join(cfg["dir_save"], output_folder), linetracks,
        config=cfg, imagecols=imagecols, all_2d_segs=all_2d_segs)
    limapio.save_txt_linetracks(
        os.path.join(cfg["dir_save"], "fitnmerge_alltracks.txt"),
        linetracks, n_visible_views=4)
    limapio.save_obj(
        os.path.join(cfg["dir_save"],
                     f"fitnmerge_lines_nv{cfg['n_visible_views']}.obj"),
        np.stack([t.line for t in linetracks
                  if t.count_images() >= cfg["n_visible_views"]])
        if any(t.count_images() >= cfg["n_visible_views"]
               for t in linetracks) else np.zeros((0, 2, 3)))
    return linetracks


def fit_3d_segs_with_points3d(all_2d_segs, imagecols, p3d_readers,
                              fitting_config: dict, seed: int = 0):
    """Fit 3D segments from dense per-pixel 3D point maps
    (line_fitnmerge.py:73-130 in the reference, InLoc-style).

    p3d_readers: {img_id: reader} where read() -> [H, W, 3] point map.
    """
    from limap_tpu.fitting import estimate_segs3d_from_points3d
    out = {}
    key = jax.random.PRNGKey(seed)
    batch = imagecols.batch()
    id2idx = imagecols.img_id_to_index()
    for img_id in imagecols.get_img_ids():
        segs = np.asarray(all_2d_segs[img_id], np.float32)
        view = imagecols.camview(img_id)
        if len(segs) == 0:
            out[img_id] = np.zeros((0, 2, 3), np.float32)
            continue
        p3d_map = np.asarray(p3d_readers[img_id].read(None), np.float32)
        key, sub = jax.random.split(key)
        seg2d = Segments(jnp.asarray(segs[:, :2]), jnp.asarray(segs[:, 2:4]))
        fitted = estimate_segs3d_from_points3d(
            seg2d, jnp.asarray(p3d_map), batch.select(id2idx[img_id]), sub,
            (view.h(), view.w()),
            ransac_th=fitting_config.get("ransac_th", 0.75),
            min_percentage_inliers=fitting_config.get(
                "min_percentage_inliers", 0.9),
            var2d=fitting_config.get("var2d", 2.0))
        ok = np.asarray(fitted.score) > 0
        arr = np.stack([np.asarray(fitted.start), np.asarray(fitted.end)],
                       axis=1)
        arr[~ok] = 0.0
        out[img_id] = arr
    return out


def line_fitting_with_points3d(cfg: dict, imagecols, p3d_readers,
                               neighbors=None, ranges=None):
    """Fit&merge pipeline over per-pixel 3D point maps
    (line_fitnmerge.py:316 in the reference): identical to
    line_fitnmerge except stage [C] fits against point maps."""
    cfg = runners.setup(cfg)
    from limap_tpu.util.profiler import StageProfiler
    prof = StageProfiler()
    detector = cfg["line2d"]["detector"]["method"]
    if cfg["fitting"].get("var2d", -1) == -1:
        cfg["fitting"]["var2d"] = DEFAULT_VAR2D.get(detector, 2.0)
    all_2d_segs, _ = runners.compute_2d_segs(cfg, imagecols,
                                             compute_descinfo=False)
    seg3d_list = fit_3d_segs_with_points3d(all_2d_segs, imagecols,
                                           p3d_readers, cfg["fitting"])
    # delegate to the shared merge/filter/save stages by substituting
    # the fitted segments through the load_fit mechanism
    fname_fit = "fitted_3d_segs.npy"
    limapio.save_npy(os.path.join(cfg["dir_save"], fname_fit), seg3d_list)
    cfg = dict(cfg)
    cfg["load_fit"] = True
    cfg["load_dir"] = cfg["dir_save"]
    cfg["load_det"] = True
    return line_fitnmerge(cfg, imagecols, depths=None, neighbors=neighbors,
                          ranges=ranges)
