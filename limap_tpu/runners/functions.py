"""Shared pipeline stages (setup, detection, matching, sfm metainfos).

Mirrors /root/reference/src/limap/runners/functions.py with the same
``skip_exists`` stage-idempotence semantics; heavy per-image compute is
dispatched to the batched line2d kernels.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

import limap_tpu.line2d
from limap_tpu.pointsfm import SfmModel, compute_metainfos
from limap_tpu.util import io as limapio


def setup(cfg: dict) -> dict:
    """Resolve output/load dirs (runners/functions.py:11-28)."""
    folder_save = cfg.get("output_dir") or "tmp"
    limapio.check_makedirs(folder_save)
    folder_load = cfg.get("load_dir")
    if cfg.get("use_tmp"):
        folder_load = "tmp"
    if folder_load is None:
        folder_load = folder_save
    cfg["dir_save"] = folder_save
    cfg["dir_load"] = folder_load
    return cfg


def undistort_images(imagecols, output_dir: str, skip_exists: bool = False,
                     n_jobs: int = -1):
    """Undistort all distorted cameras (runners/functions.py:31-144).

    Pinhole inputs pass through; distorted models are undistorted with
    OpenCV and remapped to PINHOLE.
    """
    from limap_tpu.undistortion import undistort_image_camera
    if imagecols.IsUndistorted():
        return imagecols
    limapio.check_makedirs(output_dir)
    out = imagecols.subset_by_image_ids(imagecols.get_img_ids())
    done_cams = {}
    for img_id in imagecols.get_img_ids():
        cam_id = imagecols.camimage(img_id).cam_id
        cam = imagecols.cam(cam_id)
        imname_out = os.path.join(output_dir, f"image{img_id:08d}.png")
        if cam.is_undistorted():
            continue
        if cam_id not in done_cams:
            new_cam = undistort_image_camera(
                cam, imagecols.image_name(img_id), imname_out)
            new_cam.camera_id = cam_id
            done_cams[cam_id] = new_cam
            out.change_camera(cam_id, new_cam)
        out.change_image_name(img_id, imname_out)
    return out


def compute_sfminfos(cfg: dict, imagecols, points3d: Optional[dict] = None,
                     images: Optional[dict] = None,
                     fname: str = "metainfos.txt"):
    """Visual neighbors + robust ranges (runners/functions.py:147-194).

    The point model can be (a) supplied directly (``points3d`` =
    {pid: {xyz, image_ids}}), (b) triangulated in-process from
    ``images`` against the known poses
    (pointsfm.sfm.run_sfm_with_known_poses — the counterpart of the
    reference's hloc+COLMAP shell-out, colmap_sfm.py:20-128), or (c)
    absent, in which case neighbors fall back to pose proximity and
    ranges to pose extents so RGB-only pipelines still run.
    """
    if not cfg.get("load_meta", False):
        if points3d is None and images is not None:
            from limap_tpu.pointsfm.sfm import run_sfm_with_known_poses
            points3d = run_sfm_with_known_poses(
                imagecols, images=images,
                n_neighbors=cfg.get("n_neighbors", 20),
                weight_path=cfg.get("weight_path"))
        if points3d:
            model = SfmModel.from_imagecols_and_points(imagecols, points3d)
            neighbors, ranges = compute_metainfos(
                cfg.get("sfm", {}), model,
                n_neighbors=cfg.get("n_neighbors", 20))
        else:
            neighbors = compute_pose_neighbors(
                imagecols, cfg.get("n_neighbors", 20))
            ranges = compute_pose_ranges(imagecols)
        fname_save = os.path.join(cfg["dir_save"], fname)
        limapio.save_txt_metainfos(fname_save, neighbors, ranges)
    else:
        fname_load = os.path.join(cfg["dir_load"], fname)
        neighbors, ranges = limapio.read_txt_metainfos(fname_load)
        for img_id in neighbors:
            neighbors[img_id] = neighbors[img_id][:cfg.get("n_neighbors", 20)]
    return None, neighbors, ranges


def compute_pose_neighbors(imagecols, n_neighbors: int):
    """Fallback neighbor ranking by camera-center distance."""
    ids = imagecols.get_img_ids()
    centers = np.stack([imagecols.campose(i).center() for i in ids])
    d = np.linalg.norm(centers[:, None] - centers[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    out = {}
    for k, img_id in enumerate(ids):
        order = np.argsort(d[k])[:n_neighbors]
        out[img_id] = [ids[j] for j in order]
    return out


def compute_pose_ranges(imagecols, stretch: float = 10.0):
    centers = np.stack([imagecols.campose(i).center()
                        for i in imagecols.get_img_ids()])
    lo = centers.min(0)
    hi = centers.max(0)
    mid = 0.5 * (lo + hi)
    half = np.maximum(0.5 * (hi - lo), 1.0) * stretch
    return (mid - half, mid + half)


def compute_2d_segs(cfg: dict, imagecols, compute_descinfo: bool = True):
    """Detect (+ describe) 2D lines (runners/functions.py:197-290)."""
    basedir = os.path.join("line_detections",
                           cfg["line2d"]["detector"]["method"])
    folder_save = os.path.join(cfg["dir_save"], basedir)
    se_det = cfg.get("skip_exists", False) \
        or cfg["line2d"]["detector"].get("skip_exists", False)
    detector = limap_tpu.line2d.get_detector(
        cfg["line2d"]["detector"],
        max_num_2d_segs=cfg["line2d"].get("max_num_2d_segs", 3000),
        do_merge_lines=cfg["line2d"].get("do_merge_lines", False),
        weight_path=cfg.get("weight_path"))
    if not cfg.get("load_det", False):
        all_2d_segs = detector.detect_all_images(folder_save, imagecols,
                                                 skip_exists=se_det)
    else:
        folder_load = os.path.join(cfg["dir_load"], basedir)
        all_2d_segs = limapio.read_all_segments_from_folder(
            detector.get_segments_folder(folder_load))
        all_2d_segs = {i: all_2d_segs[i] for i in imagecols.get_img_ids()}
    descinfo_folder = None
    if compute_descinfo:
        se_ext = cfg.get("skip_exists", False) \
            or cfg["line2d"]["extractor"].get("skip_exists", False)
        extractor = limap_tpu.line2d.get_extractor(
            cfg["line2d"]["extractor"], weight_path=cfg.get("weight_path"))
        descinfo_folder = extractor.extract_all_images(
            folder_save, imagecols, all_2d_segs, skip_exists=se_ext)
    return all_2d_segs, descinfo_folder


def compute_matches(cfg: dict, descinfo_folder: str, image_ids: List[int],
                    neighbors: Dict[int, List[int]]):
    """Match lines with visual neighbors (runners/functions.py:293-345)."""
    basedir = os.path.join(
        "line_matchings", cfg["line2d"]["detector"]["method"],
        "feats_{}".format(cfg["line2d"]["extractor"]["method"]))
    extractor = limap_tpu.line2d.get_extractor(
        cfg["line2d"]["extractor"], weight_path=cfg.get("weight_path"))
    se_match = cfg.get("skip_exists", False) \
        or cfg["line2d"]["matcher"].get("skip_exists", False)
    matcher = limap_tpu.line2d.get_matcher(
        cfg["line2d"]["matcher"], extractor,
        n_neighbors=cfg.get("n_neighbors", 20),
        weight_path=cfg.get("weight_path"))
    if not cfg.get("load_match", False):
        folder_save = os.path.join(cfg["dir_save"], basedir)
        return matcher.match_all_neighbors(folder_save, image_ids, neighbors,
                                           descinfo_folder,
                                           skip_exists=se_match)
    folder_load = os.path.join(cfg["dir_load"], basedir)
    return matcher.get_matches_folder(folder_load)
