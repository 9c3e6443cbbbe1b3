"""Joint SfM refinement on Hypersim: triangulate a line map on noisy
SfM poses, then jointly bundle-adjust poses + points + lines and
measure the pose improvement vs the GT poses
(reference: runners/hypersim/refine_sfm.py:22-80).

The reference shells out to COLMAP for the initial SfM; here the
initial model can come from (a) a COLMAP model folder
(--colmap_model_path), or (b) the in-process SfM with perturbed-GT
poses (--pose_noise), which keeps the flow runnable offline.
"""

import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import limap_tpu.runners
from limap_tpu.parallel import (HybridBAOptions,
                                solve_hybrid_bundle_adjustment)
from limap_tpu.structures.pl_bipartite import PointTrack
from limap_tpu.util import io as limapio
from limap_tpu.util.config import load_config, update_config
from limap_tpu.util.evaluation import eval_imagecols

from hypersim.loader import Hypersim, read_scene_hypersim


def parse_config():
    parser = argparse.ArgumentParser(
        description="joint point-line SfM refinement on Hypersim")
    parser.add_argument("-c", "--config_file", type=str,
                        default="cfgs/triangulation/default.yaml")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--scene_id", type=str, default="ai_001_001")
    parser.add_argument("--cam_id", type=int, default=0)
    parser.add_argument("--input_n_views", type=int, default=100)
    parser.add_argument("--colmap_model_path", type=str, default=None)
    parser.add_argument("--pose_noise", type=float, default=0.01,
                        help="perturbation (m / ~rad*0.5) applied to GT"
                             " poses when no COLMAP model is given")
    parser.add_argument("--ba_iterations", type=int, default=20)
    args, unknown = parser.parse_known_args()
    cfg = load_config(args.config_file)
    cfg = update_config(cfg, unknown, {"-sid": "--scene_id"})
    for k in ("data_dir", "scene_id", "cam_id", "input_n_views",
              "colmap_model_path", "pose_noise", "ba_iterations"):
        cfg[k] = getattr(args, k)
    return cfg


def main():
    from scipy.spatial.transform import Rotation

    from limap_tpu.base.camera import CameraPose
    from limap_tpu.base.image_collection import (CameraImage,
                                                 ImageCollection)

    cfg = parse_config()
    dataset = Hypersim(cfg["data_dir"])
    imagecols_gt = read_scene_hypersim(cfg, dataset, cfg["scene_id"],
                                       cam_id=cfg["cam_id"])

    if cfg["colmap_model_path"]:
        import limap_tpu.pointsfm as pointsfm
        from limap_tpu.pointsfm.colmap_reader import read_model
        imagecols = pointsfm.ReadInfos(cfg["colmap_model_path"])
        # point observations: resolve each track's point2D_idxs into
        # the images' 2D keypoint coordinates — without them every
        # point residual gets weight 0 and the "joint" BA silently
        # degrades to line-only refinement
        _, _, p2d_by_image, points3d = read_model(cfg["colmap_model_path"])
        pointtracks = []
        for rec in points3d.values():
            pt = PointTrack(np.asarray(rec["xyz"]))
            for img_id, p2d_idx in zip(rec["image_ids"],
                                       rec.get("point2D_idxs", [])):
                xy = p2d_by_image.get(img_id)
                if xy is None or p2d_idx >= len(xy):
                    continue
                pt.image_id_list.append(int(img_id))
                pt.p2d_list.append(np.asarray(xy[p2d_idx],
                                              np.float64)[:2])
            pointtracks.append(pt)
        if pointtracks and not any(pt.p2d_list for pt in pointtracks):
            raise ValueError(
                "COLMAP model has no 2D observations for any point "
                "track; joint BA would silently drop all point terms")
    else:
        # perturbed-GT poses + in-process SfM (offline path)
        rng = np.random.default_rng(0)
        noisy = {}
        for k, img_id in enumerate(imagecols_gt.get_img_ids()):
            im = imagecols_gt.images[img_id]
            R, t = im.pose.R(), im.pose.tvec
            if k >= 2:  # first two poses anchor the gauge
                R = Rotation.from_rotvec(rng.normal(size=3)
                                         * cfg["pose_noise"]
                                         * 0.5).as_matrix() @ R
                t = t + rng.normal(size=3) * cfg["pose_noise"]
            noisy[img_id] = CameraImage(im.cam_id, CameraPose(R=R,
                                                              tvec=t),
                                        im.image_name)
        imagecols = ImageCollection(dict(imagecols_gt.cameras), noisy)
        from limap_tpu.pointsfm.sfm import run_sfm_with_known_poses
        images = {i: dataset.load_image(idx, set_gray=True)
                  for i, idx in zip(imagecols.get_img_ids(),
                                    range(len(imagecols.get_img_ids())))}
        points3d = run_sfm_with_known_poses(imagecols, images=images)
        pointtracks = []
        for rec in points3d.values():
            pt = PointTrack(np.asarray(rec["xyz"]))
            p2ds = rec.get("p2ds", {})
            for img_id in rec["image_ids"]:
                if img_id not in p2ds:
                    continue
                pt.image_id_list.append(int(img_id))
                pt.p2d_list.append(np.asarray(p2ds[img_id]).reshape(-1)
                                   [:2])
            pointtracks.append(pt)

    te0, re0 = eval_imagecols(imagecols, imagecols_gt)
    print(f"original: trans {np.median(te0):.4f}, "
          f"rot {np.median(re0):.4f}")

    # line map on the noisy poses
    linetracks = limap_tpu.runners.line_triangulation(cfg, imagecols)

    # joint hybrid BA
    new_imagecols, new_points, new_tracks, costs = \
        solve_hybrid_bundle_adjustment(
            imagecols, pointtracks, linetracks,
            HybridBAOptions(n_fixed_poses=2),
            n_iterations=cfg["ba_iterations"])
    te1, re1 = eval_imagecols(new_imagecols, imagecols_gt)
    print(f"optimized: trans {np.median(te1):.4f}, "
          f"rot {np.median(re1):.4f} (cost {costs[0]:.4f} -> "
          f"{costs[-1]:.4f})")
    out = os.path.join(cfg.get("output_dir", "outputs/refine_sfm"))
    limapio.check_makedirs(out)
    limapio.save_npy(os.path.join(out, "imagecols_optimized.npy"),
                     new_imagecols.as_dict())
    print(f"saved optimized poses to {out}")


if __name__ == "__main__":
    main()
