"""Hypersim line-map evaluation (reference: scripts/eval_hypersim.py).

Builds the GT point cloud by unprojecting the scene depth maps and
reports length recall / precision at tau in {1, 5, 10} mm.
"""

import argparse
import os
import sys

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from limap_tpu.evaluation import PointCloudEvaluator, report_error_to_gt
from limap_tpu.util import io as limapio

MPAU = 0.02539999969303608  # meters per asset unit (eval_hypersim.py:17)


def build_gt_cloud(imagecols, depths, stride: int = 4) -> np.ndarray:
    pts = []
    for img_id in imagecols.get_img_ids():
        view = imagecols.camview(img_id)
        depth = depths[img_id].read_depth(img_hw=[view.h(), view.w()])
        K_inv = view.K_inv()
        R = view.R()
        T = view.T()
        h, w = depth.shape
        ys, xs = np.mgrid[0:h:stride, 0:w:stride]
        z = depth[ys, xs].ravel()
        homo = np.stack([xs.ravel(), ys.ravel(), np.ones(z.size)])
        p_cam = (K_inv @ homo) * z
        p_world = R.T @ (p_cam - T[:, None])
        pts.append(p_world.T)
    return np.concatenate(pts).astype(np.float32)


def main():
    parser = argparse.ArgumentParser(description="evaluate hypersim linemap")
    parser.add_argument("-i", "--input_dir", type=str, required=True,
                        help="finaltracks folder")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--scene_id", type=str, default="ai_001_001")
    parser.add_argument("-nv", "--n_visible_views", type=int, default=4)
    parser.add_argument("--input_n_views", type=int, default=100)
    args = parser.parse_args()

    sys.path.append(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "runners"))
    from hypersim.loader import Hypersim, read_scene_hypersim

    tracks, cfg, imagecols, _ = \
        limapio.read_folder_linetracks_with_info(args.input_dir)
    dataset = Hypersim(args.data_dir)
    _, depths = read_scene_hypersim(
        {"max_image_dim": -1, "input_n_views": args.input_n_views},
        dataset, args.scene_id, load_depth=True)

    cloud = build_gt_cloud(imagecols, depths)
    evaluator = PointCloudEvaluator(cloud)
    lines = np.stack([t.line for t in tracks
                      if t.count_images() >= args.n_visible_views])
    thresholds = [0.001 / MPAU, 0.005 / MPAU, 0.01 / MPAU]  # 1/5/10 mm
    report = report_error_to_gt(evaluator, lines, thresholds)
    for tau, label in zip(thresholds, ["1mm", "5mm", "10mm"]):
        print(f"recall@{label}: {report['recall'][tau] * MPAU:.3f} m  "
              f"precision@{label}: {report['precision'][tau]:.1f}%")


if __name__ == "__main__":
    main()
