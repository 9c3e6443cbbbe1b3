"""Tanks & Temples line-map evaluation
(counterpart of /root/reference/scripts/eval_tnt.py).

Loads a finaltracks folder, applies the Sim3 alignment from
scripts/tnt_align.py, and reports length recall / precision at the
reference's thresholds against the GT point cloud (.ply), using the
chunked NN evaluator (evaluation/evaluator.py) instead of a KD-tree.
"""

import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from limap_tpu.evaluation import PointCloudEvaluator
from limap_tpu.util import io as limapio

THRESHOLDS = [0.001, 0.005, 0.01, 0.05]  # eval_tnt.py:24 prefix


def read_ply_xyz(path):
    try:
        import open3d as o3d

        return np.asarray(o3d.io.read_point_cloud(path).points)
    except ImportError:
        pass
    # minimal ascii/binary_little_endian xyz reader
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            header.append(line)
            if line == "end_header":
                break
        n = next(int(h.split()[-1]) for h in header
                 if h.startswith("element vertex"))
        fmt = next(h.split()[1] for h in header if h.startswith("format"))
        props = [h.split()[-1] for h in header
                 if h.startswith("property")]
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n)
            return data[:, :3]
        dt = np.dtype([(p, "<f4") for p in props])
        data = np.frombuffer(f.read(n * dt.itemsize), dtype=dt)
        return np.stack([data["x"], data["y"], data["z"]], axis=1)


def main():
    parser = argparse.ArgumentParser(description="evaluate on TnT GT")
    parser.add_argument("-i", "--input_dir", type=str, required=True,
                        help="finaltracks folder")
    parser.add_argument("--gt_ply", type=str, required=True)
    parser.add_argument("--alignment", type=str, default=None,
                        help="alignment.txt from scripts/tnt_align.py")
    parser.add_argument("-nv", "--n_visible_views", type=int, default=4)
    parser.add_argument("--max_gt_points", type=int, default=2_000_000)
    args = parser.parse_args()

    tracks, _, _, _ = limapio.read_folder_linetracks_with_info(
        args.input_dir)
    lines = np.stack([t.line for t in tracks
                      if t.count_images() >= args.n_visible_views])
    if args.alignment:
        A = np.loadtxt(args.alignment)   # [3, 4], x' = A[:, :3] x + A[:, 3]
        lines = lines @ A[:, :3].T + A[:, 3]

    gt = read_ply_xyz(args.gt_ply)
    if len(gt) > args.max_gt_points:
        sel = np.random.default_rng(0).choice(len(gt),
                                              args.max_gt_points,
                                              replace=False)
        gt = gt[sel]

    evaluator = PointCloudEvaluator(gt.astype(np.float32))
    lengths = np.linalg.norm(lines[:, 1] - lines[:, 0], axis=1)
    print(f"{len(lines)} lines, GT cloud {len(gt)} points")
    for tau in THRESHOLDS:
        ratios = np.array([evaluator.ComputeInlierRatioOneLine(l, tau)
                           for l in lines])
        recall = float((lengths * ratios).sum())
        precision = 100.0 * float((ratios > 0).mean())
        print(f"R / P at {int(tau * 1000)}mm: "
              f"{recall:.2f} / {precision:.2f}")


if __name__ == "__main__":
    main()
