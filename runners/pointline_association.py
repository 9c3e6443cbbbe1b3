"""Joint point-line-VP association on a saved line map
(reference: runners/pointline_association.py)."""

import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import limap_tpu.pointsfm as pointsfm
from limap_tpu.runners.pointline_association import pointline_association
from limap_tpu.util import io as limapio
from limap_tpu.util.config import load_config, update_config


def main():
    parser = argparse.ArgumentParser(
        description="joint point-line-VP association")
    parser.add_argument("-i", "--input_folder", type=str, required=True,
                        help="finaltracks folder")
    parser.add_argument("--colmap_model_path", type=str, required=True)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parser.add_argument("-c", "--config_file", type=str,
                        default=os.path.join(
                            repo_root, "cfgs", "global_pl_association",
                            "default.yaml"))
    parser.add_argument("--no_vp", action="store_true")
    args, unknown = parser.parse_known_args()

    cfg = load_config(args.config_file)
    cfg = update_config(cfg, unknown, {})
    cfg.setdefault("output_dir", "tmp_pl_association")

    tracks, _, imagecols, all_2d_segs = \
        limapio.read_folder_linetracks_with_info(args.input_folder)
    _, _, points2d, points3d = pointsfm.read_model(args.colmap_model_path)

    new_tracks, points, vps = pointline_association(
        cfg, imagecols, tracks, all_2d_segs, points3d, points2d,
        use_vp=cfg.get("use_vp", True) and not args.no_vp)
    print(f"associated: {len(new_tracks)} tracks, {len(points)} points, "
          f"{len(vps)} vps")


if __name__ == "__main__":
    main()
