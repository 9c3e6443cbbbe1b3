"""Generic triangulation from a COLMAP model
(reference: runners/colmap_triangulation.py)."""

import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import limap_tpu.pointsfm as pointsfm
import limap_tpu.runners
from limap_tpu.util.config import load_config, update_config


def parse_config():
    parser = argparse.ArgumentParser(
        description="triangulate 3D lines from a COLMAP reconstruction")
    parser.add_argument("-c", "--config_file", type=str,
                        default="cfgs/triangulation/default.yaml")
    parser.add_argument("-a", "--colmap_path", type=str, required=True)
    parser.add_argument("-m", "--model_path", type=str, default="sparse")
    parser.add_argument("-i", "--image_path", type=str, default="images")
    args, unknown = parser.parse_known_args()
    cfg = load_config(args.config_file)
    cfg = update_config(cfg, unknown, {})
    cfg["colmap_path"] = args.colmap_path
    cfg["model_path"] = args.model_path
    cfg["image_path"] = args.image_path
    return cfg


def main():
    cfg = parse_config()
    model_path = os.path.join(cfg["colmap_path"], cfg["model_path"])
    image_path = os.path.join(cfg["colmap_path"], cfg["image_path"])
    imagecols = pointsfm.ReadInfos(model_path, image_path)
    points3d = pointsfm.ReadPointTracks(model_path)
    linetracks = limap_tpu.runners.line_triangulation(
        cfg, imagecols, points3d=points3d)
    print(f"triangulated {len(linetracks)} line tracks")


if __name__ == "__main__":
    main()
