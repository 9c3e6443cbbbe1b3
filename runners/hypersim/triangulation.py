"""Hypersim RGB-only triangulation entry point
(reference: runners/hypersim/triangulation.py)."""

import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import limap_tpu.runners
from limap_tpu.util.config import load_config, update_config

from hypersim.loader import Hypersim, read_scene_hypersim

SHORTCUTS = {
    "-nv": "--n_visible_views", "-nn": "--n_neighbors",
    "-sid": "--scene_id",
}


def parse_config():
    parser = argparse.ArgumentParser(
        description="triangulate 3D lines on a Hypersim scene")
    parser.add_argument("-c", "--config_file", type=str,
                        default="cfgs/triangulation/default.yaml")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--scene_id", type=str, default="ai_001_001")
    parser.add_argument("--cam_id", type=int, default=0)
    parser.add_argument("--input_n_views", type=int, default=100)
    args, unknown = parser.parse_known_args()
    cfg = load_config(args.config_file)
    cfg = update_config(cfg, unknown, SHORTCUTS)
    cfg["data_dir"] = args.data_dir
    cfg["scene_id"] = args.scene_id
    cfg["cam_id"] = args.cam_id
    cfg["input_n_views"] = args.input_n_views
    return cfg


def main():
    cfg = parse_config()
    dataset = Hypersim(cfg["data_dir"])
    imagecols = read_scene_hypersim(cfg, dataset, cfg["scene_id"],
                                    cam_id=cfg["cam_id"])
    linetracks = limap_tpu.runners.line_triangulation(cfg, imagecols)
    print(f"triangulated {len(linetracks)} line tracks")


if __name__ == "__main__":
    main()
