"""ScanNet triangulation entry point
(reference: runners/scannet/triangulation.py)."""

import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import limap_tpu.runners
from limap_tpu.util.config import load_config, update_config

from scannet.ScanNet import ScanNet, read_scene_scannet


def main():
    parser = argparse.ArgumentParser(
        description="triangulate 3D lines on a ScanNet scene")
    parser.add_argument("-c", "--config_file", type=str,
                        default="cfgs/triangulation/scannet.yaml")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--scene_id", type=str, default="scene0678_01")
    args, unknown = parser.parse_known_args()
    cfg = load_config(args.config_file)
    cfg = update_config(cfg, unknown, {"-nv": "--n_visible_views",
                                       "-nn": "--n_neighbors"})
    dataset = ScanNet(args.data_dir,
                      max_image_dim=cfg.get("max_image_dim", -1))
    imagecols = read_scene_scannet(cfg, dataset, args.scene_id)
    linetracks = limap_tpu.runners.line_triangulation(cfg, imagecols)
    print(f"triangulated {len(linetracks)} line tracks")


if __name__ == "__main__":
    main()
