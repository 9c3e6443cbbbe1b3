"""ETH3D line triangulation entry point
(reference: runners/eth3d/triangulation.py)."""

import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import limap_tpu.runners
from limap_tpu.util.config import load_config, update_config

from eth3d.ETH3D import ETH3D


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config_file", type=str,
                        default="cfgs/triangulation/default.yaml")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--scene_id", type=str, default="terrains")
    args, unknown = parser.parse_known_args()
    cfg = load_config(args.config_file)
    cfg = update_config(cfg, unknown, {})

    dataset = ETH3D(args.data_dir)
    imagecols = dataset.read_imagecols(args.scene_id)
    points3d = dataset.read_points3d(args.scene_id)
    tracks = limap_tpu.runners.line_triangulation(cfg, imagecols,
                                                  points3d=points3d)
    print(f"triangulated {len(tracks)} line tracks")


if __name__ == "__main__":
    main()
