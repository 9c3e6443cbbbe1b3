"""Hypersim depth-assisted fit&merge entry point
(reference: runners/hypersim/fitnmerge.py)."""

import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import limap_tpu.runners
from limap_tpu.util.config import load_config, update_config

from hypersim.loader import Hypersim, read_scene_hypersim


def parse_config():
    parser = argparse.ArgumentParser(
        description="fit&merge 3D lines on a Hypersim scene with GT depth")
    parser.add_argument("-c", "--config_file", type=str,
                        default="cfgs/fitnmerge/default.yaml")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--scene_id", type=str, default="ai_001_001")
    parser.add_argument("--cam_id", type=int, default=0)
    parser.add_argument("--input_n_views", type=int, default=100)
    args, unknown = parser.parse_known_args()
    cfg = load_config(args.config_file)
    cfg = update_config(cfg, unknown, {})
    cfg["data_dir"] = args.data_dir
    cfg["scene_id"] = args.scene_id
    cfg["cam_id"] = args.cam_id
    cfg["input_n_views"] = args.input_n_views
    return cfg


def main():
    cfg = parse_config()
    dataset = Hypersim(cfg["data_dir"])
    imagecols, depths = read_scene_hypersim(
        cfg, dataset, cfg["scene_id"], cam_id=cfg["cam_id"],
        load_depth=True)
    linetracks = limap_tpu.runners.line_fitnmerge(cfg, imagecols, depths)
    print(f"fit&merged {len(linetracks)} line tracks")


if __name__ == "__main__":
    main()
