"""Generic VisualSfM-input triangulation
(reference: runners/visualsfm_triangulation.py)."""

import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import limap_tpu.runners
from limap_tpu.pointsfm.readers import ReadModelVisualSfM
from limap_tpu.util.config import load_config, update_config


def main():
    parser = argparse.ArgumentParser(
        description="triangulate 3D lines from a VisualSfM model")
    parser.add_argument("-c", "--config_file", type=str,
                        default="cfgs/triangulation/default.yaml")
    parser.add_argument("-a", "--vsfm_path", type=str, required=True)
    parser.add_argument("-m", "--nvm_file", type=str,
                        default="reconstruction.nvm")
    args, unknown = parser.parse_known_args()
    cfg = load_config(args.config_file)
    cfg = update_config(cfg, unknown, {})
    imagecols, points3d = ReadModelVisualSfM(args.vsfm_path,
                                             nvm_file=args.nvm_file)
    linetracks = limap_tpu.runners.line_triangulation(
        cfg, imagecols, points3d=points3d)
    print(f"triangulated {len(linetracks)} line tracks")


if __name__ == "__main__":
    main()
