"""Generic Bundler-input triangulation
(reference: runners/bundler_triangulation.py)."""

import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import limap_tpu.runners
from limap_tpu.pointsfm.readers import ReadModelBundler
from limap_tpu.util.config import load_config, update_config


def read_scene_bundler(cfg, bundler_path, list_path, model_path):
    """-> (imagecols, points3d) from a bundler reconstruction."""
    imagecols, points3d = ReadModelBundler(bundler_path, list_path,
                                           model_path)
    return imagecols, points3d


def main():
    parser = argparse.ArgumentParser(
        description="triangulate 3D lines from a Bundler model")
    parser.add_argument("-c", "--config_file", type=str,
                        default="cfgs/triangulation/default.yaml")
    parser.add_argument("-a", "--bundler_path", type=str, required=True)
    parser.add_argument("-l", "--list_path", type=str,
                        default="bundle.list.txt")
    parser.add_argument("-m", "--model_path", type=str,
                        default="bundle/bundle.orig.out")
    args, unknown = parser.parse_known_args()
    cfg = load_config(args.config_file)
    cfg = update_config(cfg, unknown, {})
    imagecols, points3d = read_scene_bundler(
        cfg, args.bundler_path, args.list_path, args.model_path)
    linetracks = limap_tpu.runners.line_triangulation(
        cfg, imagecols, points3d=points3d)
    print(f"triangulated {len(linetracks)} line tracks")


if __name__ == "__main__":
    main()
