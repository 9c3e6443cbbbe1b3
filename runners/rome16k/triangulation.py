"""Rome16K triangulation (reference: runners/rome16k/triangulation.py):
bundler model restricted to one connected component."""

import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import limap_tpu.runners
from limap_tpu.pointsfm.readers import ReadModelBundler
from limap_tpu.util.config import load_config, update_config

from rome16k.Rome16K import Rome16K


def main():
    parser = argparse.ArgumentParser(
        description="triangulate 3D lines on a Rome16K component")
    parser.add_argument("-c", "--config_file", type=str,
                        default="cfgs/triangulation/rome16k.yaml")
    parser.add_argument("-a", "--bundler_path", type=str, required=True)
    parser.add_argument("-l", "--list_path", type=str,
                        default="bundle.list.txt")
    parser.add_argument("-m", "--model_path", type=str,
                        default="bundle/bundle.orig.out")
    parser.add_argument("--component_folder", type=str,
                        default="bundle/components")
    parser.add_argument("--component_id", type=int, default=0)
    args, unknown = parser.parse_known_args()
    cfg = load_config(args.config_file)
    cfg = update_config(cfg, unknown, {})

    imagecols, points3d = ReadModelBundler(args.bundler_path,
                                           args.list_path,
                                           args.model_path)
    dataset = Rome16K(os.path.join(args.bundler_path, args.list_path),
                      os.path.join(args.bundler_path,
                                   args.component_folder))
    keep = set(dataset.get_images_in_component(args.component_id))
    imagecols = imagecols.subset_by_image_ids(
        [i for i in imagecols.get_img_ids() if i in keep])
    linetracks = limap_tpu.runners.line_triangulation(
        cfg, imagecols, points3d=points3d)
    print(f"triangulated {len(linetracks)} line tracks")


if __name__ == "__main__":
    main()
