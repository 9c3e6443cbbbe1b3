"""Quickstart on the synthetic protocol scene.

The reference's quickstart downloads the Hypersim ``ai_001_001`` scene
(/root/reference/scripts/quickstart.sh) and runs
runners/hypersim/triangulation.py on its first 100 views.  This
environment has no network, so the quickstart instead renders the
deterministic synthetic protocol scene (bench_pipeline.build_scene: 100
posed 800x600 views of a wall of 120 lines), runs the FULL
line_triangulation runner on it (detection -> matching -> triangulation
-> filters -> BA -> saved finaltracks), and evaluates length
recall / precision @ tau against the exact GT segments — the quality
numbers BASELINE.md pins per round.

Usage: python scripts/synthetic_quickstart.py [--n_views 100]
       [--output_dir outputs/quickstart] [--a.b.c val overrides]
"""

import argparse
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import cv2

    import bench_pipeline
    from limap_tpu.base.image_collection import (CameraImage,
                                                 ImageCollection)
    from limap_tpu.runners import line_triangulation
    from limap_tpu.util.config import load_config, update_config

    parser = argparse.ArgumentParser()
    parser.add_argument("--n_views", type=int, default=100)
    parser.add_argument("--output_dir", type=str,
                        default="outputs/quickstart")
    parser.add_argument("-c", "--config_file", type=str,
                        default="cfgs/triangulation/default.yaml")
    args, unknown = parser.parse_known_args()

    imagecols, imgs, nbrs, gt = bench_pipeline.build_scene(args.n_views)
    img_dir = os.path.join(args.output_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    images = {}
    for k, img in imgs.items():
        fname = os.path.join(img_dir, f"image_{k:04d}.png")
        cv2.imwrite(fname, img)
        images[k] = CameraImage(imagecols.images[k].cam_id,
                                imagecols.images[k].pose, fname)
    imagecols = ImageCollection(imagecols.cameras, images)

    cfg = load_config(args.config_file)
    cfg["output_dir"] = args.output_dir
    cfg["max_image_dim"] = -1
    # quickstart default: host LSD front-end (the cfg zoo default is
    # tpu_lsd, which is built for the accelerator — on a 2-core CPU
    # host its grid-CC iterations take minutes per image); override
    # with --line2d.detector.method tpu_lsd etc.
    cfg.setdefault("line2d", {}).setdefault("detector", {})
    cfg["line2d"]["detector"]["method"] = "lsd"
    cfg = update_config(cfg, unknown, {})
    tracks = line_triangulation(cfg, imagecols, neighbors=nbrs)

    q = bench_pipeline.quality_eval(
        tracks, gt, min_support=cfg.get("n_visible_views", 4))
    q["gt_lines"] = len(gt)
    print(json.dumps({"quickstart_quality": q}, indent=1))
    out = os.path.join(args.output_dir, "quality.json")
    with open(out, "w") as f:
        json.dump(q, f, indent=1)
    print(f"tracks: {len(tracks)}; quality written to {out}")


if __name__ == "__main__":
    main()
