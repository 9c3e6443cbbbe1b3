"""Model conversion CLI (reference: scripts/convert_model.py).

Types:
  imagecols2colmap  — saved imagecols.npy -> COLMAP text model
  colmap2vsfm       — COLMAP model -> VisualSfM NVM
"""

import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from limap_tpu.base.image_collection import ImageCollection
from limap_tpu.pointsfm.colmap_reader import read_model, write_model_txt
from limap_tpu.util import io as limapio


def convert_imagecols_to_colmap(imagecols: ImageCollection,
                                output_path: str) -> None:
    """ImageCollection -> COLMAP text model (model_converter.py
    convert_imagecols_to_colmap equivalent)."""
    write_model_txt(output_path, imagecols)


def convert_colmap_to_visualsfm(input_path: str, output_path: str,
                                nvm_file: str = "reconstruction.nvm"
                                ) -> None:
    """COLMAP model -> VisualSfM NVM (model_converter.py
    convert_colmap_to_visualsfm equivalent; NVM_V3 format, one shared
    focal per image, k=0 radial)."""
    cams, images, p2d, p3d = read_model(input_path)
    os.makedirs(output_path, exist_ok=True)
    img_ids = sorted(images.keys())
    row_of = {img_id: i for i, img_id in enumerate(img_ids)}
    lines = ["NVM_V3", "", str(len(img_ids))]
    for img_id in img_ids:
        im = images[img_id]
        cam = cams[im.cam_id]
        f = float(cam.K()[0, 0])
        q = im.pose.qvec
        # NVM stores camera center
        C = -im.pose.R().T @ im.pose.tvec
        lines.append(
            f"{im.image_name}\t{f} {q[0]} {q[1]} {q[2]} {q[3]} "
            f"{C[0]} {C[1]} {C[2]} 0 0")
    pts = []
    for pid, rec in p3d.items():
        xyz = rec["xyz"]
        obs = []
        for img_id, p2did in zip(rec["image_ids"],
                                 rec.get("point2D_idxs",
                                         [0] * len(rec["image_ids"]))):
            if img_id not in row_of:
                continue
            xy = np.asarray(p2d.get(img_id, np.zeros((0, 2))))
            if p2did >= len(xy):
                continue
            cam = cams[images[img_id].cam_id]
            K = cam.K()
            # NVM measurements are relative to the principal point
            mx = xy[p2did][0] - K[0, 2]
            my = xy[p2did][1] - K[1, 2]
            obs.append(f"{row_of[img_id]} {p2did} {mx} {my}")
        if not obs:
            continue
        pts.append(f"{xyz[0]} {xyz[1]} {xyz[2]} 128 128 128 "
                   f"{len(obs)} " + " ".join(obs))
    lines += ["", str(len(pts))] + pts + ["", "0", "", "0"]
    with open(os.path.join(output_path, nvm_file), "w") as fp:
        fp.write("\n".join(lines) + "\n")


def main():
    parser = argparse.ArgumentParser(description="model conversion")
    parser.add_argument("-i", "--input_path", required=True, type=str)
    parser.add_argument("-o", "--output_path", required=True, type=str)
    parser.add_argument("--type", type=str, default="imagecols2colmap",
                        help="imagecols2colmap | colmap2vsfm")
    args = parser.parse_args()

    if args.type == "imagecols2colmap":
        imagecols = limapio.read_npy(args.input_path).item()
        if isinstance(imagecols, dict):
            imagecols = ImageCollection.from_dict(imagecols)
        convert_imagecols_to_colmap(imagecols, args.output_path)
    elif args.type == "colmap2vsfm":
        convert_colmap_to_visualsfm(args.input_path, args.output_path)
    else:
        raise NotImplementedError(args.type)


if __name__ == "__main__":
    main()
