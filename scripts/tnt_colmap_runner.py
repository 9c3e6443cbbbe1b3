"""Run COLMAP (feature/match/map/undistort) on a Tanks&Temples scene
(reference: scripts/tnt_colmap_runner.py), parameterized instead of
hard-coded."""

import argparse
import os
import subprocess
import time


def main():
    parser = argparse.ArgumentParser(
        description="COLMAP SfM over Tanks&Temples scenes")
    parser.add_argument("--path", type=str, default="training")
    parser.add_argument("--scene_id", type=str, default="Courthouse")
    parser.add_argument("--output_path", type=str, default="colmap")
    args = parser.parse_args()

    for folder in os.listdir(args.path):
        if folder != args.scene_id:
            continue
        input_folder = os.path.join(args.path, folder)
        output_folder = os.path.join(args.output_path, args.path, folder)
        sparse_folder = os.path.join(output_folder, "sparse")
        dense_folder = os.path.join(output_folder, "dense")
        for d in (output_folder, sparse_folder, dense_folder):
            os.makedirs(d, exist_ok=True)
        database_path = os.path.join(output_folder, "database.db")

        cmds = [
            ["colmap", "feature_extractor", "--database_path",
             database_path, "--image_path", input_folder],
            ["colmap", "exhaustive_matcher", "--database_path",
             database_path],
            ["colmap", "mapper", "--database_path", database_path,
             "--image_path", input_folder, "--output_path",
             sparse_folder],
            ["colmap", "image_undistorter", "--image_path",
             input_folder, "--input_path",
             os.path.join(sparse_folder, "0"), "--output_path",
             dense_folder, "--output_type", "COLMAP"],
        ]
        for cmd in cmds:
            print(" ".join(cmd))
            subprocess.run(cmd, check=True)
        time.sleep(1.0)


if __name__ == "__main__":
    main()
