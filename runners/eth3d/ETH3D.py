"""ETH3D dataset loader (reference: runners/eth3d/ETH3D.py).

ETH3D ships COLMAP-format calibration
(``<scene>/dslr_calibration_undistorted/``) plus ground-truth scan
clouds; images under ``<scene>/images``.
"""

from __future__ import annotations

import os

import numpy as np

from limap_tpu.pointsfm import ReadInfos, ReadPointTracks


class ETH3D:
    # standard split (reference ETH3D.py)
    scenes_train = [
        "courtyard", "delivery_area", "electro", "facade", "kicker",
        "meadow", "office", "pipes", "playground", "relief", "relief_2",
        "terrace", "terrains",
    ]

    def __init__(self, data_dir: str):
        self.data_dir = data_dir

    def scene_dir(self, scene_id: str) -> str:
        return os.path.join(self.data_dir, scene_id)

    def read_imagecols(self, scene_id: str,
                       calib: str = "dslr_calibration_undistorted"):
        model_path = os.path.join(self.scene_dir(scene_id), calib)
        imagecols = ReadInfos(model_path,
                              image_path=os.path.join(
                                  self.scene_dir(scene_id), "images"))
        return imagecols

    def read_points3d(self, scene_id: str,
                      calib: str = "dslr_calibration_undistorted"):
        return ReadPointTracks(os.path.join(self.scene_dir(scene_id),
                                            calib))

    def read_gt_scan(self, scene_id: str) -> np.ndarray:
        """GT laser scan point cloud (scan_clean ply files)."""
        from limap_tpu.util.io import read_ply
        scan_dir = os.path.join(self.scene_dir(scene_id), "scan_clean")
        plys = sorted(f for f in os.listdir(scan_dir)
                      if f.endswith(".ply")) if os.path.isdir(scan_dir) \
            else []
        clouds = [read_ply(os.path.join(scan_dir, f)) for f in plys]
        return np.concatenate(clouds) if clouds else np.zeros((0, 3))
