"""scripts/convert_model.py: COLMAP -> NVM round-trips through our own
VisualSfM reader (reference scripts/convert_model.py +
pointsfm/model_converter.py semantics)."""

import os
import sys

import numpy as np

import tests.conftest  # noqa: F401

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from convert_model import (convert_colmap_to_visualsfm,  # noqa: E402
                           convert_imagecols_to_colmap)

from limap_tpu.base.camera import Camera, CameraPose  # noqa: E402
from limap_tpu.base.image_collection import (CameraImage,  # noqa: E402
                                             ImageCollection)
from limap_tpu.pointsfm.colmap_reader import read_model  # noqa: E402
from limap_tpu.pointsfm.readers import ReadModelVisualSfM  # noqa: E402


def _imagecols(n=3):
    K = np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]])
    cams = {0: Camera(K=K, hw=(96, 128), cam_id=0)}
    images = {}
    for k in range(n):
        images[k] = CameraImage(0, CameraPose(
            R=np.eye(3), tvec=np.array([0.5 * k, 0.0, 0.0])),
            f"im_{k}.png")
    return ImageCollection(cams, images)


def test_imagecols_to_colmap_roundtrip(tmp_path):
    ic = _imagecols()
    out = tmp_path / "colmap"
    convert_imagecols_to_colmap(ic, str(out))
    _, images, _, _ = read_model(str(out))
    assert len(images) == 3
    np.testing.assert_allclose(images[2].pose.tvec, [1.0, 0, 0],
                               atol=1e-9)


def test_colmap_to_vsfm_roundtrip(tmp_path):
    # tiny model WITH 2D observations via the 7scenes test helper
    from tests.test_7scenes_utils import _write_scene_model
    model, images = _write_scene_model(tmp_path)
    out = tmp_path / "vsfm"
    convert_colmap_to_visualsfm(str(model), str(out))
    ic, points3d = ReadModelVisualSfM(str(out))
    assert len(ic.get_img_ids()) == 4
    assert len(points3d) == 3
    # camera centers survive the quaternion/center conversion
    for row, img_id in enumerate(sorted(images)):
        C_ref = -(images[img_id].pose.R().T
                  @ images[img_id].pose.tvec)
        im2 = ic.images[row]
        C_new = -(im2.pose.R().T @ im2.pose.tvec)
        np.testing.assert_allclose(C_new, C_ref, atol=1e-5)
