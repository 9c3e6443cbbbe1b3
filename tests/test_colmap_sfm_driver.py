"""External hloc/pycolmap SfM driver: graceful gating + mock-verified
call sequence (reference colmap_sfm.py:76-128 semantics)."""

import sys
import types

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from limap_tpu.base.camera import Camera, CameraPose
from limap_tpu.base.image_collection import CameraImage, ImageCollection
from limap_tpu.pointsfm.colmap_sfm import (run_colmap_sfm_with_known_poses,
                                           write_pairs_from_neighbors)


def _imagecols(tmp_path, n=3):
    K = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    cams = {0: Camera(K=K, hw=(100, 100), cam_id=0)}
    images = {}
    for k in range(n):
        images[k] = CameraImage(0, CameraPose(
            R=np.eye(3), tvec=np.array([k, 0.0, 0])),
            str(tmp_path / f"im_{k}.png"))
    return ImageCollection(cams, images)


def test_import_gating(tmp_path):
    assert "hloc" not in sys.modules
    with pytest.raises(ImportError, match="run_sfm_with_known_poses"):
        run_colmap_sfm_with_known_poses({}, _imagecols(tmp_path),
                                        str(tmp_path / "out"))


def test_write_pairs_from_neighbors(tmp_path):
    ic = _imagecols(tmp_path)
    fname = tmp_path / "pairs.txt"
    write_pairs_from_neighbors(str(fname), ic,
                               {0: [1, 2], 1: [0, 2], 2: [0]})
    lines = fname.read_text().strip().splitlines()
    # deduped undirected pairs
    assert lines == ["im_0.png im_1.png", "im_0.png im_2.png",
                     "im_1.png im_2.png"]


def test_mocked_drive_sequence(tmp_path, monkeypatch):
    """With fake hloc/pycolmap modules, the driver runs extract ->
    match -> triangulate with the expected arguments and reads the
    result model back."""
    calls = {}

    hloc = types.ModuleType("hloc")
    ef = types.ModuleType("hloc.extract_features")
    ef.confs = {"superpoint_aachen": {"output": "feats-spp"}}

    def ef_main(conf, image_dir, outputs):
        calls["extract"] = (conf, str(image_dir))
        return outputs / "feats.h5"

    ef.main = ef_main
    mf = types.ModuleType("hloc.match_features")
    mf.confs = {"NN-superpoint": {"output": "matches-nn"}}

    def mf_main(conf, pairs, feature_out, outputs):
        calls["match"] = (conf, str(pairs), feature_out)
        return outputs / "matches.h5"

    mf.main = mf_main
    tr = types.ModuleType("hloc.triangulation")

    def tr_main(sfm_dir, ref_model, image_dir, pairs, feats, matches):
        calls["triangulate"] = (str(sfm_dir), str(ref_model))
        # produce a tiny COLMAP txt model the reader can parse
        import shutil

        shutil.copytree(ref_model, sfm_dir)

    tr.main = tr_main
    hloc.extract_features = ef
    hloc.match_features = mf
    hloc.triangulation = tr
    monkeypatch.setitem(sys.modules, "hloc", hloc)
    monkeypatch.setitem(sys.modules, "hloc.extract_features", ef)
    monkeypatch.setitem(sys.modules, "hloc.match_features", mf)
    monkeypatch.setitem(sys.modules, "hloc.triangulation", tr)
    monkeypatch.setitem(sys.modules, "pycolmap",
                        types.ModuleType("pycolmap"))

    ic = _imagecols(tmp_path)
    out = run_colmap_sfm_with_known_poses(
        {"hloc": {"descriptor": "superpoint_aachen",
                  "matcher": "NN-superpoint"}},
        ic, str(tmp_path / "out"), neighbors={0: [1], 1: [2], 2: []})
    assert set(calls) == {"extract", "match", "triangulate"}
    assert calls["match"][1].endswith("pairs-from-neighbors.txt")
    assert isinstance(out, dict)  # empty reference model -> no points
