"""Cambridge / InLoc pipeline glue: portable pieces + import gating
(reference runners/{cambridge,inloc}/utils.py semantics)."""

import os
import sys

import numpy as np
import pytest

import tests.conftest  # noqa: F401

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "runners", "cambridge"))
sys.path.insert(0, os.path.join(_ROOT, "runners", "inloc"))

# the glue modules share the module name "utils"; load both by path
import importlib.util  # noqa: E402


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


cam_utils = _load("cambridge_utils",
                  os.path.join(_ROOT, "runners", "cambridge", "utils.py"))
inloc_utils = _load("inloc_utils",
                    os.path.join(_ROOT, "runners", "inloc", "utils.py"))

from limap_tpu.base.camera import Camera, CameraPose  # noqa: E402
from limap_tpu.base.image_collection import (CameraImage,  # noqa: E402
                                             ImageCollection)


def test_cambridge_result_filenames():
    cfg = {"ransac": {"method": "hybrid", "thres_point": 10.0,
                      "thres_line": 10.0},
           "2d_matcher": "epipolar", "reprojection_filter": None,
           "epipolar_filter": False,
           "line_cost_func": "PerpendicularDist"}
    pt, joint = cam_utils.get_result_filenames(cfg)
    assert pt == "results_point.txt"
    assert joint == ("results_joint_epipolar_PerpendicularDist_"
                     "hybrid_10.0-10.0.txt")


def test_cambridge_eval_thresholds(tmp_path):
    K = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    poses_gt, id_to_name = {}, {}
    lines = []
    for qid in range(4):
        pose = CameraPose(R=np.eye(3), tvec=np.array([0.1 * qid, 0, 0]))
        poses_gt[qid] = pose
        name = f"seq1/frame{qid:05d}.png"
        id_to_name[qid] = name
        t = pose.tvec.copy()
        if qid == 3:
            t = t + [1.0, 0, 0]
        lines.append(" ".join([name.split("/")[-1]]
                              + [str(v) for v in pose.qvec]
                              + [str(v) for v in t]))
    res = tmp_path / "results_point.txt"
    res.write_text("\n".join(lines))
    out = cam_utils.evaluate(str(res), poses_gt, list(range(4)),
                             id_to_name)
    assert out["median_t"] < 1e-9
    assert out["recall"]["5cm_5deg"] == pytest.approx(0.75)
    assert out["recall"]["500cm_10deg"] == pytest.approx(1.0)


def test_cambridge_query_list(tmp_path):
    K = np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]])
    cams = {0: Camera(K=K, hw=(96, 128), cam_id=0)}
    images = {5: CameraImage(0, CameraPose(), "a/b/img5.png")}
    ic = ImageCollection(cams, images)
    out = tmp_path / "q.txt"
    cam_utils.create_query_list(ic, str(out))
    tok = out.read_text().split()
    assert tok[0] == "img5.png" and tok[1] == "PINHOLE"
    assert tok[2:4] == ["128", "96"]


def test_inloc_result_filenames():
    cfg = {"ransac": {"method": "hybrid", "thres_point": 10.0,
                      "thres_line": 10.0, "weight_line": 1.0},
           "2d_matcher": "epipolar", "reprojection_filter": None,
           "epipolar_filter": False, "line_cost_func": "Perp"}
    pt, joint = inloc_utils.get_result_filenames(cfg)
    assert pt == "results_temporal_point.txt"
    assert joint == ("results_newlsq_temporal_joint_epipolar_Perp_"
                     "hybrid_10.0_10.0_1.0.txt")


def test_inloc_dataset_enumeration(tmp_path):
    import cv2
    ds = tmp_path / "inloc"
    (ds / "database/scan1").mkdir(parents=True)
    (ds / "query/iphone7").mkdir(parents=True)
    img = np.full((60, 90), 128, np.uint8)
    cv2.imwrite(str(ds / "database/scan1/a.jpg"), img)
    cv2.imwrite(str(ds / "query/iphone7/q.jpg"), img)
    pairs = tmp_path / "pairs.txt"
    pairs.write_text("query/iphone7/q.jpg database/scan1/a.jpg\n")

    def fake_scan_pose(dataset_dir, name):
        T = np.eye(4)
        T[:3, 3] = [1.0, 2.0, 3.0]
        return T

    ic, train_ids, query_ids, names, scales = \
        inloc_utils.read_dataset_inloc(
            {"max_image_dim": -1}, ds, str(pairs),
            get_scan_pose=fake_scan_pose)
    assert len(train_ids) == 1 and len(query_ids) == 1
    cam = ic.cam(ic.camimage(train_ids[0]).cam_id)
    assert cam.params[0] == pytest.approx(90 * 28.0 / 36.0)
    # scan pose cam2world -> world2cam
    pose = ic.camimage(train_ids[0]).pose
    np.testing.assert_allclose(-pose.R().T @ pose.tvec, [1, 2, 3],
                               atol=1e-9)


def test_inloc_p3d_reader(tmp_path):
    from scipy.io import savemat
    p3d = np.arange(24, dtype=np.float64).reshape(2, 4, 3)
    savemat(str(tmp_path / "im.jpg.mat"), {"XYZcut": p3d})
    reader = inloc_utils.InLocP3DReader(str(tmp_path / "im.jpg"))
    np.testing.assert_allclose(reader.read_p3ds(), p3d)


def test_hloc_driving_is_import_gated(tmp_path):
    assert "hloc" not in sys.modules
    with pytest.raises(ImportError, match="hloc"):
        cam_utils.run_hloc_cambridge({}, "imgs", None, {}, [], [], {},
                                     tmp_path / "res.txt")
    with pytest.raises(ImportError, match="hloc"):
        inloc_utils.run_hloc_inloc({}, tmp_path, tmp_path / "p.txt",
                                   tmp_path / "res.txt")
