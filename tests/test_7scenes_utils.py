"""7Scenes pipeline glue: portable pieces round-trip, hloc driving is
import-gated (reference runners/7scenes/utils.py semantics)."""

import os
import sys

import numpy as np
import pytest

import tests.conftest  # noqa: F401

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runners", "7scenes"))

import utils as seven  # noqa: E402


def _write_scene_model(tmp_path):
    from limap_tpu.base.camera import Camera, CameraPose
    from limap_tpu.base.image_collection import CameraImage

    K = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    cams = {0: Camera(K=K, hw=(100, 100), cam_id=0)}
    images, p2d = {}, {}
    gt_p = np.array([[0.0, 0, 5], [1.0, 0.5, 6], [-1.0, 0.2, 4]])
    p3d = {i: {"xyz": gt_p[i], "image_ids": [], "point2D_idxs": []}
           for i in range(3)}
    for k in range(4):
        R, t = np.eye(3), np.array([0.3 * k, 0.0, 0.0])
        name = f"seq-01/frame-{k:06d}.color.png"
        images[k] = CameraImage(0, CameraPose(R=R, tvec=t), name)
        uv = (K @ (gt_p @ R.T + t).T).T
        uv = uv[:, :2] / uv[:, 2:]
        p2d[k] = uv
        for pid in range(3):
            p3d[pid]["image_ids"].append(k)
            p3d[pid]["point2D_idxs"].append(pid)
    model = tmp_path / "model"
    seven.write_model_txt_full(str(model), cams, images, p2d, p3d)
    return model, images


def test_reference_sfm_split_and_blacklist(tmp_path):
    model, images = _write_scene_model(tmp_path)
    bl = tmp_path / "test_list.txt"
    bl.write_text("seq-01/frame-000003.color.png\n")
    ref = tmp_path / "ref"
    train, test = seven.create_reference_sfm(model, ref, str(bl))
    assert sorted(train) == [0, 1, 2] and test == [3]
    # round-trip: the reference model drops image 3 everywhere
    from limap_tpu.pointsfm.colmap_reader import read_model
    _, imgs2, p2d2, p3d2 = read_model(str(ref))
    assert set(imgs2) == {0, 1, 2}
    for rec in p3d2.values():
        assert 3 not in rec["image_ids"]
    # get_train_test_ids agrees
    tr2, te2 = seven.get_train_test_ids_from_sfm(model, str(bl))
    assert (sorted(tr2), te2) == (sorted(train), test)


def test_result_filenames_mirror_reference():
    cfg = {"ransac": {"method": "hybrid", "thres_point": 10.0,
                      "thres_line": 10.0},
           "2d_matcher": "superglue_endpoints",
           "epipolar_filter": False,
           "reprojection_filter": None,
           "line_cost_func": "PerpendicularDist"}
    pt, joint = seven.get_result_filenames(cfg)
    assert pt == "results_sparse_point.txt"
    assert joint == ("results_sparse_joint_superglue_endpoints_"
                     "PerpendicularDist_hybrid_10.0-10.0.txt")


def test_run_hloc_is_import_gated(tmp_path):
    assert "hloc" not in sys.modules
    with pytest.raises(ImportError, match="hloc"):
        seven.run_hloc_7scenes({}, tmp_path, "stairs",
                               tmp_path / "res.txt", None)


def test_evaluate_pose_errors(tmp_path):
    model, images = _write_scene_model(tmp_path)
    res = tmp_path / "results.txt"
    lines = []
    for k, im in images.items():
        q = im.pose.qvec
        t = im.pose.tvec.copy()
        if k == 3:
            t = t + np.array([1.0, 0, 0])  # one gross error
        lines.append(" ".join([im.image_name] + [str(v) for v in q]
                              + [str(v) for v in t]))
    res.write_text("\n".join(lines))
    out = seven.evaluate(res, model)
    assert out["n"] == 4
    assert out["median_t"] < 1e-6
    assert out["recall_5cm_5deg"] == pytest.approx(0.75)
