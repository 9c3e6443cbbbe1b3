"""Hybrid localization pipeline test: localize a held-out query image
against a synthetic db line map + point correspondences."""

import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from limap_tpu.base.camera import Camera, CameraPose
from limap_tpu.base.image_collection import CameraImage, ImageCollection
from limap_tpu.base.linetrack import LineTrack
from limap_tpu.base.align import umeyama_alignment
from limap_tpu.util.evaluation import compute_pose_err

from tests.test_pipeline_e2e import WALL_Z, make_scene, cfg_dir  # noqa: F401


def test_umeyama(rng):
    R_gt = Rotation.from_rotvec(rng.normal(size=3)).as_matrix()
    t_gt = rng.normal(size=3)
    s_gt = 2.3
    x = rng.normal(size=(3, 20))
    y = s_gt * R_gt @ x + t_gt[:, None]
    R, t, s = umeyama_alignment(x, y)
    np.testing.assert_allclose(R, R_gt, atol=1e-6)
    np.testing.assert_allclose(t, t_gt, atol=1e-6)
    assert abs(s - s_gt) < 1e-6


@pytest.mark.parametrize("matcher_2d", [
    "epipolar",
    pytest.param("superglue_endpoints", marks=pytest.mark.slow)])
@pytest.mark.slow
def test_hybrid_localization_pipeline(rng, tmp_path, cfg_dir, matcher_2d):
    """End-to-end hybrid localization; parameterized over the 2D-2D
    line matcher: epipolar IoU and the learned superglue_endpoints
    matcher (random GNN weights + topk candidates, pruned by the
    reprojection filter — reference hybrid_localization.py:191-244)."""
    from limap_tpu.runners import hybrid_localization
    from limap_tpu.util.config import load_config

    imagecols, gt, depths = make_scene(rng, tmp_path, n_views=6)
    # db = images 0..4; query = image 5
    db_ids = [0, 1, 2, 3, 4]
    q_id = 5
    imagecols_db = imagecols.subset_by_image_ids(db_ids)
    imagecols_query = imagecols.subset_by_image_ids([q_id])
    gt_pose = imagecols.campose(q_id)

    # db line map: GT tracks (detection-independent)
    linemap_db = [LineTrack(line=np.asarray(line),
                            image_id_list=db_ids,
                            line_id_list=[i] * len(db_ids),
                            line2d_list=[np.zeros((2, 2))] * len(db_ids))
                  for i, line in enumerate(gt)]

    # synthetic 2D-3D point correspondences for the query
    p3ds = rng.uniform([-4, -3, WALL_Z], [4, 3, WALL_Z], size=(30, 3))
    K = imagecols.cam(0).K()
    Rq, tq = gt_pose.R(), gt_pose.T()
    pc = p3ds @ Rq.T + tq
    p2ds = (pc[:, :2] / pc[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    p2ds += rng.normal(size=p2ds.shape) * 0.5

    cfg = load_config(os.path.join(cfg_dir, "fitnmerge", "default.yaml"))
    cfg["output_dir"] = str(tmp_path / "loc_out")
    cfg["localization"] = {"IoU_threshold": 0.2,
                           "2d_matcher": matcher_2d,
                           "matcher_options": {"topk": 3}}
    cfg["estimation"] = {"ransac": {"method": "hybrid", "thres_point": 5.0,
                                    "thres_line": 5.0}}
    # query pose prior: perturbed GT (used only for epipolar matching)
    prior = CameraPose(R=Rotation.from_rotvec(
        rng.normal(size=3) * 0.01).as_matrix() @ Rq, tvec=tq + 0.05)
    imagecols_query.set_camera_pose(q_id, prior)

    results_path = str(tmp_path / "poses.txt")
    poses = hybrid_localization(
        cfg, imagecols_db, imagecols_query,
        {q_id: (p3ds, p2ds)}, linemap_db,
        retrieval={q_id: db_ids}, results_path=results_path)

    te, re = compute_pose_err(poses[q_id], gt_pose)
    assert te < 0.05, (te, re)
    assert re < 0.5
    assert os.path.isfile(results_path)


@pytest.mark.slow
def test_line_refinement_with_vp(rng):
    """Refinement with VP constraints keeps direction aligned to VP."""
    import jax.numpy as jnp
    from limap_tpu.base import CameraViewsBatch, Segments
    from limap_tpu.base.linetrack import tracks_to_batch
    from limap_tpu.optimize import RefinementConfig, solve_line_refinement
    from tests.test_line_ba import build_tracks

    tracks, id2idx, vb, gt = build_tracks(rng)
    batch = tracks_to_batch(tracks, id2idx)
    refined, result = solve_line_refinement(
        batch, vb, RefinementConfig(loss="trivial"), num_iterations=20)
    assert float(jnp.sum(result.cost)) < float(jnp.sum(result.cost0))
