"""PnPL localization tests: synthetic 2D-3D point+line correspondences
with outliers (the engine's analog of the reference's localization
fixture test, runners/tests/localization.py)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from limap_tpu.base.camera import Camera, CameraPose
from limap_tpu.estimators import pl_estimate_absolute_pose
from limap_tpu.optimize.hybrid_localization import (LineLocConfig,
                                                    solve_jointloc)
from limap_tpu.util.evaluation import compute_pose_err


def make_problem(rng, n_points=40, n_lines=20, outlier_ratio=0.3,
                 noise=0.5):
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    camera = Camera(K=K, hw=(480, 640))
    R_gt = Rotation.from_rotvec(rng.normal(size=3) * 0.3).as_matrix()
    C = rng.normal(size=3) * 0.5
    t_gt = -R_gt @ C
    pose_gt = CameraPose(R=R_gt, tvec=t_gt)

    p3ds = rng.normal(size=(n_points, 3)) * 3
    p3ds[:, 2] += 10
    pc = p3ds @ R_gt.T + t_gt
    p2ds = (pc[:, :2] / pc[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    p2ds += rng.normal(size=p2ds.shape) * noise
    n_out = int(n_points * outlier_ratio)
    p2ds[:n_out] += rng.uniform(50, 200, size=(n_out, 2))

    l3ds = []
    l2ds = []
    for _ in range(n_lines):
        s = rng.normal(size=3) * 3 + [0, 0, 10]
        e = s + rng.normal(size=3) * 2
        l3ds.append(np.stack([s, e]))
        seg_c = np.stack([s, e]) @ R_gt.T + t_gt
        seg2 = (seg_c[:, :2] / seg_c[:, 2:]) * [K[0, 0], K[1, 1]] \
            + [K[0, 2], K[1, 2]]
        l2ds.append(seg2 + rng.normal(size=(2, 2)) * noise)
    l3ds = np.asarray(l3ds)
    l2ds = np.asarray(l2ds)
    n_lout = int(n_lines * outlier_ratio)
    l2ds[:n_lout] += rng.uniform(40, 150, size=(n_lout, 1, 2))
    l3d_ids = np.arange(n_lines)
    return camera, pose_gt, p3ds, p2ds, l3ds, l3d_ids, l2ds


def test_jointloc_refines_noisy_pose(rng):
    camera, pose_gt, p3ds, p2ds, l3ds, l3d_ids, l2ds = make_problem(
        rng, outlier_ratio=0.0, noise=0.2)
    # perturb GT pose
    dq = Rotation.from_rotvec(rng.normal(size=3) * 0.02).as_matrix()
    pose0 = CameraPose(R=dq @ pose_gt.R(), tvec=pose_gt.tvec + 0.05)
    q, t, cost = solve_jointloc(
        l3ds[:, 0], l3ds[:, 1], l2ds[:, 0], l2ds[:, 1], p3ds, p2ds,
        camera.kvec(), pose0.qvec, pose0.tvec, LineLocConfig())
    te, re = compute_pose_err(CameraPose(q, t), pose_gt)
    assert te < 0.01
    assert re < 0.1


@pytest.mark.slow
def test_pnpl_ransac_with_outliers(rng):
    camera, pose_gt, p3ds, p2ds, l3ds, l3d_ids, l2ds = make_problem(rng)
    cfg = {"ransac": {"method": "hybrid", "thres_point": 5.0,
                      "thres_line": 5.0},
           "optimize": {"loss": "huber", "loss_scale": 2.0}}
    pose, stats = pl_estimate_absolute_pose(
        cfg, l3ds, l3d_ids, l2ds, p3ds, p2ds, camera)
    te, re = compute_pose_err(pose, pose_gt)
    assert te < 0.05, (te, re)
    assert re < 0.5
    assert stats["point_inliers"].sum() >= 0.6 * len(p3ds)


def test_pnpl_direct_mode(rng):
    camera, pose_gt, p3ds, p2ds, l3ds, l3d_ids, l2ds = make_problem(
        rng, outlier_ratio=0.0, noise=0.2)
    cfg = {"ransac": {"method": None}}
    pose0 = CameraPose(R=pose_gt.R(), tvec=pose_gt.tvec + 0.03)
    pose, stats = pl_estimate_absolute_pose(
        cfg, l3ds, l3d_ids, l2ds, p3ds, p2ds, camera, campose=pose0)
    te, re = compute_pose_err(pose, pose_gt)
    assert te < 0.01
    assert stats is None


@pytest.mark.slow
def test_lines_improve_point_poor_pose(rng):
    """With very few points, adding lines should help (the reference's
    point-only vs hybrid comparison, README.md:88-92)."""
    camera, pose_gt, p3ds, p2ds, l3ds, l3d_ids, l2ds = make_problem(
        rng, n_points=6, n_lines=30, outlier_ratio=0.0, noise=1.5)
    cfg_pts = {"ransac": {"method": "ransac"}}
    pose_pts, _ = pl_estimate_absolute_pose(
        cfg_pts, np.zeros((0, 2, 3)), [], np.zeros((0, 2, 2)),
        p3ds, p2ds, camera)
    pose_hyb, _ = pl_estimate_absolute_pose(
        cfg_pts, l3ds, l3d_ids, l2ds, p3ds, p2ds, camera)
    te_p, _ = compute_pose_err(pose_pts, pose_gt)
    te_h, _ = compute_pose_err(pose_hyb, pose_gt)
    assert te_h <= te_p * 1.5  # hybrid at least comparable
    assert te_h < 0.05
