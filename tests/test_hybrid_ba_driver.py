"""High-level hybrid BA driver: perturbed poses + points + lines
recover toward ground truth (reference optimize/solve.py:20-51 +
HybridBAEngine semantics)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import tests.conftest  # noqa: F401

from limap_tpu.base.camera import Camera, CameraPose
from limap_tpu.base.image_collection import CameraImage, ImageCollection
from limap_tpu.base.linetrack import LineTrack
from limap_tpu.parallel import (HybridBAOptions, make_mesh,
                                solve_hybrid_bundle_adjustment)
from limap_tpu.structures.pl_bipartite import PointTrack
from limap_tpu.util.evaluation import eval_imagecols


def _scene(rng, n_views=6, n_lines=24, n_points=40):
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    cams = {0: Camera(K=K, hw=(480, 640), cam_id=0)}
    gt_images, noisy_images = {}, {}
    Rs, ts = [], []
    for k in range(n_views):
        R = Rotation.from_rotvec(rng.normal(size=3) * 0.03).as_matrix()
        t = np.array([0.5 * k, 0.05 * k, 0.01 * k])
        Rs.append(R)
        ts.append(t)
        gt_images[k] = CameraImage(0, CameraPose(R=R, tvec=t))
        if k <= 1:  # the 2 gauge-fixing poses stay exact
            noisy_images[k] = CameraImage(0, CameraPose(R=R, tvec=t))
        else:
            Rn = Rotation.from_rotvec(
                rng.normal(size=3) * 0.004).as_matrix() @ R
            tn = t + rng.normal(size=3) * 0.01
            noisy_images[k] = CameraImage(0, CameraPose(R=Rn, tvec=tn))
    gt_ic = ImageCollection(cams, gt_images)
    noisy_ic = ImageCollection(cams, noisy_images)

    def project(p, k):
        pc = Rs[k] @ p + ts[k]
        return (pc[:2] / pc[2]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]

    gt_s = rng.normal(size=(n_lines, 3)) * 2
    gt_s[:, 2] += 8
    gt_e = gt_s + rng.normal(size=(n_lines, 3))
    linetracks = []
    for li in range(n_lines):
        l2ds = [np.stack([project(gt_s[li], k), project(gt_e[li], k)])
                for k in range(n_views)]
        linetracks.append(LineTrack(
            line=np.stack([gt_s[li], gt_e[li]]),
            image_id_list=list(range(n_views)),
            line_id_list=[li] * n_views, line2d_list=l2ds))

    gt_pts = rng.normal(size=(n_points, 3)) * 2
    gt_pts[:, 2] += 8
    pointtracks = []
    for pi in range(n_points):
        pt = PointTrack(gt_pts[pi] + rng.normal(size=3) * 0.01)
        for k in range(n_views):
            pt.image_id_list.append(k)
            pt.p2d_id_list.append(pi)
            pt.p2d_list.append(project(gt_pts[pi], k))
        pointtracks.append(pt)
    return gt_ic, noisy_ic, pointtracks, linetracks, gt_pts


@pytest.mark.slow
def test_hybrid_ba_recovers_poses(rng):
    gt_ic, noisy_ic, pts, lts, gt_pts = _scene(rng)
    te0, re0 = eval_imagecols(noisy_ic, gt_ic)
    # 2 fixed poses pin the scale gauge (1 fixed pose leaves the
    # monocular similarity's scale free: cost -> 0 with points off GT)
    new_ic, new_pts, new_lts, costs = solve_hybrid_bundle_adjustment(
        noisy_ic, pts, lts, HybridBAOptions(n_fixed_poses=2),
        mesh=make_mesh(4), n_iterations=15)
    te1, re1 = eval_imagecols(new_ic, gt_ic)
    assert costs[-1] < costs[0]
    assert np.median(te1) < 0.5 * np.median(te0), (te0, te1)
    assert np.median(re1) < 0.7 * np.median(re0), (re0, re1)
    # points move toward GT
    err0 = np.linalg.norm(np.asarray([t.p for t in pts]) - gt_pts,
                          axis=1)
    err1 = np.linalg.norm(new_pts - gt_pts, axis=1)
    assert np.median(err1) < np.median(err0)
    assert len(new_lts) == len(lts)
