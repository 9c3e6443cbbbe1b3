"""Production-scale multi-chip parity (VERDICT r3 item 5).

(a) image-sharded ``triangulate_all_mesh`` over the 8-device virtual
    mesh reproduces the single-device ``triangulate_all`` result on the
    64-view x 800-line x 20-neighbor scene;
(b) 10 iterations of the distributed hybrid BA on an 8-device mesh
    match the 1-device LM trajectory to tolerance.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from limap_tpu.base.camera import Camera, CameraPose
from limap_tpu.base.image_collection import CameraImage, ImageCollection
from limap_tpu.parallel import (HybridBAOptions, HybridBAState,
                                make_hybrid_ba_step, make_mesh)
from limap_tpu.triangulation.triangulator import (GlobalLineTriangulator,
                                                  TriangulatorConfig)
from tests.test_parity_production_scale import K, build_scene

pytestmark = pytest.mark.slow


def _support_map(tracks):
    out = {}
    for t_id, t in enumerate(tracks):
        for img, lid in zip(t.image_id_list, t.line_id_list):
            out[(int(img), int(lid))] = t_id
    return out


def test_sharded_triangulation_matches_single_device_at_scale():
    views, segs, matches = build_scene()
    cams = {0: Camera(K=K, hw=(480, 640), cam_id=0)}
    images = {i: CameraImage(0, CameraPose(R=v[1], tvec=v[2]))
              for i, v in views.items()}
    imagecols = ImageCollection(cams, images)
    cfg = TriangulatorConfig(max_tris_per_node=64)

    tri1 = GlobalLineTriangulator(cfg)
    tri1.init(segs, imagecols)
    tri1.triangulate_all(matches)
    tracks1 = tri1.compute_line_tracks()

    tri8 = GlobalLineTriangulator(cfg)
    tri8.init(segs, imagecols)
    tri8.triangulate_all_mesh(matches, make_mesh(8))
    tracks8 = tri8.compute_line_tracks()

    # per-node device results agree bitwise-or-nearly between the two
    # execution paths (same kernel, different partitioning)
    tri1._sync_host()
    tri8._sync_host()
    assert np.allclose(tri1.best_score, tri8.best_score, atol=1e-4)
    assert np.array_equal(tri1.valid_edge_cnt, tri8.valid_edge_cnt)

    s1 = _support_map(tracks1)
    s8 = _support_map(tracks8)
    assert len(s8) >= 0.999 * len(s1)
    # grouping agreement: supports sharing a track in one path share
    # one in the other
    agree = mismatch = 0
    for t in tracks1:
        present = [(int(i), int(l)) for i, l in
                   zip(t.image_id_list, t.line_id_list) if (int(i),
                                                            int(l)) in s8]
        if len(present) < 2:
            continue
        labels = [s8[s] for s in present]
        most = max(labels.count(x) for x in set(labels))
        agree += most
        mismatch += len(labels) - most
    assert agree / max(agree + mismatch, 1) >= 0.999


def _ba_problem(n_tracks=64, n_views=6, seed=3):
    import __graft_entry__ as g
    from limap_tpu.base import CameraViewsBatch, Segments
    from limap_tpu.base.infinite_line import MinimalInfiniteLines3d
    from limap_tpu.optimize.line_ba import pack_minimal_lines

    kvec, qvecs, tvecs, img_index, l2d, ps, pe = g._synthetic_problem(
        n_tracks=n_tracks, n_views=n_views, seed=seed)
    nv = qvecs.shape[0]
    S = img_index.shape[1]
    line_params = pack_minimal_lines(
        MinimalInfiniteLines3d.from_segments(
            Segments(jnp.asarray(ps), jnp.asarray(pe))))
    rng = np.random.default_rng(seed + 1)
    pose_params = jnp.asarray(np.concatenate(
        [qvecs, tvecs], axis=1).astype(np.float32))
    gt_pts = rng.normal(size=(n_tracks, 3)).astype(np.float32)
    gt_pts[:, 2] += 8
    pi = np.tile(np.arange(nv), (n_tracks, 1)).astype(np.int32)[:, :S]
    vbp = CameraViewsBatch(
        jnp.asarray(np.tile(kvec, (n_tracks, S, 1))),
        jnp.asarray(qvecs)[pi], jnp.asarray(tvecs)[pi])
    p2d = vbp.project(jnp.asarray(gt_pts)[:, None, :])
    state = HybridBAState(line_params, jnp.asarray(gt_pts), pose_params,
                          jnp.asarray([[500.0, 500.0]], jnp.float32))
    line_data = (jnp.asarray(np.tile(kvec, (n_tracks, S, 1))),
                 jnp.zeros((n_tracks, S), jnp.int32),
                 jnp.asarray(img_index), l2d.start, l2d.end,
                 jnp.ones((n_tracks, S), jnp.float32))
    point_data = (jnp.asarray(np.tile(kvec, (n_tracks, S, 1))),
                  jnp.zeros((n_tracks, S), jnp.int32), jnp.asarray(pi),
                  p2d, jnp.ones((n_tracks, S), jnp.float32))
    return state, line_data, point_data, nv


def test_distributed_ba_trajectory_matches_single_device():
    state, line_data, point_data, nv = _ba_problem()

    def run(n_dev, iters=10):
        mesh = make_mesh(n_dev)
        step = make_hybrid_ba_step(mesh, nv, 1, HybridBAOptions())
        s = state
        costs = []
        for _ in range(iters):
            s, cost = step(s, line_data, point_data)
            costs.append(float(cost))
        return np.asarray(costs), s

    costs1, s1 = run(1)
    costs8, s8 = run(8)
    # identical LM trajectory up to collective reassociation (psum
    # order differs across shardings): tight relative agreement while
    # the cost is meaningful, absolute agreement relative to the
    # initial cost once both have converged to the f32 noise floor
    assert np.allclose(costs1, costs8, rtol=5e-3,
                       atol=1e-5 * costs1[0]), (costs1, costs8)
    assert np.allclose(np.asarray(s1.pose_params),
                       np.asarray(s8.pose_params), atol=1e-4)
    assert np.allclose(np.asarray(s1.line_params),
                       np.asarray(s8.line_params), atol=1e-3)
    # and the optimization actually descends
    assert costs1[-1] < costs1[0]


def _ragged_scene(rng, n_views=48, n_lines=600, n_points=200):
    """Production-scale RAGGED problem: variable supports per track
    (3..10 of the views), TWO cameras with different intrinsics, masked
    padding — the shapes the uniform-dense trajectory test above never
    exercises (VERDICT r4 weak #7)."""
    from scipy.spatial.transform import Rotation

    from limap_tpu.base.linetrack import LineTrack
    from limap_tpu.structures.pl_bipartite import PointTrack

    K1 = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    K2 = np.array([[650.0, 0, 400], [0, 650.0, 300], [0, 0, 1]])
    cams = {0: Camera(K=K1, hw=(480, 640), cam_id=0),
            1: Camera(K=K2, hw=(600, 800), cam_id=1)}
    Ks = [K1, K2]
    gt_images, noisy_images = {}, {}
    Rs, ts, cam_of = [], [], []
    for k in range(n_views):
        R = Rotation.from_rotvec(rng.normal(size=3) * 0.03).as_matrix()
        t = np.array([0.25 * k, 0.05 * (k % 5), 0.01 * k])
        cam_id = k % 2
        Rs.append(R)
        ts.append(t)
        cam_of.append(cam_id)
        gt_images[k] = CameraImage(cam_id, CameraPose(R=R, tvec=t))
        if k <= 1:
            noisy_images[k] = CameraImage(cam_id, CameraPose(R=R, tvec=t))
        else:
            Rn = Rotation.from_rotvec(
                rng.normal(size=3) * 0.003).as_matrix() @ R
            tn = t + rng.normal(size=3) * 0.008
            noisy_images[k] = CameraImage(cam_id,
                                          CameraPose(R=Rn, tvec=tn))
    gt_ic = ImageCollection(cams, gt_images)
    noisy_ic = ImageCollection(cams, noisy_images)

    def project(p, k):
        K = Ks[cam_of[k]]
        pc = Rs[k] @ p + ts[k]
        return (pc[:2] / pc[2]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]

    gt_s = rng.normal(size=(n_lines, 3)) * 3
    gt_s[:, 2] += 10
    gt_e = gt_s + rng.normal(size=(n_lines, 3))
    linetracks = []
    for li in range(n_lines):
        n_sup = int(rng.integers(3, 11))
        sup = rng.choice(n_views, size=n_sup, replace=False)
        l2ds = [np.stack([project(gt_s[li], k), project(gt_e[li], k)])
                for k in sup]
        linetracks.append(LineTrack(
            line=np.stack([gt_s[li], gt_e[li]]),
            image_id_list=[int(k) for k in sup],
            line_id_list=list(range(n_sup)),
            line2d_list=l2ds,
            line3d_list=[np.stack([gt_s[li], gt_e[li]])] * n_sup,
            score_list=[1.0] * n_sup))

    gt_p = rng.normal(size=(n_points, 3)) * 3
    gt_p[:, 2] += 10
    pointtracks = []
    for pi in range(n_points):
        n_sup = int(rng.integers(2, 9))
        sup = rng.choice(n_views, size=n_sup, replace=False)
        pt = PointTrack(gt_p[pi])
        for k in sup:
            pt.image_id_list.append(int(k))
            pt.p2d_list.append(project(gt_p[pi], int(k)))
        pointtracks.append(pt)
    return gt_ic, noisy_ic, pointtracks, linetracks


def test_ragged_multicamera_hybrid_ba_parity_at_scale():
    """8-device == 1-device through the high-level front door
    (solve_hybrid_bundle_adjustment) on a ragged 48-view/600-track/
    2-camera problem, and the joint BA improves the noisy poses."""
    from limap_tpu.parallel import solve_hybrid_bundle_adjustment
    from limap_tpu.util.evaluation import eval_imagecols

    rng = np.random.default_rng(7)
    gt_ic, noisy_ic, pointtracks, linetracks = _ragged_scene(rng)

    def run(n_dev):
        return solve_hybrid_bundle_adjustment(
            noisy_ic, pointtracks, linetracks,
            HybridBAOptions(n_fixed_poses=2), mesh=make_mesh(n_dev),
            n_iterations=8)

    ic1, pts1, lt1, costs1 = run(1)
    ic8, pts8, lt8, costs8 = run(8)

    costs1 = np.asarray(costs1)
    costs8 = np.asarray(costs8)
    # The INITIAL cost must agree to f32 reassociation noise; the LM
    # trajectories themselves cannot match step-for-step on a ragged
    # ill-conditioned problem (the damped normal equations have
    # cond ~ 1/damping, so f32 psum-order noise perturbs each solve by
    # ~cond * eps ~ 1e-3 relative — enough to flip accept/reject).
    # What IS mesh-invariant is the optimum: both runs must converge
    # to the same poses/points.
    assert np.isclose(costs1[0], costs8[0], rtol=1e-5)
    assert costs1[-1] < 1e-4 * costs1[0]
    assert costs8[-1] < 1e-4 * costs8[0]
    for img_id in gt_ic.get_img_ids():
        p1 = ic1.images[img_id].pose
        p8 = ic8.images[img_id].pose
        assert np.allclose(p1.qvec, p8.qvec, atol=3e-4), img_id
        assert np.allclose(p1.tvec, p8.tvec, atol=3e-3), img_id
    np.testing.assert_allclose(np.asarray(pts1), np.asarray(pts8),
                               atol=5e-3)

    # descent + pose improvement vs GT
    assert costs1[-1] < costs1[0]
    te0, re0 = eval_imagecols(noisy_ic, gt_ic)
    te1, re1 = eval_imagecols(ic1, gt_ic)
    assert np.median(te1) < np.median(te0)
    assert np.median(re1) < np.median(re0)
