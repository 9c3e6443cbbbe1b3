"""Distributed hybrid BA on the virtual 8-device CPU mesh: perturb poses
AND lines (AND points), run sharded GN steps, verify joint convergence
for the dense and the matrix-free CG reduced-camera solvers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from limap_tpu.base import CameraViewsBatch, Segments
from limap_tpu.base import line_geometry as lg
from limap_tpu.base.infinite_line import MinimalInfiniteLines3d
from limap_tpu.base.pose import axis_angle_to_quat, quat_multiply
from limap_tpu.optimize.line_ba import pack_minimal_lines
from limap_tpu.parallel import (HybridBAOptions, HybridBAState, make_mesh,
                                make_hybrid_ba_step)


def build_problem(rng, n_views=6, n_tracks=16, n_points=16,
                  pose_noise=0.01, line_noise=0.02, point_noise=0.05):
    fx = 500.0
    kvec = np.array([fx, fx, 320.0, 240.0], np.float32)
    qvecs, tvecs = [], []
    for k in range(n_views):
        aa = rng.normal(size=3) * 0.05
        R = Rotation.from_rotvec(aa).as_matrix()
        q = Rotation.from_matrix(R).as_quat()[[3, 0, 1, 2]]
        qvecs.append(q)
        tvecs.append(np.array([0.5 * k, 0.02 * k, 0.0]))
    qvecs = np.asarray(qvecs, np.float32)
    tvecs = np.asarray(tvecs, np.float32)

    gt_start = rng.normal(size=(n_tracks, 3)).astype(np.float32)
    gt_start[:, 2] += 8
    gt_end = gt_start + rng.normal(size=(n_tracks, 3)).astype(np.float32)
    gt = Segments(jnp.asarray(gt_start), jnp.asarray(gt_end))

    # observations: project GT lines with GT poses
    S = n_views
    img_index = np.tile(np.arange(n_views), (n_tracks, 1)).astype(np.int32)
    vb = CameraViewsBatch(jnp.asarray(np.tile(kvec, (n_tracks, S, 1))),
                          jnp.asarray(qvecs)[img_index],
                          jnp.asarray(tvecs)[img_index])
    seg = Segments(gt.start[:, None].repeat(S, 1),
                   gt.end[:, None].repeat(S, 1))
    l2d = lg.project_segments(seg, vb)

    # GT points + their projections
    gt_pts = rng.normal(size=(n_points, 3)).astype(np.float32)
    gt_pts[:, 2] += 8
    pi = np.tile(np.arange(n_views), (n_points, 1)).astype(np.int32)
    vbp = CameraViewsBatch(jnp.asarray(np.tile(kvec, (n_points, S, 1))),
                           jnp.asarray(qvecs)[pi],
                           jnp.asarray(tvecs)[pi])
    p2d = vbp.project(jnp.asarray(gt_pts)[:, None, :])

    # perturb poses (except gauge-fixed pose 0), lines, points
    pq = qvecs.copy()
    pt = tvecs.copy()
    for k in range(1, n_views):
        dq = np.asarray(axis_angle_to_quat(
            jnp.asarray(rng.normal(size=3) * pose_noise, jnp.float32)))
        pq[k] = np.asarray(quat_multiply(jnp.asarray(dq),
                                         jnp.asarray(pq[k])))
        pt[k] = pt[k] + rng.normal(size=3) * pose_noise * 5
    pert_lines = Segments(
        gt.start + rng.normal(size=(n_tracks, 3)).astype(np.float32)
        * line_noise,
        gt.end + rng.normal(size=(n_tracks, 3)).astype(np.float32)
        * line_noise)
    pert_pts = gt_pts + rng.normal(size=(n_points, 3)).astype(np.float32) \
        * point_noise

    line_params = pack_minimal_lines(
        MinimalInfiniteLines3d.from_segments(pert_lines))
    pose_params = jnp.asarray(
        np.concatenate([pq, pt], axis=1).astype(np.float32))
    cam_fxfy = jnp.asarray([[fx, fx]], jnp.float32)

    weight = np.ones((n_tracks, S), np.float32)
    kv_l = jnp.asarray(np.tile(kvec, (n_tracks, S, 1)))
    ci_l = jnp.zeros((n_tracks, S), jnp.int32)
    line_data = (kv_l, ci_l, jnp.asarray(img_index),
                 l2d.start, l2d.end, jnp.asarray(weight))
    kv_p = jnp.asarray(np.tile(kvec, (n_points, S, 1)))
    ci_p = jnp.zeros((n_points, S), jnp.int32)
    point_data = (kv_p, ci_p, jnp.asarray(pi), p2d,
                  jnp.ones((n_points, S), jnp.float32))
    state = HybridBAState(line_params, jnp.asarray(pert_pts),
                          pose_params, cam_fxfy)
    return (state, line_data, point_data, n_views,
            (qvecs, tvecs, gt_pts))


@pytest.mark.slow
def test_sharded_hybrid_ba_converges(rng):
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    state, ldata, pdata, n_views, gt_all = build_problem(rng)
    mesh = make_mesh(8)
    opts = HybridBAOptions(loss="trivial", damping=1e-4)
    step = make_hybrid_ba_step(mesh, n_views, 1, opts)

    costs = []
    for _ in range(25):
        state, cost = step(state, ldata, pdata)
        costs.append(float(cost))
    assert costs[-1] < costs[0] * 1e-6

    # poses recovered up to the global scale gauge (monocular BA cannot
    # observe absolute scale even with points — structure and
    # translations scale together)
    gt_q, gt_t, gt_pts = gt_all
    out = np.asarray(state.pose_params)
    ts = out[:, 4:7]
    scale = float(np.sum(ts * gt_t) / max(np.sum(ts * ts), 1e-12))
    for k in range(n_views):
        q = out[k, :4] / np.linalg.norm(out[k, :4])
        dq = abs(float(np.dot(q, gt_q[k] / np.linalg.norm(gt_q[k]))))
        assert dq > 0.99999, f"pose {k} rotation off"
        assert np.linalg.norm(scale * ts[k] - gt_t[k]) < 5e-3
    # points recovered in the same gauge
    assert np.abs(scale * np.asarray(state.point_params)
                  - gt_pts).max() < 5e-2


@pytest.mark.slow
def test_cg_solver_matches_dense(rng):
    """The matrix-free CG path converges like the dense Schur solve."""
    state, ldata, pdata, n_views, _ = build_problem(rng, n_tracks=8,
                                                    n_points=8)
    dense = make_hybrid_ba_step(
        make_mesh(8), n_views, 1,
        HybridBAOptions(loss="trivial", damping=1e-4, solver="dense"))
    cg = make_hybrid_ba_step(
        make_mesh(8), n_views, 1,
        HybridBAOptions(loss="trivial", damping=1e-4, solver="cg",
                        cg_iters=80))
    sd, cd0 = dense(state, ldata, pdata)
    sc, cc0 = cg(state, ldata, pdata)
    assert abs(float(cd0) - float(cc0)) < 1e-3 * max(1.0, float(cd0))
    for _ in range(15):
        sd, cd = dense(sd, ldata, pdata)
        sc, cc = cg(sc, ldata, pdata)
    assert float(cd) < float(cd0) * 1e-5
    assert float(cc) < float(cc0) * 1e-4


def test_constancy_flags(rng):
    state, ldata, pdata, n_views, _ = build_problem(rng, n_tracks=8,
                                                    n_points=8)
    step = make_hybrid_ba_step(
        make_mesh(8), n_views, 1,
        HybridBAOptions(loss="trivial", constant_pose=True,
                        constant_point=True))
    s1, _ = step(state, ldata, pdata)
    assert np.allclose(np.asarray(s1.pose_params),
                       np.asarray(state.pose_params))
    assert np.allclose(np.asarray(s1.point_params),
                       np.asarray(state.point_params))
    # lines still move
    assert not np.allclose(np.asarray(s1.line_params),
                           np.asarray(state.line_params))


@pytest.mark.slow
def test_optimize_focal_recovers_scale(rng):
    """A global focal perturbation is corrected when optimize_focal is
    on (points provide the absolute constraint)."""
    state, ldata, pdata, n_views, _ = build_problem(
        rng, n_tracks=8, n_points=24, pose_noise=0.0, line_noise=0.0,
        point_noise=0.0)
    bad = state._replace(cam_fxfy=state.cam_fxfy * 1.02)
    step = make_hybrid_ba_step(
        make_mesh(8), n_views, 1,
        HybridBAOptions(loss="trivial", damping=1e-4,
                        optimize_focal=True))
    s = bad
    for _ in range(20):
        s, cost = step(s, ldata, pdata)
    assert abs(float(s.cam_fxfy[0, 0]) - 500.0) < 1.0
    assert float(cost) < 1e-4
