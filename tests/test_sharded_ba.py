"""Distributed hybrid BA on the virtual 8-device CPU mesh: perturb poses
AND lines, run sharded GN steps, verify joint convergence."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from limap_tpu.base import CameraViewsBatch, Segments
from limap_tpu.base import line_geometry as lg
from limap_tpu.base.infinite_line import MinimalInfiniteLines3d
from limap_tpu.base.pose import axis_angle_to_quat, quat_multiply
from limap_tpu.optimize.line_ba import pack_minimal_lines
from limap_tpu.parallel import (HybridBAOptions, HybridBAState, make_mesh,
                                make_hybrid_ba_step)


def build_problem(rng, n_views=6, n_tracks=16, pose_noise=0.01,
                  line_noise=0.02):
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

    # perturb poses (except gauge-fixed pose 0) and lines
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

    line_params = pack_minimal_lines(
        MinimalInfiniteLines3d.from_segments(pert_lines))
    pose_params = jnp.asarray(
        np.concatenate([pq, pt], axis=1).astype(np.float32))

    weight = np.ones((n_tracks, S), np.float32)
    data = (jnp.asarray(np.tile(kvec, (n_tracks, S, 1))),
            jnp.asarray(img_index),
            l2d.start, l2d.end, jnp.asarray(weight))
    return (HybridBAState(line_params, pose_params), data, n_views,
            (qvecs, tvecs))


def test_sharded_hybrid_ba_converges(rng):
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    state, data, n_views, gt_poses = build_problem(rng)
    mesh = make_mesh(8)
    opts = HybridBAOptions(loss="trivial", damping=1e-4)
    step = make_hybrid_ba_step(mesh, n_views, opts)

    costs = []
    for _ in range(25):
        state, cost = step(state, data)
        costs.append(float(cost))
    assert costs[-1] < costs[0] * 1e-6

    # recovered poses close to GT (up to the global scale gauge, which
    # line-only monocular BA cannot observe)
    gt_q, gt_t = gt_poses
    out = np.asarray(state.pose_params)
    ts = out[:, 4:7]
    scale = float(np.sum(ts * gt_t) / max(np.sum(ts * ts), 1e-12))
    for k in range(n_views):
        q = out[k, :4] / np.linalg.norm(out[k, :4])
        dq = abs(float(np.dot(q, gt_q[k] / np.linalg.norm(gt_q[k]))))
        assert dq > 0.99999, f"pose {k} rotation off"
        assert np.linalg.norm(scale * ts[k] - gt_t[k]) < 1e-3


def test_sharded_ba_matches_single_device(rng):
    """1-device and 8-device runs assemble the same reduced system (up
    to f32 rounding) and both converge; exact per-step parameter parity
    is not required because the Schur system is near-singular along the
    scale gauge, which amplifies rounding differences."""
    state, data, n_views, _ = build_problem(rng, n_tracks=8)
    opts = HybridBAOptions(loss="trivial", damping=1e-4)
    step8 = make_hybrid_ba_step(make_mesh(8), n_views, opts)
    step1 = make_hybrid_ba_step(make_mesh(1), n_views, opts)
    s8, c8_first = step8(state, data)
    s1, c1_first = step1(state, data)
    assert abs(float(c8_first) - float(c1_first)) \
        < 1e-3 * max(1.0, float(c1_first))
    for _ in range(15):
        s8, c8 = step8(s8, data)
        s1, c1 = step1(s1, data)
    assert float(c8) < float(c8_first) * 1e-5
    assert float(c1) < float(c1_first) * 1e-5
