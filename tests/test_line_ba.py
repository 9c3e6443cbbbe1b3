"""BA round-trip tests: perturb GT lines, refine with fixed cameras,
verify convergence back to GT (the reference's unit_test.py strategy of
pose/track perturbation, base/unit_test.py:6-44)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from limap_tpu.base import CameraViewsBatch, Segments
from limap_tpu.base import line_geometry as lg
from limap_tpu.base.camera import Camera, CameraPose, CameraView
from limap_tpu.base.linetrack import LineTrack, tracks_to_batch
from limap_tpu.optimize import (LineBAConfig, get_output_tracks,
                                solve_line_bundle_adjustment)
from limap_tpu.optimize.residuals import line_geometric_residual
from limap_tpu.base.infinite_line import MinimalInfiniteLines3d


def build_tracks(rng, n_views=6, n_tracks=8, noise3d=0.05):
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    views = []
    for k in range(n_views):
        aa = rng.normal(size=3) * 0.08
        R = Rotation.from_rotvec(aa).as_matrix()
        t = np.array([0.6 * k, 0.03 * k, 0.01 * k])
        views.append(CameraView(Camera(K=K, hw=(480, 640)),
                                CameraPose(R=R, tvec=t)))
    vb = CameraViewsBatch.from_views(views)

    gt_start = rng.normal(size=(n_tracks, 3)).astype(np.float32)
    gt_start[:, 2] += 8
    gt_end = gt_start + rng.normal(size=(n_tracks, 3)).astype(np.float32)
    gt = Segments(jnp.asarray(gt_start), jnp.asarray(gt_end))

    # 2D observations in every view (exact projections of GT)
    tracks = []
    for ti in range(n_tracks):
        seg = Segments(gt.start[ti][None].repeat(n_views, 0),
                       gt.end[ti][None].repeat(n_views, 0))
        l2d = lg.project_segments(seg, vb)
        l2s = np.asarray(l2d.start)
        l2e = np.asarray(l2d.end)
        # perturbed initial 3D line
        p_start = gt_start[ti] + rng.normal(size=3) * noise3d
        p_end = gt_end[ti] + rng.normal(size=3) * noise3d
        tr = LineTrack(
            line=np.stack([p_start, p_end]),
            image_id_list=list(range(n_views)),
            line_id_list=[ti] * n_views,
            line2d_list=[np.stack([l2s[v], l2e[v]]) for v in range(n_views)],
            line3d_list=[np.stack([p_start, p_end])] * n_views,
            score_list=[1.0] * n_views,
        )
        tracks.append(tr)
    id2idx = {i: i for i in range(n_views)}
    return tracks, id2idx, vb, gt


def mean_residual(batch, views, lines: MinimalInfiniteLines3d):
    sup_views = views.select(batch.img_index)
    r = line_geometric_residual(lines.uvec[:, None], lines.wvec[:, None],
                                sup_views, batch.line2d)
    r = jnp.where(batch.mask[..., None], r, 0.0)
    return float(jnp.sum(jnp.abs(r)) / jnp.sum(batch.mask) / 2)


@pytest.mark.slow
def test_line_ba_converges_to_gt(rng):
    tracks, id2idx, vb, gt = build_tracks(rng)
    batch = tracks_to_batch(tracks, id2idx)

    init_lines = MinimalInfiniteLines3d.from_segments(batch.line)
    err_before = mean_residual(batch, vb, init_lines)

    refined, result = solve_line_bundle_adjustment(
        batch, vb, LineBAConfig(loss="trivial"), num_iterations=25)
    err_after = mean_residual(batch, vb, refined)

    assert err_before > 1.0       # perturbation visibly off (pixels)
    assert err_after < 0.05       # converged to subpixel
    assert float(jnp.sum(result.cost)) < float(jnp.sum(result.cost0)) * 1e-3

    # re-trimmed output close to GT segments
    out = get_output_tracks(batch, vb, refined, num_outliers=2)
    for ti in range(len(tracks)):
        s = np.asarray(out.line.start[ti])
        e = np.asarray(out.line.end[ti])
        gs = np.asarray(gt.start[ti])
        ge = np.asarray(gt.end[ti])
        d = min(np.linalg.norm(s - gs) + np.linalg.norm(e - ge),
                np.linalg.norm(s - ge) + np.linalg.norm(e - gs))
        assert d < 0.05


@pytest.mark.slow
def test_line_ba_respects_min_num_images(rng):
    tracks, id2idx, vb, gt = build_tracks(rng, n_views=3, n_tracks=4)
    batch = tracks_to_batch(tracks, id2idx)
    # min_num_images=4 > 3 views -> all constant, zero accepted steps
    refined, result = solve_line_bundle_adjustment(
        batch, vb, LineBAConfig(min_num_images=4), num_iterations=5)
    init = MinimalInfiniteLines3d.from_segments(batch.line)
    np.testing.assert_allclose(np.asarray(refined.uvec),
                               np.asarray(init.uvec), atol=1e-6)


def test_line_ba_robust_to_outlier_support(rng):
    tracks, id2idx, vb, gt = build_tracks(rng, n_views=8, noise3d=0.03)
    # corrupt one 2D support of track 0 heavily
    tracks[0].line2d_list[0] = tracks[0].line2d_list[0] + 80.0
    batch = tracks_to_batch(tracks, id2idx)
    refined, _ = solve_line_bundle_adjustment(
        batch, vb, LineBAConfig(loss="cauchy", loss_scale=0.25),
        num_iterations=30)
    out = get_output_tracks(batch, vb, refined)
    s = np.asarray(out.line.start[0])
    e = np.asarray(out.line.end[0])
    gs, ge = np.asarray(gt.start[0]), np.asarray(gt.end[0])
    d = min(np.linalg.norm(s - gs) + np.linalg.norm(e - ge),
            np.linalg.norm(s - ge) + np.linalg.norm(e - gs))
    assert d < 0.2  # robust loss keeps the outlier from dragging the line
