"""Tests for aggregation, fitting, and fitnmerge track building on a
synthetic multi-view scene with GT depth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from limap_tpu.base import CameraViewsBatch, LineLinker, Segments
from limap_tpu.base import line_geometry as lg
from limap_tpu.base.camera import Camera, CameraPose, CameraView
from limap_tpu.base.linetrack import tracks_to_batch
from limap_tpu.fitting import fit_lines_ransac
from limap_tpu.merging import (aggregate_tracks, filter_tracks_by_reprojection,
                               merge_to_linetracks, remerge,
                               set_uncertainty_segs3d)


def test_aggregate_small_track_takes_best():
    # 3 supports -> take-best-score branch
    start = jnp.asarray([[[0.0, 0, 0], [0.1, 0, 0], [5.0, 5, 5]]])
    end = jnp.asarray([[[1.0, 0, 0], [1.1, 0, 0], [6.0, 5, 5]]])
    seg = Segments(start, end,
                   uncertainty=jnp.asarray([[0.5, 0.2, 0.9]]))
    scores = jnp.asarray([[0.3, 0.9, 0.1]])
    mask = jnp.asarray([[True, True, False]])
    out = aggregate_tracks(seg, scores, mask, num_outliers=0)
    np.testing.assert_allclose(np.asarray(out.start[0]), [0.1, 0, 0],
                               atol=1e-5)
    assert abs(float(out.uncertainty[0]) - 0.2) < 1e-5


def test_aggregate_tls_branch(rng):
    # 6 noisy collinear supports -> TLS branch recovers the axis
    t0 = rng.uniform(0, 0.3, size=(6, 1))
    t1 = rng.uniform(0.7, 1.0, size=(6, 1))
    axis = np.array([1.0, 2.0, -1.0])
    axis /= np.linalg.norm(axis)
    base_pt = np.array([3.0, 0.0, 1.0])
    noise = rng.normal(size=(6, 3)) * 1e-3
    starts = base_pt + t0 * axis * 10 + noise
    ends = base_pt + t1 * axis * 10 + noise
    seg = Segments(jnp.asarray(starts[None], jnp.float32),
                   jnp.asarray(ends[None], jnp.float32))
    scores = jnp.ones((1, 6))
    mask = jnp.ones((1, 6), bool)
    out = aggregate_tracks(seg, scores, mask, num_outliers=2)
    d = np.array(out.end[0] - out.start[0])
    d /= np.linalg.norm(d)
    assert abs(abs(d @ axis) - 1.0) < 1e-3


@pytest.mark.slow
def test_fit_lines_ransac(rng):
    # 3 segments: clean line, line with outliers, pure noise
    S = 64
    t = np.linspace(0, 1, S)[:, None]
    line_pts = np.array([0.0, 0, 5]) + t * np.array([2.0, 1.0, 0.0])
    noisy = line_pts.copy()
    noisy[::4] += rng.normal(size=(S // 4, 3)) * 2.0  # 25% outliers
    junk = rng.normal(size=(S, 3)) * 3.0
    points = jnp.asarray(np.stack([line_pts, noisy, junk]), jnp.float32)
    valid = jnp.ones((3, S), bool)
    th = jnp.full((3,), 0.05)
    out = fit_lines_ransac(points, valid, th, jax.random.PRNGKey(0),
                           n_hypotheses=64, min_inlier_ratio=0.6)
    s = np.asarray(out.score)
    assert s[0] > 0.95
    assert s[1] > 0.6
    assert s[2] <= 0  # rejected
    d = np.array(out.end[0] - out.start[0])
    d /= np.linalg.norm(d)
    ref = np.array([2.0, 1.0, 0.0])
    ref /= np.linalg.norm(ref)
    assert abs(abs(d @ ref) - 1.0) < 1e-4


def make_scene(rng, n_views=4, n_lines=6):
    """GT 3D lines observed in all views; returns per-image 2D/3D segs."""
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    views = []
    for k in range(n_views):
        aa = rng.normal(size=3) * 0.05
        R = Rotation.from_rotvec(aa).as_matrix()
        t = np.array([0.8 * k, 0.02 * k, 0.0])
        views.append(CameraView(Camera(K=K, hw=(480, 640)),
                                CameraPose(R=R, tvec=t)))
    batch = CameraViewsBatch.from_views(views)

    gt_start = rng.normal(size=(n_lines, 3)).astype(np.float32)
    gt_start[:, 2] += 8
    gt_end = gt_start + rng.normal(size=(n_lines, 3)).astype(np.float32)
    gt = Segments(jnp.asarray(gt_start), jnp.asarray(gt_end))

    # per image: 3D segs = GT + small noise; 2D segs = projections
    l3_start = np.repeat(gt_start[None], n_views, 0)
    l3_end = np.repeat(gt_end[None], n_views, 0)
    # noise must stay within the linker's depth-scaled innerseg threshold
    # (th_innerseg * uncertainty ~= 0.02 * var2d * depth / f)
    l3_start += rng.normal(size=l3_start.shape).astype(np.float32) * 2e-4
    l3_end += rng.normal(size=l3_end.shape).astype(np.float32) * 2e-4
    l3d = Segments(jnp.asarray(l3_start), jnp.asarray(l3_end))

    vb = CameraViewsBatch(batch.kvec[:, None], batch.qvec[:, None],
                          batch.tvec[:, None])
    l2d = lg.project_segments(l3d, vb)
    return views, batch, gt, l2d, l3d


def test_merge_to_linetracks(rng):
    n_views, n_lines = 4, 6
    views, batch, gt, l2d, l3d = make_scene(rng, n_views, n_lines)
    vb = CameraViewsBatch(batch.kvec[:, None], batch.qvec[:, None],
                          batch.tvec[:, None])
    l3d = set_uncertainty_segs3d(l3d, vb, var2d=15.0)
    mask = jnp.ones((n_views, n_lines), bool)
    # all views neighbor each other
    nbrs = np.stack([np.setdiff1d(np.arange(n_views), [i])
                     for i in range(n_views)])
    tracks = merge_to_linetracks(
        l2d, l3d, mask, batch, jnp.asarray(nbrs, jnp.int32),
        jnp.ones_like(jnp.asarray(nbrs), bool), LineLinker())
    # each GT line should produce one track with n_views supports
    assert len(tracks) == n_lines
    for tr in tracks:
        assert tr.count_images() == n_views
        # aggregate close to a GT line (endpoint order is arbitrary)
        def seg_dist(i):
            s, e = np.asarray(gt.start[i]), np.asarray(gt.end[i])
            d1 = (np.linalg.norm(tr.line[0] - s)
                  + np.linalg.norm(tr.line[1] - e))
            d2 = (np.linalg.norm(tr.line[0] - e)
                  + np.linalg.norm(tr.line[1] - s))
            return min(d1, d2)
        assert min(seg_dist(i) for i in range(n_lines)) < 0.05


@pytest.mark.slow
def test_filter_and_remerge(rng):
    n_views, n_lines = 4, 5
    views, batch, gt, l2d, l3d = make_scene(rng, n_views, n_lines)
    vb = CameraViewsBatch(batch.kvec[:, None], batch.qvec[:, None],
                          batch.tvec[:, None])
    l3d = set_uncertainty_segs3d(l3d, vb, var2d=15.0)
    mask = jnp.ones((n_views, n_lines), bool)
    nbrs = np.stack([np.setdiff1d(np.arange(n_views), [i])
                     for i in range(n_views)])
    tracks = merge_to_linetracks(
        l2d, l3d, mask, batch, jnp.asarray(nbrs, jnp.int32),
        jnp.ones_like(jnp.asarray(nbrs), bool), LineLinker())
    id2idx = {i: i for i in range(n_views)}

    tb = tracks_to_batch(tracks, id2idx)
    tb2 = filter_tracks_by_reprojection(tb, batch, 10.0, 5.0)
    # clean scene: nothing should be dropped
    assert int(jnp.sum(tb2.track_mask)) == len(tracks)
    assert int(jnp.sum(tb2.mask)) == int(jnp.sum(tb.mask))

    # remerge should keep track count stable on a clean scene
    from limap_tpu.base.line_linker import LineLinker3dConfig
    merged = remerge(tracks, batch, id2idx, LineLinker3dConfig())
    assert len(merged) == len(tracks)


@pytest.mark.slow
def test_merging_strategies(rng):
    """avg/exhaustive strategies reject merges across distant lines."""
    from limap_tpu.base.line_linker import LineLinker3dConfig
    from limap_tpu.merging.strategies import (compute_track_labels_avg,
                                              compute_track_labels_exhaustive)
    # 4 nodes: two parallel overlapping pairs offset by 5 in y; a
    # spurious edge connects the two groups (the avgtest linker must
    # reject it: same direction + overlap but perp distance 5 >> th)
    node_lines = np.array([
        [[0, 0, 0], [1, 0, 0]], [[0.001, 0, 0], [1.001, 0, 0]],
        [[0, 5, 0], [1, 5, 0]], [[0.001, 5, 0], [1.001, 5, 0]],
    ])
    edges = np.array([[0, 1], [2, 3], [1, 2]])
    scores = np.array([1.0, 1.0, 0.9])
    image_idx = np.arange(4)
    cfg = LineLinker3dConfig(th_perp=0.1)
    for fn in (compute_track_labels_avg, compute_track_labels_exhaustive):
        labels = fn(edges, scores, node_lines, image_idx, cfg)
        assert labels[0] == labels[1]
        assert labels[2] == labels[3]
        assert labels[0] != labels[2], fn.__name__
