"""Synthetic ground-truth tests for two-view triangulation primitives."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from limap_tpu.base import CameraViewsBatch, InfiniteLines3d, Segments
from limap_tpu.base import line_geometry as lg
from limap_tpu.base.camera import Camera, CameraPose, CameraView
from limap_tpu.triangulation import functions as trifun


def synthetic_pair(rng, n=16):
    """n random 3D segments viewed by two cameras; returns projected 2D
    segments + batched views broadcast to [n]."""
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    views = []
    for k in range(2):
        aa = rng.normal(size=3) * 0.1
        R = Rotation.from_rotvec(aa).as_matrix()
        t = np.array([k * 1.5, 0.1 * k, 0.0]) + rng.normal(size=3) * 0.05
        views.append(CameraView(Camera(K=K, hw=(480, 640)),
                                CameraPose(R=R, tvec=t)))
    batch = CameraViewsBatch.from_views(views)

    start = rng.normal(size=(n, 3)).astype(np.float32)
    start[:, 2] += 8.0
    end = start + rng.normal(size=(n, 3)).astype(np.float32)
    seg3d = Segments(jnp.asarray(start), jnp.asarray(end))

    v1 = batch.select(jnp.zeros(n, jnp.int32))
    v2 = batch.select(jnp.ones(n, jnp.int32))
    l1 = lg.project_segments(seg3d, v1)
    l2 = lg.project_segments(seg3d, v2)
    return seg3d, l1, v1, l2, v2


def test_epipolar_iou_true_matches(rng):
    seg3d, l1, v1, l2, v2 = synthetic_pair(rng)
    iou = np.asarray(trifun.compute_epipolar_iou(l1, v1, l2, v2))
    assert np.all(iou > 0.85) and np.median(iou) > 0.95


def test_epipolar_iou_wrong_matches_lower(rng):
    seg3d, l1, v1, l2, v2 = synthetic_pair(rng, n=16)
    perm = np.roll(np.arange(16), 1)
    l2_wrong = l2.select(jnp.asarray(perm))
    iou_true = np.asarray(trifun.compute_epipolar_iou(l1, v1, l2, v2))
    iou_wrong = np.asarray(trifun.compute_epipolar_iou(l1, v1, l2_wrong, v2))
    assert iou_wrong.mean() < iou_true.mean()


def test_triangulate_point(rng):
    seg3d, l1, v1, l2, v2 = synthetic_pair(rng)
    p, ok = trifun.triangulate_point(l1.start, v1, l2.start, v2)
    assert np.all(np.asarray(ok))
    np.testing.assert_allclose(np.asarray(p), np.asarray(seg3d.start),
                               atol=5e-2)


def test_algebraic_triangulation_recovers(rng):
    seg3d, l1, v1, l2, v2 = synthetic_pair(rng)
    out = trifun.triangulate_line_algebraic(l1, v1, l2, v2)
    assert np.all(np.asarray(out.score) > 0)
    np.testing.assert_allclose(np.asarray(out.start),
                               np.asarray(seg3d.start), atol=0.1)
    np.testing.assert_allclose(np.asarray(out.end),
                               np.asarray(seg3d.end), atol=0.1)
    # depths populated
    z = np.asarray(v1.projdepth(seg3d.start))
    np.testing.assert_allclose(np.asarray(out.depths[:, 0]), z, atol=0.05)


def test_endpoint_triangulation_recovers(rng):
    seg3d, l1, v1, l2, v2 = synthetic_pair(rng)
    out = trifun.triangulate_line_by_endpoints(l1, v1, l2, v2)
    assert np.all(np.asarray(out.score) > 0)
    np.testing.assert_allclose(np.asarray(out.start),
                               np.asarray(seg3d.start), atol=0.1)


def test_triangulate_with_infinite_line(rng):
    seg3d, l1, v1, l2, v2 = synthetic_pair(rng)
    inf = InfiniteLines3d.from_segments(seg3d)
    out = trifun.triangulate_line_with_infinite_line(l1, v1, inf)
    assert np.all(np.asarray(out.score) > 0)
    np.testing.assert_allclose(np.asarray(out.start),
                               np.asarray(seg3d.start), atol=0.05)
    np.testing.assert_allclose(np.asarray(out.end),
                               np.asarray(seg3d.end), atol=0.05)


def test_triangulate_with_direction(rng):
    seg3d, l1, v1, l2, v2 = synthetic_pair(rng)
    direction = seg3d.direction()
    out = trifun.triangulate_line_with_direction(l1, v1, l2, v2, direction)
    ok = np.asarray(out.score) > 0
    assert ok.mean() > 0.7  # some configs are legitimately degenerate
    np.testing.assert_allclose(np.asarray(out.start)[ok],
                               np.asarray(seg3d.start)[ok], atol=0.15)


@pytest.mark.slow
def test_triangulate_with_one_point(rng):
    seg3d, l1, v1, l2, v2 = synthetic_pair(rng, n=12)
    midpoint = seg3d.midpoint()
    out = trifun.triangulate_line_with_one_point(l1, v1, l2, v2, midpoint)
    ok = np.asarray(out.score) > 0
    assert ok.mean() > 0.8
    # recovered endpoints close to truth (exact point + exact plane)
    err_s = np.linalg.norm(
        np.asarray(out.start) - np.asarray(seg3d.start), axis=-1)
    err_e = np.linalg.norm(
        np.asarray(out.end) - np.asarray(seg3d.end), axis=-1)
    assert np.median(err_s[ok]) < 0.1
    assert np.median(err_e[ok]) < 0.1


def test_range_filter():
    seg = Segments(jnp.asarray([[0.0, 0, 0], [5.0, 5, 5]]),
                   jnp.asarray([[1.0, 1, 1], [6.0, 6, 6]]))
    ranges = (jnp.asarray([-1.0, -1, -1]), jnp.asarray([2.0, 2, 2]))
    ok = np.asarray(trifun.test_line_inside_ranges(seg, ranges))
    np.testing.assert_array_equal(ok, [True, False])
