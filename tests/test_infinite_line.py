import jax.numpy as jnp
import numpy as np

from limap_tpu.base import (CameraViewsBatch, InfiniteLines3d,
                            MinimalInfiniteLines3d, Segments)
from limap_tpu.base import infinite_line as il
from limap_tpu.base import line_geometry as lg
from limap_tpu.base.camera import Camera, CameraPose, CameraView


def make_views(rng, n):
    views = []
    for _ in range(n):
        K = np.array([[500.0, 0, 320], [0, 480.0, 240], [0, 0, 1]])
        aa = rng.normal(size=3) * 0.3
        from scipy.spatial.transform import Rotation
        R = Rotation.from_rotvec(aa).as_matrix()
        t = rng.normal(size=3)
        views.append(CameraView(Camera(K=K, hw=(480, 640)),
                                CameraPose(R=R, tvec=t)))
    return views


def test_plucker_roundtrip(rng):
    p = rng.normal(size=(32, 3))
    d = rng.normal(size=(32, 3))
    lines = InfiniteLines3d.from_point_direction(jnp.asarray(p),
                                                 jnp.asarray(d))
    minimal = MinimalInfiniteLines3d.from_plucker(lines)
    back = minimal.to_plucker()
    # directions match up to sign
    dd = np.abs(np.sum(np.asarray(back.d) * np.asarray(lines.d), axis=-1))
    np.testing.assert_allclose(dd, 1.0, atol=1e-4)
    # moments match (moment sign is tied to direction sign)
    sgn = np.sign(np.sum(np.asarray(back.d) * np.asarray(lines.d), -1))
    np.testing.assert_allclose(np.asarray(back.m),
                               sgn[:, None] * np.asarray(lines.m), atol=1e-3)


def test_point_projection_distance(rng):
    p = rng.normal(size=(8, 3))
    d = rng.normal(size=(8, 3))
    lines = InfiniteLines3d.from_point_direction(jnp.asarray(p),
                                                 jnp.asarray(d))
    q = rng.normal(size=(8, 3))
    proj = np.asarray(lines.point_projection(jnp.asarray(q)))
    # projected point is on the line: cross(proj - p, d) == 0
    dn = np.asarray(lines.d)
    cr = np.cross(proj - p, dn)
    np.testing.assert_allclose(cr, 0, atol=1e-4)
    # and (q - proj) is orthogonal to d
    dot = np.sum((q - proj) * dn, axis=-1)
    np.testing.assert_allclose(dot, 0, atol=1e-4)


def test_projection_consistency(rng):
    """Projected infinite line passes through the projected endpoints."""
    views = make_views(rng, 6)
    batch = CameraViewsBatch.from_views(views)
    start = rng.normal(size=(6, 3))
    end = start + rng.normal(size=(6, 3))
    # place segments in front of all cameras
    start[:, 2] += 8
    end[:, 2] += 8
    seg = Segments(jnp.asarray(start, jnp.float32),
                   jnp.asarray(end, jnp.float32))
    lines = InfiniteLines3d.from_segments(seg)
    coords = lines.projection(batch)  # [6, 3]
    seg2d = lg.project_segments(seg, batch)
    for name, p in [("start", seg2d.start), ("end", seg2d.end)]:
        d = np.asarray(il.infline2d_point_distance(coords, p))
        np.testing.assert_allclose(d, 0, atol=5e-2, err_msg=name)


def test_unprojection_inverts_projection(rng):
    views = make_views(rng, 4)
    batch = CameraViewsBatch.from_views(views)
    start = rng.normal(size=(4, 3))
    start[:, 2] += 10
    end = start + rng.normal(size=(4, 3))
    seg = Segments(jnp.asarray(start, jnp.float32),
                   jnp.asarray(end, jnp.float32))
    lines = InfiniteLines3d.from_segments(seg)
    p2d = batch.project(seg.start)
    p3d = np.asarray(lines.unprojection(p2d, batch))
    np.testing.assert_allclose(p3d, start, atol=1e-2)


def test_minimal_quaternion_projection_matches_direct(rng):
    """line_world_to_pixel == project endpoints then take homogeneous line."""
    views = make_views(rng, 5)
    batch = CameraViewsBatch.from_views(views)
    start = rng.normal(size=(5, 3))
    start[:, 2] += 6
    end = start + rng.normal(size=(5, 3))
    seg = Segments(jnp.asarray(start, jnp.float32),
                   jnp.asarray(end, jnp.float32))
    lines = InfiniteLines3d.from_segments(seg)
    coords = np.asarray(il.line_world_to_pixel(
        batch.kvec, batch.qvec, batch.tvec, lines.d, lines.m))
    seg2d = lg.project_segments(seg, batch)
    ref = np.asarray(seg2d.coords())
    # homogeneous: compare up to sign after normalization
    for i in range(5):
        a, b = coords[i], ref[i]
        if np.dot(a, b) < 0:
            b = -b
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_segment_from_infinite_line_3d(rng):
    # supports along the x-axis; trimmed union should span middle extremes
    d = jnp.asarray([1.0, 0.0, 0.0])
    line = InfiniteLines3d.from_point_direction(jnp.asarray([0.0, 0, 0]), d)
    starts = np.array([[0.0, 0, 0], [1.0, 0, 0], [-2.0, 0, 0], [9.0, 0, 0]])
    ends = np.array([[3.0, 0, 0], [5.0, 0, 0], [4.0, 0, 0], [9.5, 0, 0]])
    seg = Segments(jnp.asarray(starts, jnp.float32),
                   jnp.asarray(ends, jnp.float32))
    mask = jnp.asarray([True, True, True, False])
    out = il.segment_from_infinite_line_3d_supports(line, seg, mask,
                                                    num_outliers=1)
    # sorted valid ts: -2, 0, 1, 3, 4, 5 -> trim 1 each side: [0, 4]
    np.testing.assert_allclose(np.asarray(out.start), [0, 0, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.end), [4, 0, 0], atol=1e-4)
