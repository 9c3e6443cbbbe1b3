"""End-to-end synthetic test of the global triangulator: GT 3D lines,
multiple views, perfect matches -> recovered tracks."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from limap_tpu.base import CameraViewsBatch, Segments
from limap_tpu.base import line_geometry as lg
from limap_tpu.base.camera import Camera, CameraPose, CameraView
from limap_tpu.base.image_collection import CameraImage, ImageCollection
from limap_tpu.triangulation.triangulator import (GlobalLineTriangulator,
                                                  TriangulatorConfig)


def build_scene(rng, n_views=5, n_lines=10):
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    cams = {0: Camera(K=K, hw=(480, 640), cam_id=0)}
    images = {}
    for k in range(n_views):
        aa = rng.normal(size=3) * 0.06
        R = Rotation.from_rotvec(aa).as_matrix()
        t = np.array([0.7 * k, 0.05 * k, 0.02 * k])
        images[k] = CameraImage(0, CameraPose(R=R, tvec=t))
    imagecols = ImageCollection(cams, images)
    vb = imagecols.batch()

    gt_start = rng.normal(size=(n_lines, 3)).astype(np.float32)
    gt_start[:, 2] += 9
    gt_end = gt_start + rng.normal(size=(n_lines, 3)).astype(np.float32)
    gt = Segments(jnp.asarray(gt_start), jnp.asarray(gt_end))

    all_2d_segs = {}
    for k in range(n_views):
        v = vb.select(jnp.full((n_lines,), k, jnp.int32))
        l2d = lg.project_segments(gt, v)
        segs = np.concatenate([np.asarray(l2d.start), np.asarray(l2d.end)],
                              axis=1)
        all_2d_segs[k] = segs
    return imagecols, gt, all_2d_segs


def perfect_matches(n_views, n_lines):
    m = np.stack([np.arange(n_lines), np.arange(n_lines)], axis=1)
    return {i: {j: m for j in range(n_views) if j != i}
            for i in range(n_views)}


def test_triangulator_recovers_gt_tracks(rng):
    n_views, n_lines = 5, 10
    imagecols, gt, segs = build_scene(rng, n_views, n_lines)
    cfg = TriangulatorConfig(fullscore_th=0.5, max_tris_per_node=16)
    tri = GlobalLineTriangulator(cfg)
    tri.init(segs, imagecols)
    matches = perfect_matches(n_views, n_lines)
    for img_id in imagecols.get_img_ids():
        tri.triangulate_image(img_id, matches[img_id])
    tracks = tri.compute_line_tracks()

    assert len(tracks) == n_lines
    covered = np.zeros(n_lines, bool)
    for tr in tracks:
        # a support may be culled by sensitivity/degeneracy tests, but
        # tracks must keep near-full coverage
        assert tr.count_images() >= n_views - 1
        best, best_i = 1e9, -1
        for i in range(n_lines):
            s, e = np.asarray(gt.start[i]), np.asarray(gt.end[i])
            d1 = (np.linalg.norm(tr.line[0] - s)
                  + np.linalg.norm(tr.line[1] - e))
            d2 = (np.linalg.norm(tr.line[0] - e)
                  + np.linalg.norm(tr.line[1] - s))
            if min(d1, d2) < best:
                best, best_i = min(d1, d2), i
        assert best < 0.1
        covered[best_i] = True
    assert covered.all()


def test_triangulator_rejects_bad_matches(rng):
    n_views, n_lines = 4, 8
    imagecols, gt, segs = build_scene(rng, n_views, n_lines)
    cfg = TriangulatorConfig(fullscore_th=0.5, max_tris_per_node=16)
    tri = GlobalLineTriangulator(cfg)
    tri.init(segs, imagecols)
    # shuffle matches for image pairs (wrong correspondences)
    rng2 = np.random.default_rng(1)
    matches = perfect_matches(n_views, n_lines)
    for i in matches:
        for j in matches[i]:
            m = matches[i][j].copy()
            m[:, 1] = rng2.permutation(m[:, 1])
            matches[i][j] = m
    for img_id in imagecols.get_img_ids():
        tri.triangulate_image(img_id, matches[img_id])
    tracks = tri.compute_line_tracks()
    # wrong matches should yield far fewer / no consistent tracks
    n_good = sum(1 for tr in tracks if tr.count_images() >= 3)
    assert n_good < n_lines // 2


def test_triangulator_exhaustive(rng):
    n_views, n_lines = 4, 6
    imagecols, gt, segs = build_scene(rng, n_views, n_lines)
    cfg = TriangulatorConfig(fullscore_th=0.5, max_tris_per_node=32)
    tri = GlobalLineTriangulator(cfg)
    tri.init(segs, imagecols)
    for img_id in imagecols.get_img_ids():
        ngs = [j for j in imagecols.get_img_ids() if j != img_id]
        tri.triangulate_image_exhaustive(img_id, ngs)
    tracks = tri.compute_line_tracks()
    assert len(tracks) >= n_lines * 0.8


def test_triangulate_all_matches_per_image(rng):
    """The batched triangulate_all path produces the same tracks as the
    per-image path."""
    n_views, n_lines = 5, 10
    imagecols, gt, segs = build_scene(rng, n_views, n_lines)
    cfg = TriangulatorConfig(fullscore_th=0.5, max_tris_per_node=16)
    matches = perfect_matches(n_views, n_lines)

    tri1 = GlobalLineTriangulator(cfg)
    tri1.init(segs, imagecols)
    for img_id in imagecols.get_img_ids():
        tri1.triangulate_image(img_id, matches[img_id])
    tracks1 = tri1.compute_line_tracks()

    tri2 = GlobalLineTriangulator(cfg)
    tri2.init(segs, imagecols)
    tri2.triangulate_all(matches, group_size=3)
    tracks2 = tri2.compute_line_tracks()

    assert len(tracks1) == len(tracks2)
    np.testing.assert_allclose(tri1.best_score, tri2.best_score, atol=1e-4)
    lines1 = sorted(tuple(np.round(t.line.ravel(), 3)) for t in tracks1)
    lines2 = sorted(tuple(np.round(t.line.ravel(), 3)) for t in tracks2)
    assert lines1 == lines2
