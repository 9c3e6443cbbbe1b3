import numpy as np

from limap_tpu.structures import (PL_Bipartite2d, PL_Bipartite2dConfig,
                                  compute_2d_bipartites_from_points)


def test_keypoint_attachment():
    bpt = PL_Bipartite2d(PL_Bipartite2dConfig(threshold_keypoints=2.0))
    segs = np.array([[0.0, 0, 100, 0], [0.0, 10, 100, 10]])
    bpt.init_lines(segs)
    pts = np.array([[50.0, 1.0], [50.0, 5.0], [50.0, 9.5]])
    bpt.add_keypoints_with_point3D_ids(pts, [7, 8, 9])
    assert bpt.count_points() == 3
    assert bpt.neighbor_lines(0) == [0]      # near line 0
    assert bpt.neighbor_lines(1) == []       # in between
    assert bpt.neighbor_lines(2) == [1]      # near line 1
    assert sorted(bpt.neighbor_points(0)) == [0]
    assert bpt.point(0).point3D_id == 7


def test_intersections():
    bpt = PL_Bipartite2d()
    segs = np.array([[0.0, 0, 100, 100], [0.0, 100, 100, 0],
                     [200.0, 200, 300, 200]])
    bpt.init_lines(segs)
    juncs = bpt.compute_intersections()
    assert len(juncs) == 1
    np.testing.assert_allclose(juncs[0].p, [50, 50], atol=1e-3)
    assert sorted(juncs[0].line_ids) == [0, 1]


def test_builder(rng):
    segs = {0: np.array([[0.0, 0, 100, 0, 1.0]])}
    p2d = {0: np.array([[50.0, 0.5, 3], [50.0, 50.0, 4]])}
    p3d = {3: {"xyz": np.array([1.0, 2, 3]), "image_ids": [0]},
           4: {"xyz": np.array([4.0, 5, 6]), "image_ids": [0]}}
    bpts, sfm_points = compute_2d_bipartites_from_points(p3d, p2d, segs)
    assert bpts[0].count_points() == 2
    assert bpts[0].neighbor_points(0) == [0]
    np.testing.assert_allclose(sfm_points[3], [1, 2, 3])
