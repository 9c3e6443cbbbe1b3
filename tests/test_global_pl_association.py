"""Global point-line association: noisy lines + associated points pull
each other into consistency."""

import jax.numpy as jnp
import numpy as np
import pytest

from limap_tpu.base.linetrack import tracks_to_batch
from limap_tpu.optimize.global_pl_association import (GlobalAssociator,
                                                      GlobalAssociatorConfig)
from limap_tpu.structures import PointTrack
from tests.test_line_ba import build_tracks


@pytest.mark.slow
def test_global_association_improves_geometry(rng):
    tracks, id2idx, vb, gt = build_tracks(rng, n_views=6, n_tracks=6,
                                          noise3d=0.05)
    batch = tracks_to_batch(tracks, id2idx)

    # point tracks: GT points ON the gt lines (midpoints), exact 2D obs
    pts = []
    import limap_tpu.base.line_geometry as lg
    from limap_tpu.base import CameraViewsBatch
    for ti in range(6):
        p = 0.5 * (np.asarray(gt.start[ti]) + np.asarray(gt.end[ti]))
        obs = []
        for v in range(6):
            view = vb.select(v)
            p2 = np.asarray(view.project(jnp.asarray(p, jnp.float32)))
            obs.append(p2)
        pts.append(PointTrack(p + rng.normal(size=3) * 0.02,
                              image_id_list=list(range(6)),
                              p2d_list=obs))

    assoc = GlobalAssociator(GlobalAssociatorConfig(
        loss="trivial", th_weight_pointline=1.0, n_bcd_rounds=2))

    class FakeCols:
        def batch(self):
            return vb

        def img_id_to_index(self):
            return {i: i for i in range(6)}

    assoc.init_imagecols(FakeCols())
    assoc.init_line_tracks(batch)
    assoc.init_point_tracks(pts, max_supports=8)
    assoc.init_vp_tracks([])
    # point i associates with line i
    assoc.set_pointline_weights({(i, i): 5.0 for i in range(6)})

    line_params, points, vps = assoc.solve()

    # refined lines close to GT infinite lines
    out = assoc.get_output_lines()
    for ti in range(6):
        s = np.asarray(out.line.start[ti])
        e = np.asarray(out.line.end[ti])
        gs, ge = np.asarray(gt.start[ti]), np.asarray(gt.end[ti])
        d_gt = (ge - gs) / np.linalg.norm(ge - gs)
        perp = np.linalg.norm(
            (s - gs) - ((s - gs) @ d_gt) * d_gt)
        assert perp < 0.02
    # points projected errors small
    err = np.linalg.norm(np.asarray(points)
                         - np.stack([0.5 * (np.asarray(gt.start[i])
                                            + np.asarray(gt.end[i]))
                                     for i in range(6)]), axis=1)
    assert err.max() < 0.02

    # hard association output keeps the diagonal pairs
    bpt = assoc.get_bipartite3d_pointline()
    for i in range(6):
        assert i in bpt.neighbor_points(i)


def test_vp_orthogonality_squares_up():
    """Two near-orthogonal VPs (89 deg apart) move toward 90 deg when
    the orthogonality residual is active (global_associator.cc:265-283).
    Each VP is anchored by member lines so only the pair term bends."""
    from limap_tpu.optimize.global_pl_association import GlobalAssociator

    cfg = GlobalAssociatorConfig(lw_vp_orthogonality=1.0,
                                 th_angle_orthogonality=87.0,
                                 lw_vpline_association=1e-3)
    assoc = GlobalAssociator(cfg)
    a = np.radians(89.0)
    vps = np.array([[1.0, 0.0, 0.0],
                    [np.cos(a), np.sin(a), 0.0]], np.float64)
    # two member lines per VP, exactly along each VP direction
    d_np = np.array([vps[0], vps[0], vps[1], vps[1]], np.float64)
    lv_pairs = {(0, 0): 1.0, (1, 0): 1.0, (2, 1): 1.0, (3, 1): 1.0}
    pairs_orth, pairs_coll = assoc._vp_pairs(vps)
    assert pairs_orth == [(0, 1)] and pairs_coll == []
    out = assoc._vp_pair_refine(vps, d_np, lv_pairs, pairs_orth,
                                pairs_coll)
    ang0 = np.degrees(np.arccos(abs(vps[0] @ vps[1])))
    ang1 = np.degrees(np.arccos(
        min(abs(float(out[0] @ out[1])), 1.0)))
    assert abs(ang1 - 90.0) < abs(ang0 - 90.0) * 0.2, (ang0, ang1)


def test_junction_reassociation():
    """Crossing line tracks seen in >= th images gain a 3D junction
    point track (ReassociateJunctions, global_associator.cc:42-174)."""
    from limap_tpu.structures import PL_Bipartite2d

    # two orthogonal 3D lines crossing at (0, 0, 5)
    line1 = np.array([[-1.0, 0.0, 5.0], [1.0, 0.0, 5.0]])
    line2 = np.array([[0.0, -1.0, 5.0], [0.0, 1.0, 5.0]])

    class _Track:
        def __init__(self, line):
            self.line = line

    linetracks = [_Track(line1), _Track(line2)]

    all_bpt2ds = {}
    line_track_of_2d = {}
    for img in range(3):
        bpt = PL_Bipartite2d()
        # 2D segments crossing at (100, 100)
        segs = np.array([[50.0, 100.0, 150.0, 100.0],
                         [100.0, 50.0, 100.0, 150.0]])
        bpt.init_lines(segs)
        bpt.add_keypoints_with_point3D_ids(
            np.array([[100.0, 100.0]]), [-1])
        all_bpt2ds[img] = bpt
        line_track_of_2d[img] = {0: 0, 1: 1}
        assert bpt.pdegree(0) == 2, bpt.pdegree(0)

    assoc = GlobalAssociator(GlobalAssociatorConfig(th_count_lineline=3))
    assoc.points = jnp.zeros((0, 3))
    new_tracks, new_weights = assoc.reassociate_junctions(
        all_bpt2ds, line_track_of_2d, linetracks)
    assert len(new_tracks) == 1
    assert np.allclose(new_tracks[0].p, [0.0, 0.0, 5.0], atol=1e-6)
    assert new_weights == {(0, 0): 3.0, (0, 1): 3.0}
    # 2D bipartite points now reference the new 3D junction
    assert all_bpt2ds[0].point(0).point3D_id == 0
