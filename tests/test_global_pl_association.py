"""Global point-line association: noisy lines + associated points pull
each other into consistency."""

import jax.numpy as jnp
import numpy as np

from limap_tpu.base.linetrack import tracks_to_batch
from limap_tpu.optimize.global_pl_association import (GlobalAssociator,
                                                      GlobalAssociatorConfig)
from limap_tpu.structures import PointTrack
from tests.test_line_ba import build_tracks


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
