"""Production-scale multi-chip parity (VERDICT r3 item 5).

(a) image-sharded ``triangulate_all_mesh`` over the 8-device virtual
    mesh reproduces the single-device ``triangulate_all`` result on the
    64-view x 800-line x 20-neighbor scene;
(b) 10 iterations of the distributed hybrid BA on an 8-device mesh
    match the 1-device LM trajectory to tolerance.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from limap_tpu.base.camera import Camera, CameraPose
from limap_tpu.base.image_collection import CameraImage, ImageCollection
from limap_tpu.parallel import (HybridBAOptions, HybridBAState,
                                make_hybrid_ba_step, make_mesh)
from limap_tpu.triangulation.triangulator import (GlobalLineTriangulator,
                                                  TriangulatorConfig)
from tests.test_parity_production_scale import K, build_scene

pytestmark = pytest.mark.slow


def _support_map(tracks):
    out = {}
    for t_id, t in enumerate(tracks):
        for img, lid in zip(t.image_id_list, t.line_id_list):
            out[(int(img), int(lid))] = t_id
    return out


def test_sharded_triangulation_matches_single_device_at_scale():
    views, segs, matches = build_scene()
    cams = {0: Camera(K=K, hw=(480, 640), cam_id=0)}
    images = {i: CameraImage(0, CameraPose(R=v[1], tvec=v[2]))
              for i, v in views.items()}
    imagecols = ImageCollection(cams, images)
    cfg = TriangulatorConfig(max_tris_per_node=64)

    tri1 = GlobalLineTriangulator(cfg)
    tri1.init(segs, imagecols)
    tri1.triangulate_all(matches)
    tracks1 = tri1.compute_line_tracks()

    tri8 = GlobalLineTriangulator(cfg)
    tri8.init(segs, imagecols)
    tri8.triangulate_all_mesh(matches, make_mesh(8))
    tracks8 = tri8.compute_line_tracks()

    # per-node device results agree bitwise-or-nearly between the two
    # execution paths (same kernel, different partitioning)
    tri1._sync_host()
    tri8._sync_host()
    assert np.allclose(tri1.best_score, tri8.best_score, atol=1e-4)
    assert np.array_equal(tri1.valid_edge_cnt, tri8.valid_edge_cnt)

    s1 = _support_map(tracks1)
    s8 = _support_map(tracks8)
    assert len(s8) >= 0.999 * len(s1)
    # grouping agreement: supports sharing a track in one path share
    # one in the other
    agree = mismatch = 0
    for t in tracks1:
        present = [(int(i), int(l)) for i, l in
                   zip(t.image_id_list, t.line_id_list) if (int(i),
                                                            int(l)) in s8]
        if len(present) < 2:
            continue
        labels = [s8[s] for s in present]
        most = max(labels.count(x) for x in set(labels))
        agree += most
        mismatch += len(labels) - most
    assert agree / max(agree + mismatch, 1) >= 0.999


def _ba_problem(n_tracks=64, n_views=6, seed=3):
    import __graft_entry__ as g
    from limap_tpu.base import CameraViewsBatch, Segments
    from limap_tpu.base.infinite_line import MinimalInfiniteLines3d
    from limap_tpu.optimize.line_ba import pack_minimal_lines

    kvec, qvecs, tvecs, img_index, l2d, ps, pe = g._synthetic_problem(
        n_tracks=n_tracks, n_views=n_views, seed=seed)
    nv = qvecs.shape[0]
    S = img_index.shape[1]
    line_params = pack_minimal_lines(
        MinimalInfiniteLines3d.from_segments(
            Segments(jnp.asarray(ps), jnp.asarray(pe))))
    rng = np.random.default_rng(seed + 1)
    pose_params = jnp.asarray(np.concatenate(
        [qvecs, tvecs], axis=1).astype(np.float32))
    gt_pts = rng.normal(size=(n_tracks, 3)).astype(np.float32)
    gt_pts[:, 2] += 8
    pi = np.tile(np.arange(nv), (n_tracks, 1)).astype(np.int32)[:, :S]
    vbp = CameraViewsBatch(
        jnp.asarray(np.tile(kvec, (n_tracks, S, 1))),
        jnp.asarray(qvecs)[pi], jnp.asarray(tvecs)[pi])
    p2d = vbp.project(jnp.asarray(gt_pts)[:, None, :])
    state = HybridBAState(line_params, jnp.asarray(gt_pts), pose_params,
                          jnp.asarray([[500.0, 500.0]], jnp.float32))
    line_data = (jnp.asarray(np.tile(kvec, (n_tracks, S, 1))),
                 jnp.zeros((n_tracks, S), jnp.int32),
                 jnp.asarray(img_index), l2d.start, l2d.end,
                 jnp.ones((n_tracks, S), jnp.float32))
    point_data = (jnp.asarray(np.tile(kvec, (n_tracks, S, 1))),
                  jnp.zeros((n_tracks, S), jnp.int32), jnp.asarray(pi),
                  p2d, jnp.ones((n_tracks, S), jnp.float32))
    return state, line_data, point_data, nv


def test_distributed_ba_trajectory_matches_single_device():
    state, line_data, point_data, nv = _ba_problem()

    def run(n_dev, iters=10):
        mesh = make_mesh(n_dev)
        step = make_hybrid_ba_step(mesh, nv, 1, HybridBAOptions())
        s = state
        costs = []
        for _ in range(iters):
            s, cost = step(s, line_data, point_data)
            costs.append(float(cost))
        return np.asarray(costs), s

    costs1, s1 = run(1)
    costs8, s8 = run(8)
    # identical LM trajectory up to collective reassociation (psum
    # order differs across shardings): tight relative agreement while
    # the cost is meaningful, absolute agreement relative to the
    # initial cost once both have converged to the f32 noise floor
    assert np.allclose(costs1, costs8, rtol=5e-3,
                       atol=1e-5 * costs1[0]), (costs1, costs8)
    assert np.allclose(np.asarray(s1.pose_params),
                       np.asarray(s8.pose_params), atol=1e-4)
    assert np.allclose(np.asarray(s1.line_params),
                       np.asarray(s8.line_params), atol=1e-3)
    # and the optimization actually descends
    assert costs1[-1] < costs1[0]
