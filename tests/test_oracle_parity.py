"""Parity of the TPU triangulator vs the f64 reference-semantics oracle.

The reference cannot be built in this environment (its CMake FetchContent
needs network), so the oracle (limap_tpu/testing/reference_oracle.py) is
the executable stand-in for reference behavior: a per-object f64 NumPy
transcription of the cited C++ (proposal -> score -> filter -> cluster ->
aggregate).  These tests check (a) micro-parity of individual geometric
kernels and (b) end-to-end track parity on a noisy synthetic scene,
which backs BASELINE.md's "recall within 2%" target.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from limap_tpu.base import line_linker as ll
from limap_tpu.base.camera import Camera, CameraPose, CameraViewsBatch
from limap_tpu.base.image_collection import CameraImage, ImageCollection
from limap_tpu.base.lines import Segments
from limap_tpu.testing import reference_oracle as oracle
from limap_tpu.triangulation import functions as trifun
from limap_tpu.triangulation.triangulator import (GlobalLineTriangulator,
                                                  TriangulatorConfig)

K = np.array([[600.0, 0, 320], [0, 620.0, 240], [0, 0, 1]])


def make_views(rng, n_views):
    views = {}
    for k in range(n_views):
        R = Rotation.from_rotvec(rng.normal(size=3) * 0.08).as_matrix()
        t = np.array([0.8 * k, 0.06 * k, 0.03 * k]) + rng.normal(size=3) * 0.02
        views[k] = oracle.OracleView(K, R, t)
    return views


def to_imagecols(views):
    cams = {0: Camera(K=K, hw=(480, 640), cam_id=0)}
    images = {i: CameraImage(0, CameraPose(R=v.R, tvec=v.t))
              for i, v in views.items()}
    return ImageCollection(cams, images)


def single_view_batch(view):
    ic = to_imagecols({0: view})
    vb = ic.batch()
    return vb.select(jnp.zeros((1,), jnp.int32))


def make_gt_lines(rng, n_lines):
    start = rng.normal(size=(n_lines, 3))
    start[:, 2] += 9.0
    end = start + rng.normal(size=(n_lines, 3)) * 1.5
    return np.stack([start, end], axis=1)  # [N, 2, 3]


def project_all(views, gt, noise, rng):
    segs = {}
    for i, v in views.items():
        out = np.zeros((len(gt), 4))
        for n, seg in enumerate(gt):
            s = v.project(seg[0]) + rng.normal(size=2) * noise
            e = v.project(seg[1]) + rng.normal(size=2) * noise
            out[n] = [s[0], s[1], e[0], e[1]]
        segs[i] = out
    return segs


# ------------------------------------------------------------ micro parity


@pytest.mark.slow
def test_epipolar_iou_matches_oracle(rng):
    views = make_views(rng, 2)
    gt = make_gt_lines(rng, 16)
    segs = project_all(views, gt, 0.5, rng)
    v1 = single_view_batch(views[0])
    v2 = single_view_batch(views[1])
    for n in range(len(gt)):
        for m in range(len(gt)):
            ref = oracle.epipolar_iou(segs[0][n].reshape(2, 2), views[0],
                                      segs[1][m].reshape(2, 2), views[1])
            l1 = Segments(jnp.asarray(segs[0][n, :2])[None],
                          jnp.asarray(segs[0][n, 2:])[None])
            l2 = Segments(jnp.asarray(segs[1][m, :2])[None],
                          jnp.asarray(segs[1][m, 2:])[None])
            got = float(trifun.compute_epipolar_iou(l1, v1, l2, v2)[0])
            assert got == pytest.approx(ref, abs=2e-3), (n, m)


def test_algebraic_triangulation_matches_oracle(rng):
    views = make_views(rng, 2)
    gt = make_gt_lines(rng, 12)
    segs = project_all(views, gt, 0.3, rng)
    v1 = single_view_batch(views[0])
    v2 = single_view_batch(views[1])
    n_checked = 0
    for n in range(len(gt)):
        seg3d, depths, ok = oracle.algebraic_triangulation(
            segs[0][n].reshape(2, 2), views[0],
            segs[1][n].reshape(2, 2), views[1])
        l1 = Segments(jnp.asarray(segs[0][n, :2])[None],
                      jnp.asarray(segs[0][n, 2:])[None])
        l2 = Segments(jnp.asarray(segs[1][n, :2])[None],
                      jnp.asarray(segs[1][n, 2:])[None])
        tri = trifun.triangulate_line_algebraic(l1, v1, l2, v2)
        assert bool(tri.score[0] > 0) == ok
        if ok:
            got = np.concatenate([np.asarray(tri.start[0]),
                                  np.asarray(tri.end[0])])
            want = seg3d.reshape(-1)
            scale = max(1.0, np.abs(want).max())
            np.testing.assert_allclose(got, want, atol=2e-3 * scale)
            n_checked += 1
    assert n_checked >= 8


def test_linker_scores_match_oracle(rng):
    """2D and 3D linker scores (all terms) vs the oracle on random pairs."""
    cfg2_o = oracle.Linker2dCfg(th_angle=5.0, th_perp=2.0, th_overlap=0.05)
    cfg2_r = ll.LineLinker2dConfig(th_angle=5.0, th_perp=2.0, th_overlap=0.05)
    for _ in range(200):
        a = rng.normal(size=(2, 2)) * 30 + 100
        b = a + rng.normal(size=(2, 2)) * rng.choice([0.5, 3.0, 20.0])
        ref = oracle.linker2d_score(a, b, cfg2_o)
        l1 = Segments(jnp.asarray(a[0])[None], jnp.asarray(a[1])[None])
        l2 = Segments(jnp.asarray(b[0])[None], jnp.asarray(b[1])[None])
        got = float(ll.score_2d(l1, l2, cfg2_r)[0])
        assert got == pytest.approx(ref, abs=2e-3)

    cfg3_o = oracle.Linker3dCfg(th_angle=10.0, th_overlap=0.05,
                                th_smartoverlap=0.1, th_smartangle=2.0,
                                th_perp=1.0, th_innerseg=1.0)
    cfg3_r = ll.LineLinker3dConfig(th_angle=10.0, th_overlap=0.05,
                                   th_smartoverlap=0.1, th_smartangle=2.0,
                                   th_perp=1.0, th_innerseg=1.0)
    spatial_o = cfg3_o.spatial_merging()
    for _ in range(200):
        a = rng.normal(size=(2, 3)) * 2
        b = a + rng.normal(size=(2, 3)) * rng.choice([0.005, 0.05, 0.5])
        unc = (0.5 + rng.random(), 0.5 + rng.random())
        ref = oracle.linker3d_score(a, b, spatial_o, unc[0], unc[1])
        l1 = Segments(jnp.asarray(a[0])[None], jnp.asarray(a[1])[None],
                      uncertainty=jnp.asarray([unc[0]]))
        l2 = Segments(jnp.asarray(b[0])[None], jnp.asarray(b[1])[None],
                      uncertainty=jnp.asarray([unc[1]]))
        got = float(ll.score_3d(l1, l2, cfg3_r)[0])
        assert got == pytest.approx(ref, abs=2e-3)


def test_aggregator_matches_oracle(rng):
    from limap_tpu.merging.aggregator import aggregate_tracks
    lines = [rng.normal(size=(2, 3)) + [0, 0, 5] for _ in range(8)]
    scores = list(rng.random(8))
    ref = oracle.aggregate_line3d_list(lines, scores, num_outliers=2)
    arr = np.stack(lines)  # [S, 2, 3]
    seg = Segments(jnp.asarray(arr[None, :, 0]), jnp.asarray(arr[None, :, 1]))
    out = aggregate_tracks(seg, jnp.asarray(scores)[None],
                           jnp.ones((1, 8), bool), 2)
    got = np.stack([np.asarray(out.start[0]), np.asarray(out.end[0])])
    # direction sign of the SVD axis is arbitrary: compare both orders
    d1 = min(np.abs(got - ref).max(), np.abs(got - ref[::-1]).max())
    assert d1 < 1e-4


# ------------------------------------------------------- end-to-end parity


def test_track_parity_vs_oracle(rng):
    """Full pipeline vs oracle on a noisy scene with distractor matches.

    Gate: >= 98% of oracle support assignments are reproduced
    (BASELINE.md: recall within 2% of the reference).
    """
    n_views, n_lines = 6, 14
    views = make_views(rng, n_views)
    gt = make_gt_lines(rng, n_lines)
    segs = project_all(views, gt, 0.4, rng)

    # matches: GT one-to-one + a few wrong distractors per pair
    matches = {}
    for i in range(n_views):
        matches[i] = {}
        for j in range(n_views):
            if i == j:
                continue
            good = np.stack([np.arange(n_lines), np.arange(n_lines)], 1)
            k = 4
            bad = np.stack([rng.integers(0, n_lines, k),
                            rng.integers(0, n_lines, k)], 1)
            matches[i][j] = np.concatenate([good, bad])

    ocfg = oracle.OracleConfig(
        min_length_2d=0.0, line_tri_angle_threshold=1.0,
        fullscore_th=1.0, min_num_outer_edges=0,
        linker2d=oracle.Linker2dCfg(th_angle=5.0, th_perp=2.0,
                                    th_overlap=0.05),
        linker3d=oracle.Linker3dCfg(th_angle=10.0, th_overlap=0.05,
                                    th_smartoverlap=0.1, th_smartangle=2.0,
                                    th_perp=1.0, th_innerseg=1.0,
                                    th_scaleinv=0.015))
    otri = oracle.OracleTriangulator(views, {i: s.reshape(-1, 2, 2)
                                             for i, s in segs.items()}, ocfg)
    for i in range(n_views):
        otri.triangulate_image(i, matches[i])
    otracks = otri.compute_line_tracks()

    imagecols = to_imagecols(views)
    rcfg = TriangulatorConfig(max_tris_per_node=32)
    rtri = GlobalLineTriangulator(rcfg)
    rtri.init(segs, imagecols)
    for i in range(n_views):
        rtri.triangulate_image(i, matches[i])
    rtracks = rtri.compute_line_tracks()

    # compare support coverage: each oracle support (img, line) should be
    # in some repo track together with the rest of its oracle track
    o_support = {}
    for t_id, t in enumerate(otracks):
        for s in t.supports:
            o_support[s] = t_id
    r_support = {}
    for t_id, t in enumerate(rtracks):
        for img, lid in zip(t.image_id_list, t.line_id_list):
            r_support[(int(img), int(lid))] = t_id

    total = len(o_support)
    assert total > 0
    hit = sum(1 for s in o_support if s in r_support)
    assert hit / total >= 0.98, f"support recall {hit}/{total}"

    # grouping agreement: supports in the same oracle track land in the
    # same repo track
    agree = mismatch = 0
    for t in otracks:
        present = [s for s in t.supports if s in r_support]
        if len(present) < 2:
            continue
        labels = [r_support[s] for s in present]
        most = max(labels.count(x) for x in set(labels))
        agree += most
        mismatch += len(labels) - most
    assert agree / max(agree + mismatch, 1) >= 0.98

    # aggregated 3D lines agree within tolerance for matched tracks
    for t in otracks:
        present = [s for s in t.supports if s in r_support]
        if len(present) < 2:
            continue
        r_id = max(set(r_support[s] for s in present),
                   key=lambda x: sum(1 for s in present
                                     if r_support[s] == x))
        rline = np.asarray(rtracks[r_id].line, np.float64).reshape(2, 3)
        d = min(np.abs(rline - t.line).max(),
                np.abs(rline - t.line[::-1]).max())
        assert d < 0.15, d
