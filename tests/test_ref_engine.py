"""The C++ baseline engine reproduces the f64 oracle's tracks.

The C++ engine (limap_tpu/cpp/ref_engine.cpp) is the wall-clock stand-in
for the unbuildable reference; the oracle (reference_oracle.py) is its
semantic stand-in.  If they agree on track structure, timing the C++
engine is timing reference semantics.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from limap_tpu.testing import reference_oracle as oracle
from limap_tpu.testing import ref_engine

K = np.array([[600.0, 0, 320], [0, 620.0, 240], [0, 0, 1]])


def build_scene(seed=3, n_views=6, n_lines=20, noise=0.4):
    rng = np.random.default_rng(seed)
    views = {}
    for k in range(n_views):
        R = Rotation.from_rotvec(rng.normal(size=3) * 0.08).as_matrix()
        t = np.array([0.8 * k, 0.06 * k, 0.03 * k]) + rng.normal(size=3) * 0.02
        views[k] = oracle.OracleView(K, R, t)
    start = rng.normal(size=(n_lines, 3))
    start[:, 2] += 9.0
    end = start + rng.normal(size=(n_lines, 3)) * 1.5
    gt = np.stack([start, end], axis=1)
    segs = {}
    for i, v in views.items():
        out = np.zeros((n_lines, 4))
        for n, seg in enumerate(gt):
            s = v.project(seg[0]) + rng.normal(size=2) * noise
            e = v.project(seg[1]) + rng.normal(size=2) * noise
            out[n] = [s[0], s[1], e[0], e[1]]
        segs[i] = out
    matches = {}
    for i in range(n_views):
        matches[i] = {}
        for j in range(n_views):
            if i == j:
                continue
            good = np.stack([np.arange(n_lines)] * 2, axis=1)
            bad = np.stack([rng.integers(0, n_lines, 4),
                            rng.integers(0, n_lines, 4)], axis=1)
            matches[i][j] = np.concatenate([good, bad])
    return views, segs, matches


def test_cpp_engine_matches_oracle_tracks():
    views, segs, matches = build_scene()

    # oracle with default config (same defaults compiled into the C++)
    otri = oracle.OracleTriangulator(
        views, {i: s.reshape(-1, 2, 2) for i, s in segs.items()},
        oracle.OracleConfig())
    for i in sorted(views):
        otri.triangulate_image(i, matches[i])
    otracks = otri.compute_line_tracks()

    result = ref_engine.run(
        {i: (v.K, v.R, v.t) for i, v in views.items()}, segs, matches,
        dump_tracks=True)

    assert result["n_tracks"] == len(otracks)
    o_sets = sorted(frozenset(t.supports) for t in otracks)
    c_sets = sorted(frozenset(map(tuple, t)) for t in result["tracks"])
    assert o_sets == c_sets


def test_cpp_engine_config_block_matches_oracle():
    """Custom (yaml-tuned) config passed via the scene file reaches the
    engine: tracks must match the oracle under the same tuning."""
    views, segs, matches = build_scene()
    ocfg = oracle.OracleConfig(
        min_length_2d=0.0, line_tri_angle_threshold=1.0,
        min_num_outer_edges=0,
        linker2d=oracle.Linker2dCfg(th_angle=5.0, th_perp=2.0,
                                    th_overlap=0.05),
        linker3d=oracle.Linker3dCfg(th_angle=10.0, th_overlap=0.05,
                                    th_smartoverlap=0.1, th_smartangle=2.0,
                                    th_perp=1.0, th_innerseg=1.0,
                                    th_scaleinv=0.015))
    otri = oracle.OracleTriangulator(
        views, {i: s.reshape(-1, 2, 2) for i, s in segs.items()}, ocfg)
    for i in sorted(views):
        otri.triangulate_image(i, matches[i])
    otracks = otri.compute_line_tracks()

    from limap_tpu.triangulation.triangulator import TriangulatorConfig
    result = ref_engine.run(
        {i: (v.K, v.R, v.t) for i, v in views.items()}, segs, matches,
        dump_tracks=True, cfg=TriangulatorConfig())

    assert result["n_tracks"] == len(otracks)
    o_sets = sorted(frozenset(t.supports) for t in otracks)
    c_sets = sorted(frozenset(map(tuple, t)) for t in result["tracks"])
    assert o_sets == c_sets


def test_cpp_engine_reports_timings():
    views, segs, matches = build_scene()
    result = ref_engine.run(
        {i: (v.K, v.R, v.t) for i, v in views.items()}, segs, matches,
        repeats=2)
    assert result["triangulate_s"] > 0
    assert result["n_tracks"] > 0
    assert result["threads"] >= 1
