"""Production-scale parity: the batched TPU triangulation path vs the
C++ reference-semantics engine on a 64-view x 800-line x 20-neighbor
scene with distractor matches (VERDICT r2 item 2 — the toy-scale parity
gate said nothing about bucket overflow or batched-path behavior).

Gates: >= 98% support recall + >= 98% grouping agreement
(BASELINE.md: recall within 2% of the reference), and the edge-overflow
telemetry is exact."""

import numpy as np
import pytest
import warnings
from scipy.spatial.transform import Rotation

import tests.conftest  # noqa: F401

from limap_tpu.base.camera import Camera, CameraPose
from limap_tpu.base.image_collection import CameraImage, ImageCollection
from limap_tpu.testing import ref_engine
from limap_tpu.triangulation.triangulator import (GlobalLineTriangulator,
                                                  TriangulatorConfig)

K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])


def build_scene(seed=0, n_views=64, n_lines=800, n_neighbors=20,
                n_distractors=6, noise=0.3):
    rng = np.random.default_rng(seed)
    Rs, ts = [], []
    for k in range(n_views):
        Rs.append(Rotation.from_rotvec(
            rng.normal(size=3) * 0.05).as_matrix())
        ts.append(np.array([0.4 * (k % 8), 0.3 * (k // 8), 0.1 * k]))
    start = rng.normal(size=(n_lines, 3)) * 3
    start[:, 2] += 12
    end = start + rng.normal(size=(n_lines, 3))

    segs = {}
    for i in range(n_views):
        pc_s = start @ Rs[i].T + ts[i]
        pc_e = end @ Rs[i].T + ts[i]
        ps = (pc_s[:, :2] / pc_s[:, 2:3]) * [K[0, 0], K[1, 1]] \
            + [K[0, 2], K[1, 2]]
        pe = (pc_e[:, :2] / pc_e[:, 2:3]) * [K[0, 0], K[1, 1]] \
            + [K[0, 2], K[1, 2]]
        ps = ps + rng.normal(size=ps.shape) * noise
        pe = pe + rng.normal(size=pe.shape) * noise
        segs[i] = np.concatenate([ps, pe], axis=1)

    half = n_neighbors // 2
    matches = {}
    for i in range(n_views):
        matches[i] = {}
        for j in range(max(0, i - half), min(n_views, i + half + 1)):
            if j == i:
                continue
            good = np.stack([np.arange(n_lines)] * 2, axis=1)
            bad = np.stack([rng.integers(0, n_lines, n_distractors),
                            rng.integers(0, n_lines, n_distractors)], 1)
            matches[i][j] = np.concatenate([good, bad])
    views = {i: (K, Rs[i], ts[i]) for i in range(n_views)}
    return views, segs, matches


@pytest.mark.slow
def test_batched_path_matches_cpp_engine_at_scale():
    views, segs, matches = build_scene()
    cfg = TriangulatorConfig(max_tris_per_node=64)

    result = ref_engine.run(views, segs, matches, dump_tracks=True,
                            cfg=cfg)

    cams = {0: Camera(K=K, hw=(480, 640), cam_id=0)}
    images = {i: CameraImage(0, CameraPose(R=v[1], tvec=v[2]))
              for i, v in views.items()}
    imagecols = ImageCollection(cams, images)
    tri = GlobalLineTriangulator(cfg)
    tri.init(segs, imagecols)
    tri.triangulate_all(matches)       # the batched production path
    assert tri.overflow_edges == 0, \
        "bucket must not silently drop edges at this scale"
    rtracks = tri.compute_line_tracks()

    r_support = {}
    for t_id, t in enumerate(rtracks):
        for img, lid in zip(t.image_id_list, t.line_id_list):
            r_support[(int(img), int(lid))] = t_id

    c_support = {}
    for t_id, sups in enumerate(result["tracks"]):
        for (img, lid) in sups:
            c_support[(img, lid)] = t_id

    total = len(c_support)
    assert total > 20000, total  # a large share of nodes in tracks
    hit = sum(1 for s in c_support if s in r_support)
    assert hit / total >= 0.98, f"support recall {hit}/{total}"

    agree = mismatch = 0
    for sups in result["tracks"]:
        present = [tuple(s) for s in sups if tuple(s) in r_support]
        if len(present) < 2:
            continue
        labels = [r_support[s] for s in present]
        most = max(labels.count(x) for x in set(labels))
        agree += most
        mismatch += len(labels) - most
    assert agree / max(agree + mismatch, 1) >= 0.98


def test_overflow_telemetry_counts_dropped_edges():
    """A too-small bucket warns and counts exactly the dropped edges."""
    views, segs, matches = build_scene(n_views=6, n_lines=32,
                                       n_neighbors=4, n_distractors=0)
    cams = {0: Camera(K=K, hw=(480, 640), cam_id=0)}
    images = {i: CameraImage(0, CameraPose(R=v[1], tvec=v[2]))
              for i, v in views.items()}
    imagecols = ImageCollection(cams, images)
    tri = GlobalLineTriangulator(TriangulatorConfig(max_tris_per_node=2))
    tri.init(segs, imagecols)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        tri.triangulate_all(matches)
    # every line has up to 4 candidate edges; bucket keeps 2
    expected = 0
    for i in matches:
        counts = np.bincount(
            np.concatenate([mm[:, 0] for mm in matches[i].values()]),
            minlength=32)
        expected += int(np.maximum(counts - 2, 0).sum())
    assert tri.overflow_edges == expected > 0
    assert any("dropped" in str(w.message) for w in rec)
