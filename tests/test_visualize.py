"""Visualization subsystem: backend-free geometry builders, range
culling, track-visualizer selections/report, matplotlib match plots."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from limap_tpu.base.camera import Camera, CameraPose
from limap_tpu.base.image_collection import CameraImage, ImageCollection
from limap_tpu.base.linetrack import LineTrack
from limap_tpu.visualize import (BaseTrackVisualizer, build_camera_set,
                                 build_line_set, camera_frustum_lines,
                                 compute_robust_range_lines,
                                 filter_ranges, get_track_visualizer,
                                 plot_color_line_matches, plot_images,
                                 plot_lines, plot_matches,
                                 track_colors)
from limap_tpu.visualize import \
    test_line_inside_ranges as line_inside_ranges


def _make_tracks(n=6):
    tracks = []
    for i in range(n):
        line = np.array([[i, 0.0, 5.0], [i, 1.0, 5.0]])
        supports = [(k, i, np.zeros(4)) for k in range(2 + i)]
        t = LineTrack(line=line,
                      image_id_list=[s[0] for s in supports],
                      line_id_list=[s[1] for s in supports],
                      line2d_list=[np.zeros((2, 2)) for s in supports])
        tracks.append(t)
    return tracks


def test_track_colors_distinct():
    c = track_colors(32)
    assert c.shape == (32, 3)
    assert (c >= 0).all() and (c <= 1).all()
    # no duplicate colors
    assert len(np.unique(np.round(c, 4), axis=0)) == 32


def test_build_line_set_ranges_and_colors():
    lines = [np.array([[0, 0, 0.0], [1, 0, 0]]),
             np.array([[10, 10, 10.0], [11, 10, 10]])]
    ranges = (np.array([-1, -1, -1.0]), np.array([5, 5, 5.0]))
    pts, seg, cols, kept = build_line_set(
        lines, track_colors(2), ranges=ranges, scale=2.0)
    assert kept == [0]
    assert pts.shape == (2, 3)
    assert np.allclose(pts[1], [2, 0, 0])  # scaled
    assert seg.tolist() == [[0, 1]]
    assert cols.shape == (1, 3)


def test_camera_frustum_geometry():
    K = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    R = np.eye(3)
    t = np.array([0.0, 0, 0])
    segs = camera_frustum_lines(K, (100, 100), R, t, scale=1.0)
    assert segs.shape == (8, 2, 3)
    # apex at camera center (origin)
    assert np.allclose(segs[0, 0], 0)
    # all corners at z=1 (unit scale, principal plane)
    corners = segs[1::2, 0]
    assert np.allclose(corners[:, 2], 1.0)


def test_build_camera_set():
    K = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    cams = {0: Camera(K=K, hw=(100, 100), cam_id=0)}
    images = {k: CameraImage(0, CameraPose(
        R=np.eye(3), tvec=np.array([k, 0.0, 0]))) for k in range(3)}
    ic = ImageCollection(cams, images)
    segs = build_camera_set(ic)
    assert segs.shape == (24, 2, 3)
    # cull by ranges around camera 0 only
    ranges = (np.array([-0.5, -1, -1.0]), np.array([0.5, 1, 1.0]))
    segs = build_camera_set(ic, ranges=ranges)
    assert segs.shape == (8, 2, 3)


def test_trackvis_selections_and_report(capsys):
    tracks = _make_tracks()
    vis = BaseTrackVisualizer(tracks)
    stats = vis.report()
    out = capsys.readouterr().out
    assert "[Track Report]" in out and "average supporting" in out
    assert stats["N2"] == 6 and stats["N4"] == 4
    assert vis.get_lines_np(4).shape == (4, 2, 3)
    lines, counts = vis.get_lines_for_images([6])  # img 6: tracks 5
    assert len(lines) == 1 and counts[0] == 7
    ranges = (np.array([-1, -1, 0.0]), np.array([2.5, 2, 10.0]))
    lines, counts = vis.get_lines_within_ranges(ranges)
    assert len(lines) == 3
    lr = compute_robust_range_lines([t.line for t in tracks])
    assert lr.shape == (2, 3) and (lr[1] >= lr[0]).all()
    ln, cn = filter_ranges(vis.get_lines_np(0), vis.get_counts_np(),
                           ranges)
    assert len(ln) == 3 and len(cn) == 3
    assert line_inside_ranges(tracks[0].line, ranges)


def test_get_track_visualizer_fallback():
    vis = get_track_visualizer(_make_tracks())
    assert isinstance(vis, BaseTrackVisualizer)
    with pytest.raises(ImportError):
        get_track_visualizer(_make_tracks(), backend="open3d")


def test_matplotlib_match_plots(tmp_path):
    import matplotlib.pyplot as plt

    imgs = [np.zeros((40, 60), np.uint8), np.zeros((40, 60), np.uint8)]
    fig = plot_images(imgs, titles=["a", "b"])
    kpts = np.array([[5.0, 5], [20, 20]])
    plot_matches(kpts, kpts + 2)
    lines = [np.array([[[5.0, 5], [20, 20]], [[10.0, 30], [40, 8]]])] * 2
    plot_lines(lines)
    plot_color_line_matches(lines, correct_matches=[True, False])
    from limap_tpu.visualize import save_plot

    save_plot(str(tmp_path / "m.png"))
    assert (tmp_path / "m.png").exists()
    plt.close(fig)
