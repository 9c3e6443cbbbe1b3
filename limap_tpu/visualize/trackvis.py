"""Track visualizer with report stats
(reference: src/limap/visualize/trackvis/base.py:20-51)."""

from __future__ import annotations

from typing import List

import numpy as np

from limap_tpu.evaluation.evaluator import report_track_stats


class BaseTrackVisualizer:
    def __init__(self, tracks):
        self.tracks = list(tracks)

    def get_lines_np(self, n_visible_views: int = 4) -> np.ndarray:
        lines = [t.line for t in self.tracks
                 if t.count_images() >= n_visible_views]
        return np.stack(lines) if lines else np.zeros((0, 2, 3))

    def get_counts_np(self) -> np.ndarray:
        return np.asarray([t.count_images() for t in self.tracks])

    def report(self) -> dict:
        stats = report_track_stats(self.tracks)
        print("[Track Report]")
        for k, v in stats.items():
            print(f"  {k}: {v}")
        return stats

    report_stats = report

    def save_obj(self, fname: str, n_visible_views: int = 4) -> None:
        from limap_tpu.util import io as limapio
        limapio.save_obj(fname, self.get_lines_np(n_visible_views))

    def vis_reconstruction(self, imagecols=None, n_visible_views: int = 4,
                           **kwargs):
        """Open an interactive Open3D viewer when available."""
        try:
            import open3d as o3d
        except ImportError:
            print("open3d not available; use save_obj() for offline viewing")
            return
        lines = self.get_lines_np(n_visible_views)
        pts = lines.reshape(-1, 3)
        idx = np.arange(len(lines) * 2).reshape(-1, 2)
        ls = o3d.geometry.LineSet(
            o3d.utility.Vector3dVector(pts),
            o3d.utility.Vector2iVector(idx))
        o3d.visualization.draw_geometries([ls])


class Open3DTrackVisualizer(BaseTrackVisualizer):
    pass
