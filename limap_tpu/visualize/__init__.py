"""Visualization: track reports, 2D overlays, 3D export.

Reference: src/limap/visualize (Open3D/PyVista viewers + 2D drawing).
The heavy interactive viewers are optional (open3d may be absent in the
TPU image); stats reporting and 2D drawing are always available.
"""

from limap_tpu.visualize.trackvis import BaseTrackVisualizer
from limap_tpu.visualize.vis_utils import (draw_matches, draw_segments,
                                           draw_points)

__all__ = ["BaseTrackVisualizer", "draw_segments", "draw_matches",
           "draw_points"]
