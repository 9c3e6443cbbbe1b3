"""Depth-based 3D segment fitting."""

from limap_tpu.fitting.fitting import (estimate_segs3d_from_depth,
                                       estimate_segs3d_from_points3d,
                                       fit_lines_ransac,
                                       sample_segment_depths,
                                       unproject_points)

__all__ = ["estimate_segs3d_from_depth", "estimate_segs3d_from_points3d",
           "fit_lines_ransac",
           "sample_segment_depths", "unproject_points"]
