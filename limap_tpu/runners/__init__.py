"""Pipeline runners (the reference's L7 layer)."""

from limap_tpu.runners.functions import (compute_2d_segs, compute_matches,
                                         compute_sfminfos, setup,
                                         undistort_images)
from limap_tpu.runners.hybrid_localization import hybrid_localization
from limap_tpu.runners.line_fitnmerge import (fit_3d_segs,
                                              fit_3d_segs_with_points3d,
                                              line_fitnmerge,
                                              line_fitting_with_points3d)
from limap_tpu.runners.line_triangulation import line_triangulation

__all__ = ["compute_2d_segs", "compute_matches", "compute_sfminfos", "setup",
           "undistort_images", "fit_3d_segs", "line_fitnmerge",
           "line_triangulation", "hybrid_localization",
           "fit_3d_segs_with_points3d", "line_fitting_with_points3d"]
