"""Camera/image undistortion (reference: src/limap/undistortion)."""

from limap_tpu.undistortion.undistort import (undistort_camera,
                                              undistort_image_camera,
                                              undistort_points)

__all__ = ["undistort_camera", "undistort_image_camera", "undistort_points"]
