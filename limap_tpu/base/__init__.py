"""Core geometry layer — batched pytree equivalents of limap's `base`."""

from limap_tpu.base import line_dists, line_geometry, line_linker, pose
from limap_tpu.base.camera import (Camera, CameraPose, CameraView,
                                   CameraViewsBatch)
from limap_tpu.base.infinite_line import (InfiniteLines3d,
                                          MinimalInfiniteLines3d,
                                          infline2d_from_segment,
                                          intersect_infinite_lines_2d,
                                          line_world_to_pixel,
                                          minimal_to_plucker)
from limap_tpu.base.lines import Segments, pad_segments, segments2d_from_numpy
from limap_tpu.base.line_linker import (LineLinker, LineLinker2dConfig,
                                        LineLinker3dConfig)

__all__ = [
    "line_dists", "line_geometry", "line_linker", "pose",
    "Camera", "CameraPose", "CameraView", "CameraViewsBatch",
    "InfiniteLines3d", "MinimalInfiniteLines3d", "infline2d_from_segment",
    "intersect_infinite_lines_2d", "line_world_to_pixel",
    "minimal_to_plucker", "Segments", "pad_segments",
    "segments2d_from_numpy", "LineLinker", "LineLinker2dConfig",
    "LineLinker3dConfig",
]
