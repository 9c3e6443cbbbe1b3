"""Point-SfM integration: model readers, neighbors, ranges."""

from limap_tpu.pointsfm.colmap_reader import (ReadInfos, ReadPointTracks,
                                              read_model, write_model_txt)
from limap_tpu.pointsfm.colmap_sfm import run_colmap_sfm_with_known_poses
from limap_tpu.pointsfm.sfm_model import (SfmModel, compute_metainfos,
                                          compute_neighbors)

__all__ = ["ReadInfos", "ReadPointTracks", "read_model", "write_model_txt",
           "run_colmap_sfm_with_known_poses",
           "SfmModel", "compute_metainfos", "compute_neighbors"]
