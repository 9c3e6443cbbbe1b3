"""Track building, aggregation, filtering, remerging."""

from limap_tpu.merging.aggregator import aggregate_tracks, principal_direction
from limap_tpu.merging.merging import (check_reprojection, check_sensitivity,
                                       filter_tracks_by_num_images,
                                       filter_tracks_by_overlap,
                                       filter_tracks_by_reprojection,
                                       filter_tracks_by_sensitivity,
                                       merge_to_linetracks, remerge,
                                       set_uncertainty_segs3d)

__all__ = [
    "aggregate_tracks", "principal_direction", "check_reprojection",
    "check_sensitivity", "filter_tracks_by_num_images",
    "filter_tracks_by_overlap", "filter_tracks_by_reprojection",
    "filter_tracks_by_sensitivity", "merge_to_linetracks", "remerge",
    "set_uncertainty_segs3d",
]
