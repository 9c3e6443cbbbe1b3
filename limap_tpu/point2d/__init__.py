"""2D point features: SuperPoint (Flax), classical fallback, matching."""

from limap_tpu.point2d.matching import (log_sinkhorn, mutual_nn_match,
                                        sinkhorn_match)
from limap_tpu.point2d.superpoint import HarrisPatchExtractor, SuperPoint

__all__ = ["log_sinkhorn", "mutual_nn_match", "sinkhorn_match",
           "HarrisPatchExtractor", "SuperPoint"]
