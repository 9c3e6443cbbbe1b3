"""Line map evaluation vs ground truth."""

from limap_tpu.evaluation.evaluator import (PointCloudEvaluator,
                                            RefLineEvaluator,
                                            point_segment_distance,
                                            report_error_to_gt,
                                            report_track_stats,
                                            sample_points_on_segments)

__all__ = ["PointCloudEvaluator", "RefLineEvaluator",
           "point_segment_distance", "report_error_to_gt",
           "report_track_stats", "sample_points_on_segments"]
