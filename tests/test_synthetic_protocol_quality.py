"""Quality regression gate on the deterministic synthetic protocol
scene (VERDICT r3 item 7): the full pipeline's length recall and
precision must not silently degrade round-to-round.

Bounds are deliberately loose lower bounds; the exact numbers per
round are pinned in BASELINE.md from bench_pipeline.py output."""

import pytest

import tests.conftest  # noqa: F401

import bench_pipeline

pytestmark = pytest.mark.slow


def test_pipeline_quality_on_protocol_scene():
    r = bench_pipeline.run(n_views=24, include_baseline=False,
                           warm=False)
    q = r["quality"]
    assert q["n_tracks"] >= 40, q
    # most tracks lie on a GT line within 5 cm (scene scale ~ meters)
    assert q["precision_0.05"] >= 80.0, q
    # recovered length at tau=5cm covers a substantial part of the map
    assert q["recall_0.05"] >= 0.4 * q["gt_total_length"], q
    # quality sanity: BA kept the tracks
    assert r["n_ba_tracks"] >= 0.8 * r["n_tracks"]
