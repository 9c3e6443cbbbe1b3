import jax.numpy as jnp
import numpy as np

from limap_tpu.base.lines import Segments
from limap_tpu.evaluation import (PointCloudEvaluator, RefLineEvaluator,
                                  report_error_to_gt)


def test_point_cloud_evaluator_inlier_ratio(rng):
    # GT cloud densely samples a line from (0,0,0) to (1,0,0)
    t = np.linspace(0, 1, 2000)[:, None]
    cloud = t * np.array([1.0, 0, 0])
    ev = PointCloudEvaluator(cloud)

    lines = np.array([
        [[0, 0, 0], [1, 0, 0]],        # exact: ratio 1
        [[0, 0.05, 0], [1, 0.05, 0]],  # offset 0.05
        [[0, 0, 0], [2, 0, 0]],        # half on the cloud
        [[5, 5, 5], [6, 5, 5]],        # far away
    ], dtype=np.float32)
    seg = Segments(jnp.asarray(lines[:, 0]), jnp.asarray(lines[:, 1]))
    r_tight = np.asarray(ev.ComputeInlierRatio(seg, 0.01, n_samples=200))
    r_loose = np.asarray(ev.ComputeInlierRatio(seg, 0.1, n_samples=200))
    assert r_tight[0] > 0.99
    assert r_tight[1] < 0.01 and r_loose[1] > 0.99
    assert 0.45 < r_tight[2] < 0.55
    assert r_loose[3] == 0.0


def test_report_error_to_gt(rng):
    t = np.linspace(0, 1, 1000)[:, None]
    cloud = t * np.array([1.0, 0, 0])
    ev = PointCloudEvaluator(cloud)
    lines = np.array([[[0, 0, 0], [1, 0, 0]],
                      [[9, 9, 9], [10, 9, 9]]], dtype=np.float32)
    rep = report_error_to_gt(ev, lines, [0.01, 0.1], n_samples=100)
    assert abs(rep["recall"][0.01] - 1.0) < 0.05   # 1m of the GT line
    assert abs(rep["precision"][0.01] - 50.0) < 1  # 1 of 2 lines inlier


def test_refline_evaluator():
    ref = np.array([[[0, 0, 0], [1, 0, 0]],
                    [[0, 1, 0], [1, 1, 0]]])
    ev = RefLineEvaluator(ref)
    assert abs(ev.SumLength() - 2.0) < 1e-5
    # predictions cover only the first ref line
    pred = np.array([[[0, 0.0, 0], [1, 0.0, 0]]])
    rec = ev.ComputeRecallRef(pred, 0.05, n_samples=100)
    assert abs(rec - 1.0) < 0.05
