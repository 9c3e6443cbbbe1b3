"""Benchmark: batched line-BA throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is track-LM-iterations/sec of the fixed-camera line bundle
adjustment (the hot kernel of the mapping pipeline: residuals +
Jacobians + 4x4 solves for every track at once).  ``vs_baseline`` is the
speedup over the same jitted computation on the host CPU backend — the
reference engine is CPU-only (Ceres), so CPU-vs-accelerator is the
meaningful axis until the reference harness numbers are regenerated
(BASELINE.md).
"""

import json
import time

import numpy as np


def build_problem(n_tracks, n_views, seed=0):
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from limap_tpu.base import CameraViewsBatch, Segments
    from limap_tpu.base import line_geometry as lg
    from limap_tpu.base.infinite_line import MinimalInfiniteLines3d
    from limap_tpu.base.linetrack import TrackBatch
    from limap_tpu.optimize.line_ba import pack_minimal_lines

    rng = np.random.default_rng(seed)
    fx = 800.0
    kvec = np.array([fx, fx, 640.0, 480.0], np.float32)
    qvecs, tvecs = [], []
    for k in range(n_views):
        R = Rotation.from_rotvec(rng.normal(size=3) * 0.05).as_matrix()
        qvecs.append(Rotation.from_matrix(R).as_quat()[[3, 0, 1, 2]])
        tvecs.append(np.array([0.4 * k, 0.02 * k, 0.01 * k]))
    qvecs = np.asarray(qvecs, np.float32)
    tvecs = np.asarray(tvecs, np.float32)

    S = min(n_views, 16)
    gt_start = rng.normal(size=(n_tracks, 3)).astype(np.float32)
    gt_start[:, 2] += 8
    gt_end = gt_start + rng.normal(size=(n_tracks, 3)).astype(np.float32)
    img_index = np.stack([rng.choice(n_views, size=S, replace=False)
                          for _ in range(n_tracks)]).astype(np.int32)
    vb = CameraViewsBatch(jnp.asarray(np.tile(kvec, (n_tracks, S, 1))),
                          jnp.asarray(qvecs)[img_index],
                          jnp.asarray(tvecs)[img_index])
    seg = Segments(jnp.asarray(gt_start)[:, None].repeat(S, 1),
                   jnp.asarray(gt_end)[:, None].repeat(S, 1))
    l2d = lg.project_segments(seg, vb)

    pert_s = gt_start + rng.normal(size=(n_tracks, 3)).astype(np.float32) * .02
    pert_e = gt_end + rng.normal(size=(n_tracks, 3)).astype(np.float32) * .02
    batch = TrackBatch(
        line=Segments(jnp.asarray(pert_s), jnp.asarray(pert_e)),
        img_index=jnp.asarray(img_index),
        image_ids=jnp.asarray(img_index),
        line_ids=jnp.zeros_like(jnp.asarray(img_index)),
        line2d=l2d,
        line3d=seg,
        score=jnp.ones((n_tracks, S)),
        mask=jnp.ones((n_tracks, S), bool),
        track_mask=jnp.ones((n_tracks,), bool),
    )
    views = CameraViewsBatch(jnp.asarray(np.tile(kvec, (n_views, 1))),
                             jnp.asarray(qvecs), jnp.asarray(tvecs))
    return batch, views


def time_ba(batch, views, n_iters, repeats=3):
    import jax

    from limap_tpu.optimize import LineBAConfig, solve_line_bundle_adjustment

    cfg = LineBAConfig(loss="cauchy", min_num_images=2)

    def run():
        refined, result = solve_line_bundle_adjustment(
            batch, views, cfg, num_iterations=n_iters)
        jax.block_until_ready(result.cost)
        return result

    run()  # compile
    best = 1e30
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax

    n_tracks, n_views, n_iters = 8192, 50, 20

    platform = jax.devices()[0].platform
    batch, views = build_problem(n_tracks, n_views)
    t_dev = time_ba(batch, views, n_iters)
    track_iters_per_sec = n_tracks * n_iters / t_dev

    # CPU baseline: same computation, smaller problem, scaled linearly
    vs_baseline = 1.0
    if platform != "cpu":
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                small_tracks = 1024
                b2, v2 = build_problem(small_tracks, n_views)
                b2 = jax.device_put(b2, cpu)
                v2 = jax.device_put(v2, cpu)
                t_cpu = time_ba(b2, v2, n_iters)
                cpu_rate = small_tracks * n_iters / t_cpu
                vs_baseline = track_iters_per_sec / cpu_rate
        except Exception:
            pass

    print(json.dumps({
        "metric": "line_ba_track_lm_iters_per_sec",
        "value": round(track_iters_per_sec, 1),
        "unit": f"track-iters/s (T={n_tracks}, S=16, {platform})",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
