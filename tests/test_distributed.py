"""Multi-host driver: single-process semantics + image-sharded mapping
over the virtual 8-device mesh."""

import numpy as np

import tests.conftest  # noqa: F401

import jax

from limap_tpu.parallel import distributed as dist


def test_single_process_info_and_sharding():
    assert dist.maybe_initialize() is False  # single process here
    info = dist.process_info()
    assert info["process_count"] == 1
    assert info["global_devices"] >= 8
    ids = list(range(10))
    assert dist.shard_image_ids(ids) == ids
    d = {1: "a", 2: "b"}
    assert dist.all_gather_host_dicts(d) == d


def test_run_distributed_mapping():
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from limap_tpu.base import Segments
    from limap_tpu.base import line_geometry as lg
    from limap_tpu.base.camera import Camera, CameraPose
    from limap_tpu.base.image_collection import (CameraImage,
                                                 ImageCollection)

    rng = np.random.default_rng(0)
    n_views, n_lines = 8, 12
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    cams = {0: Camera(K=K, hw=(480, 640), cam_id=0)}
    images = {k: CameraImage(0, CameraPose(
        R=Rotation.from_rotvec(rng.normal(size=3) * 0.03).as_matrix(),
        tvec=np.array([0.4 * k, 0.0, 0.02 * k])))
        for k in range(n_views)}
    imagecols = ImageCollection(cams, images)
    gt_s = rng.normal(size=(n_lines, 3)).astype(np.float32)
    gt_s[:, 2] += 8
    gt_e = gt_s + rng.normal(size=(n_lines, 3)).astype(np.float32)
    vb = imagecols.batch()
    allv = vb.select(jnp.repeat(jnp.arange(n_views), n_lines))
    l2d = lg.project_segments(
        Segments(jnp.tile(jnp.asarray(gt_s), (n_views, 1)),
                 jnp.tile(jnp.asarray(gt_e), (n_views, 1))), allv)
    arr = np.concatenate([np.asarray(l2d.start), np.asarray(l2d.end)],
                         1).reshape(n_views, n_lines, 4)
    segs = {k: arr[k] for k in range(n_views)}
    matches = np.stack([np.arange(n_lines)] * 2, 1)
    nbrs = {i: {j: matches for j in range(max(0, i - 2),
                                          min(n_views, i + 3)) if j != i}
            for i in range(n_views)}

    tracks = dist.run_distributed_mapping(
        {"triangulation": {"max_tris_per_node": 8}}, imagecols, segs,
        nbrs)
    assert len(tracks) >= n_lines * 0.8
