"""SfM with known poses: synthetic features triangulate into a point
model that feeds Dice-ranked neighbors (replaces the pose-proximity
fallback; reference pointsfm/colmap_sfm.py:20-128)."""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

import tests.conftest  # noqa: F401

from limap_tpu.base.camera import Camera, CameraPose
from limap_tpu.base.image_collection import CameraImage, ImageCollection
from limap_tpu.pointsfm.sfm import run_sfm_with_known_poses


def _scene(rng, n_views=6, n_points=40):
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    cams = {0: Camera(K=K, hw=(480, 640), cam_id=0)}
    images = {}
    for k in range(n_views):
        R = Rotation.from_rotvec(rng.normal(size=3) * 0.03).as_matrix()
        images[k] = CameraImage(0, CameraPose(R=R, tvec=np.array(
            [0.5 * k, 0.02 * k, 0.0])))
    imagecols = ImageCollection(cams, images)
    pts = rng.normal(size=(n_points, 3)).astype(np.float64)
    pts[:, 2] += 8
    vb = imagecols.batch()

    features = {}
    for k in range(n_views):
        v = vb.select(k)
        p2d = np.asarray(v.project(jnp.asarray(pts, jnp.float32)))
        inside = ((p2d[:, 0] > 5) & (p2d[:, 0] < 635)
                  & (p2d[:, 1] > 5) & (p2d[:, 1] < 475))
        # unique descriptor per 3D point (shared across views)
        desc = np.eye(n_points, 64)[np.arange(n_points) % n_points]
        desc = rng.normal(size=(n_points, 64)) * 0 + np.pad(
            np.eye(n_points), ((0, 0), (0, max(0, 64 - n_points))),
        )[:, :64]
        desc = desc / np.linalg.norm(desc, axis=1, keepdims=True)
        features[k] = {"keypoints": p2d[inside].astype(np.float32),
                       "descriptors": desc[inside],
                       "scores": np.ones(int(inside.sum()))}
    return imagecols, features, pts


@pytest.mark.slow
def test_sfm_with_known_poses_recovers_points(rng):
    imagecols, features, gt_pts = _scene(rng)
    points3d = run_sfm_with_known_poses(imagecols, features=features,
                                        min_track_length=3)
    assert len(points3d) >= 30, len(points3d)
    # every recovered point is close to a GT point
    xyz = np.stack([p["xyz"] for p in points3d.values()])
    d = np.linalg.norm(xyz[:, None] - gt_pts[None], axis=-1).min(1)
    assert d.max() < 0.05, d.max()
    # multi-view tracks got merged
    lens = [len(p["image_ids"]) for p in points3d.values()]
    assert max(lens) >= 4


def test_compute_sfminfos_builds_point_model(rng):
    """compute_sfminfos with a point model produces Dice-ranked
    neighbors (not the pose-proximity fallback order)."""
    import tempfile

    from limap_tpu.runners.functions import compute_sfminfos

    imagecols, features, _ = _scene(rng)
    points3d = run_sfm_with_known_poses(imagecols, features=features)
    with tempfile.TemporaryDirectory() as d:
        cfg = {"dir_save": d, "dir_load": d, "n_neighbors": 3}
        _, neighbors, ranges = compute_sfminfos(cfg, imagecols,
                                                points3d=points3d)
    assert set(neighbors) == set(imagecols.get_img_ids())
    assert all(len(v) > 0 for v in neighbors.values())
    lo, hi = ranges
    assert np.all(np.asarray(hi) > np.asarray(lo))
