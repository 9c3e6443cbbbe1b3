"""Point SfM with known poses — builds the sparse point model that feeds
Dice-ranked visual neighbors, scene ranges and point-line bipartites.

Counterpart of /root/reference/src/limap/pointsfm/colmap_sfm.py:20-128
(run_colmap_sfm_with_known_poses), which writes a COLMAP database, runs
hloc feature extraction + matching and pycolmap point triangulation.
Neither hloc nor COLMAP exists here; the TPU-native equivalent keeps the
same contract — (imagecols with poses, images) -> point model — with:

1. keypoints + descriptors per image (SuperPoint when weights are
   available, Harris patches otherwise — point2d/superpoint.py),
2. mutual-NN descriptor matching over candidate pairs (batched matmul
   scoring on device, point2d/matching.py),
3. two-view midpoint triangulation with known poses + cheirality,
   reprojection and triangulation-angle gates (all batched jnp),
4. track merging by union-find over verified matches.

Output: {pid: {"xyz": [3], "image_ids": [...], "p2ds": {img_id: [2]}}}
— directly consumable by SfmModel.from_imagecols_and_points
(pointsfm/sfm_model.py) and the bipartite builders.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from limap_tpu.base.camera import CameraViewsBatch


def _triangulate_pairs(views: CameraViewsBatch, rows1, rows2, p1, p2):
    """Batched two-ray midpoint triangulation.

    rows1/rows2 [M] view rows; p1/p2 [M, 2] pixels.
    Returns xyz [M, 3], valid [M] (cheirality + angle handled by caller).
    """
    v1 = views.select(jnp.asarray(rows1))
    v2 = views.select(jnp.asarray(rows2))
    d1 = v1.ray_direction(jnp.asarray(p1))
    d2 = v2.ray_direction(jnp.asarray(p2))
    c1 = v1.center()
    c2 = v2.center()
    # closest point between the two rays
    b = c2 - c1
    d11 = jnp.sum(d1 * d1, -1)
    d22 = jnp.sum(d2 * d2, -1)
    d12 = jnp.sum(d1 * d2, -1)
    denom = d11 * d22 - d12 * d12
    t1 = (jnp.sum(b * d1, -1) * d22 - jnp.sum(b * d2, -1) * d12) \
        / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t2 = (jnp.sum(b * d1, -1) * d12 - jnp.sum(b * d2, -1) * d11) \
        / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    x1 = c1 + d1 * t1[..., None]
    x2 = c2 + d2 * t2[..., None]
    xyz = 0.5 * (x1 + x2)
    cos = jnp.abs(d12) / jnp.sqrt(d11 * d22 + 1e-12)
    valid = (t1 > 0) & (t2 > 0) & (jnp.abs(denom) > 1e-12)
    return xyz, valid, cos


class _UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = self.parent.setdefault(p, p)
            x = self.parent[x]
            p = self.parent.setdefault(x, x)
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def run_sfm_with_known_poses(
        imagecols, images: Optional[Dict[int, np.ndarray]] = None,
        features: Optional[Dict[int, dict]] = None,
        pair_ids: Optional[List[Tuple[int, int]]] = None,
        n_neighbors: int = 8,
        min_tri_angle_deg: float = 1.5,
        max_reproj_px: float = 4.0,
        ratio: float = 0.7,
        weight_path: Optional[str] = None,
        min_track_length: int = 2) -> Dict[int, dict]:
    """Triangulate a sparse point model against the known poses.

    images: {img_id: grayscale array}; or pass precomputed ``features``
    ({img_id: {keypoints, descriptors}}).  ``pair_ids`` restricts
    matching (defaults to pose-proximity n_neighbors pairs, like the
    reference's neighbor-restricted pair file, colmap_sfm.py:47-73).
    """
    ids = imagecols.get_img_ids()
    id2row = imagecols.img_id_to_index()
    views = imagecols.batch()

    # 1. features
    if features is None:
        from limap_tpu.point2d.superpoint import (HarrisPatchExtractor,
                                                  SuperPoint)
        if weight_path is not None:
            extractor = SuperPoint(weight_path=weight_path)
        else:
            extractor = HarrisPatchExtractor()
        features = {i: extractor(images[i]) for i in ids}

    # 2. candidate pairs
    if pair_ids is None:
        from limap_tpu.runners.functions import compute_pose_neighbors
        nbrs = compute_pose_neighbors(imagecols, n_neighbors)
        pair_ids = sorted({(min(i, j), max(i, j))
                           for i in ids for j in nbrs[i]})

    # 3. match + triangulate + verify per pair
    from limap_tpu.point2d.matching import mutual_nn_match

    uf = _UnionFind()
    obs_xyz: Dict[Tuple[int, int], list] = {}
    cos_th = np.cos(np.radians(min_tri_angle_deg))
    for (i, j) in pair_ids:
        fi, fj = features[i], features[j]
        if len(fi["keypoints"]) == 0 or len(fj["keypoints"]) == 0:
            continue
        m = mutual_nn_match(fi["descriptors"], fj["descriptors"],
                            min_score=ratio)
        if len(m) == 0:
            continue
        p1 = fi["keypoints"][m[:, 0]]
        p2 = fj["keypoints"][m[:, 1]]
        r1 = np.full(len(m), id2row[i], np.int32)
        r2 = np.full(len(m), id2row[j], np.int32)
        xyz, valid, cos = _triangulate_pairs(views, r1, r2, p1, p2)
        # reprojection gate in both views
        vi = views.select(jnp.asarray(r1))
        vj = views.select(jnp.asarray(r2))
        e1 = jnp.linalg.norm(vi.project(xyz) - jnp.asarray(p1), axis=-1)
        e2 = jnp.linalg.norm(vj.project(xyz) - jnp.asarray(p2), axis=-1)
        ok = np.asarray(valid & (cos < cos_th)
                        & (e1 < max_reproj_px) & (e2 < max_reproj_px))
        xyz = np.asarray(xyz)
        for k in np.nonzero(ok)[0]:
            a = (i, int(m[k, 0]))
            b = (j, int(m[k, 1]))
            uf.union(a, b)
            obs_xyz.setdefault(a, []).append(xyz[k])
            obs_xyz.setdefault(b, []).append(xyz[k])

    # 4. merge into tracks
    groups: Dict[Tuple[int, int], list] = {}
    for node in uf.parent:
        groups.setdefault(uf.find(node), []).append(node)

    points3d = {}
    pid = 0
    for root, nodes in groups.items():
        img_ids = sorted({n[0] for n in nodes})
        if len(img_ids) < min_track_length:
            continue
        all_xyz = np.concatenate([np.asarray(obs_xyz[n])
                                  for n in nodes if n in obs_xyz])
        xyz = np.median(all_xyz, axis=0)
        p2ds = {}
        for (img_id, kp_id) in nodes:
            p2ds.setdefault(img_id,
                            features[img_id]["keypoints"][kp_id])
        points3d[pid] = {"xyz": xyz, "image_ids": img_ids,
                        "p2ds": p2ds}
        pid += 1
    return points3d
