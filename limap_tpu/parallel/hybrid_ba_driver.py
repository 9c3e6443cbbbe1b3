"""High-level joint hybrid BA driver (points + lines + poses).

Counterpart of the reference's
``optimize.solve_hybrid_bundle_adjustment`` front door
(/root/reference/src/limap/optimize/hybrid_bundle_adjustment/solve.py:
20-51 + HybridBAEngine, hybrid_bundle_adjustment.cc): packs an
ImageCollection + PointTracks + LineTracks into the track-sharded
distributed BA state (parallel.sharded_ba), runs LM steps over a
device mesh, and unpacks updated poses / points / re-trimmed line
segments.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.base import Segments
from limap_tpu.base.infinite_line import MinimalInfiniteLines3d
from limap_tpu.base.linetrack import (LineTrack, batch_to_tracks,
                                      tracks_to_batch)
from limap_tpu.optimize.line_ba import (get_output_tracks,
                                        pack_minimal_lines,
                                        unpack_minimal_lines)
from limap_tpu.parallel.mesh import make_mesh
from limap_tpu.parallel.sharded_ba import (HybridBAOptions, HybridBAState,
                                           make_hybrid_ba_cost,
                                           make_hybrid_ba_step)


def _pad_rows(arr: np.ndarray, n: int):
    if arr.shape[0] == n:
        return arr
    pad = np.zeros((n - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def solve_hybrid_bundle_adjustment(
        imagecols, pointtracks: Sequence, linetracks: List[LineTrack],
        opts: HybridBAOptions = HybridBAOptions(),
        mesh=None, n_iterations: int = 20,
        num_outliers_aggregator: int = 2):
    """Jointly optimize camera poses, 3D points and 3D lines.

    pointtracks: PointTrack-like objects with ``p`` ([3]),
    ``image_id_list`` and ``p2d_list``.  Returns (new_imagecols,
    new_points [P, 3], new_linetracks, costs list).
    """
    from limap_tpu.base.camera import CameraPose
    from limap_tpu.base.image_collection import (CameraImage,
                                                 ImageCollection)

    if mesh is None:
        mesh = make_mesh()
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.shape]))
    id2row = imagecols.img_id_to_index()
    views = imagecols.batch()
    nv = len(imagecols.get_img_ids())
    cam_ids = sorted(imagecols.cameras.keys())
    cam2row = {c: i for i, c in enumerate(cam_ids)}
    img_cam_row = np.asarray(
        [cam2row[imagecols.images[i].cam_id]
         for i in imagecols.get_img_ids()], np.int32)
    kvec_all = np.asarray(views.kvec, np.float32)     # [I, 4]
    pose_params = jnp.asarray(np.concatenate(
        [np.asarray(views.qvec), np.asarray(views.tvec)],
        axis=1).astype(np.float32))
    cam_fxfy = jnp.asarray(
        np.stack([kvec_all[np.where(img_cam_row == c)[0][0], :2]
                  if np.any(img_cam_row == c) else np.ones(2)
                  for c in range(len(cam_ids))]).astype(np.float32))

    # ---- line tracks -> padded [Tl, S] arrays
    batch = tracks_to_batch(linetracks, id2row)
    Tl = batch.mask.shape[0]
    Tl_pad = -(-max(Tl, 1) // n_dev) * n_dev
    img_index_l = _pad_rows(np.asarray(batch.img_index, np.int32), Tl_pad)
    weight_l = _pad_rows(
        np.asarray(batch.mask, np.float32), Tl_pad)
    S = img_index_l.shape[1]
    line_params = pack_minimal_lines(MinimalInfiniteLines3d.from_segments(
        Segments(jnp.asarray(_pad_rows(
            np.asarray(batch.line.start, np.float32), Tl_pad)),
            jnp.asarray(_pad_rows(
                np.asarray(batch.line.end, np.float32) + 1e-6, Tl_pad)))))
    line_data = (
        jnp.asarray(kvec_all[img_index_l]),
        jnp.asarray(img_cam_row[img_index_l]),
        jnp.asarray(img_index_l),
        jnp.asarray(_pad_rows(np.asarray(batch.line2d.start, np.float32),
                              Tl_pad)),
        jnp.asarray(_pad_rows(np.asarray(batch.line2d.end, np.float32),
                              Tl_pad)),
        jnp.asarray(weight_l))

    # ---- point tracks -> padded [Tp, Sp] arrays
    Sp = max(max((len(t.image_id_list) for t in pointtracks), default=1),
             1)
    Tp = max(len(pointtracks), 1)
    Tp_pad = -(-Tp // n_dev) * n_dev
    xyz = np.zeros((Tp_pad, 3), np.float32)
    ii_p = np.zeros((Tp_pad, Sp), np.int32)
    p2d = np.zeros((Tp_pad, Sp, 2), np.float32)
    w_p = np.zeros((Tp_pad, Sp), np.float32)
    for ti, t in enumerate(pointtracks):
        xyz[ti] = np.asarray(t.p)
        for si, (img_id, pt) in enumerate(
                zip(t.image_id_list[:Sp], t.p2d_list[:Sp])):
            if img_id not in id2row:
                continue
            ii_p[ti, si] = id2row[img_id]
            p2d[ti, si] = np.asarray(pt)[:2]
            w_p[ti, si] = 1.0
    point_data = (
        jnp.asarray(kvec_all[ii_p]), jnp.asarray(img_cam_row[ii_p]),
        jnp.asarray(ii_p), jnp.asarray(p2d), jnp.asarray(w_p))

    state = HybridBAState(line_params, jnp.asarray(xyz), pose_params,
                          cam_fxfy)
    step = make_hybrid_ba_step(mesh, nv, len(cam_ids), opts)
    cost_fn = make_hybrid_ba_cost(mesh, opts)
    # Levenberg-Marquardt accept/reject with adaptive damping (the
    # reference's Ceres solver is trust-region too,
    # hybrid_bundle_adjustment.cc Solve): a fixed-damping iteration
    # can oscillate on ill-conditioned ragged problems, and which side
    # of the accept boundary a step lands on is what cross-device
    # reassociation noise would otherwise flip
    # (tests/test_multichip_parity.py ragged parity)
    lam = opts.damping
    cost_cur = float(cost_fn(state, line_data, point_data))
    costs = [cost_cur]
    for _ in range(n_iterations):
        cand, _ = step(state, line_data, point_data, lam)
        cost_new = float(cost_fn(cand, line_data, point_data))
        if cost_new < cost_cur:
            state, cost_cur = cand, cost_new
            lam = max(lam / 3.0, 1e-6)
        else:
            lam = min(lam * 10.0, 1e3)
        costs.append(cost_cur)

    # ---- unpack: new poses -> ImageCollection
    new_pose = np.asarray(state.pose_params)
    new_images = {}
    for i, img_id in enumerate(imagecols.get_img_ids()):
        im = imagecols.images[img_id]
        q = new_pose[i, :4]
        q = q / (np.linalg.norm(q) + 1e-12)
        new_images[img_id] = CameraImage(
            im.cam_id, CameraPose(qvec=q, tvec=new_pose[i, 4:7]),
            im.image_name)
    new_imagecols = ImageCollection(dict(imagecols.cameras), new_images)

    # ---- new line segments: re-trim with the UPDATED views
    new_views = new_imagecols.batch()
    refined = unpack_minimal_lines(state.line_params[:Tl])
    out_batch = get_output_tracks(batch, new_views, refined,
                                  num_outliers_aggregator)
    new_linetracks = batch_to_tracks(out_batch)

    new_points = np.asarray(state.point_params)[:len(pointtracks)]
    return new_imagecols, new_points, new_linetracks, costs
