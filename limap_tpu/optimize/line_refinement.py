"""Per-track line refinement with optional VP constraints.

Mirrors /root/reference/src/limap/optimize/line_refinement (refine.h:60,
line_refinement.py:15-136): geometric residuals + optional VP-direction
constraints per track, fixed cameras.  All tracks refine simultaneously
through the batched LM engine; the pixel-level terms (SOLD2 heatmaps /
feature consistency, compile-gated in the reference via
INTERPOLATION_ENABLED) plug in as extra residuals via ``extra_residuals``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.base.camera import CameraViewsBatch
from limap_tpu.base.infinite_line import MinimalInfiniteLines3d
from limap_tpu.base.lines import Segments
from limap_tpu.base.linetrack import LineTrack, TrackBatch, batch_to_tracks, \
    tracks_to_batch
from limap_tpu.optimize import residuals as res
from limap_tpu.optimize.lm import lm_solve, retract_quat_so2
from limap_tpu.optimize.line_ba import (LineBAConfig, get_output_tracks,
                                        pack_minimal_lines, robust_weight,
                                        unpack_minimal_lines)


@dataclasses.dataclass(frozen=True)
class RefinementConfig(LineBAConfig):
    """RefinementConfig (line_refinement/refinement_config.h)."""

    use_geometric: bool = True
    use_vp: bool = False
    vp_multiplier: float = 0.1
    use_heatmap: bool = False
    heatmap_multiplier: float = 1.0
    use_feature: bool = False


def build_heatmap_patches(batch: TrackBatch, heatmaps: Dict[int, "object"],
                          n_perp: int = 11, perp_spacing: float = 1.0,
                          n_along: int = 16):
    """Extract line-aligned heatmap patches per (track, support).

    The reference samples heatmaps through FeaturePatch interpolation
    around the tracked 2D segments (refine.h:81-108, featurepatch.h);
    here patches are extracted once up front so the refinement residual
    only reads a small local window.

    Returns (patches [T, S, A, P], origin [T, S, 2], u_axis [T, S, 2],
    v_axis [T, S, 2]) where patch coords are
    p = origin + a * u_axis * (len/(A-1)) + (b - (P-1)/2) * v_axis.
    """
    from limap_tpu.features.featuremap import extract_line_patches
    T, S = batch.mask.shape
    img_ids = np.asarray(batch.image_ids)
    l2s = np.asarray(batch.line2d.start)
    l2e = np.asarray(batch.line2d.end)
    patches = np.zeros((T, S, n_along, n_perp), np.float32)
    for img_id in sorted(set(img_ids[np.asarray(batch.mask)])):
        hm = heatmaps[int(img_id)]
        hm = jnp.asarray(np.asarray(hm, np.float32))
        sel = np.argwhere((img_ids == img_id) & np.asarray(batch.mask))
        if not len(sel):
            continue
        s = jnp.asarray(l2s[sel[:, 0], sel[:, 1]])
        e = jnp.asarray(l2e[sel[:, 0], sel[:, 1]])
        p = np.asarray(extract_line_patches(hm[..., None], s, e,
                                            n_along=n_along, n_perp=n_perp,
                                            perp_spacing=perp_spacing))
        patches[sel[:, 0], sel[:, 1]] = p[..., 0]
    d = l2e - l2s
    length = np.linalg.norm(d, axis=-1, keepdims=True)
    u = d / np.maximum(length, 1e-8)
    v = np.stack([-u[..., 1], u[..., 0]], axis=-1)
    return (jnp.asarray(patches), jnp.asarray(l2s), jnp.asarray(u),
            jnp.asarray(v), jnp.asarray(length[..., 0]))


def _heatmap_residual(coor, origin, u_axis, v_axis, length, patch,
                      n_along: int, n_perp: int, perp_spacing: float):
    """Heatmap term for one support: perpendicular feet of fixed anchor
    points on the current projected line, sampled in the local patch.

    coor [3] current projected line; patch [A, P]; returns [A] in [0,1]
    residuals (1 - heatmap at the foot), zero outside the patch.
    """
    from limap_tpu.base.infinite_line import infline2d_point_projection
    from limap_tpu.features.featuremap import interpolate_bilinear
    A, P = n_along, n_perp
    t = jnp.linspace(0.0, 1.0, A)
    anchors = origin[None, :] + t[:, None] * u_axis[None, :] * length
    feet = infline2d_point_projection(coor[None, :], anchors)  # [A, 2]
    rel = feet - origin[None, :]
    pa = jnp.sum(rel * u_axis[None, :], -1) / jnp.maximum(length, 1e-8) \
        * (A - 1)
    pb = jnp.sum(rel * v_axis[None, :], -1) / perp_spacing + (P - 1) / 2.0
    inside = (pa >= 0) & (pa <= A - 1) & (pb >= 0) & (pb <= P - 1)
    vals = interpolate_bilinear(patch, jnp.stack([pb, pa], axis=-1))
    return jnp.where(inside, 1.0 - vals, 0.0)


def solve_line_refinement(
        batch: TrackBatch, views: CameraViewsBatch,
        cfg: RefinementConfig = RefinementConfig(),
        track_vps: Optional[jnp.ndarray] = None,
        track_has_vp: Optional[jnp.ndarray] = None,
        heatmap_data=None,
        num_iterations: int = 20):
    """Refine all tracks; optional per-(track, support) VP constraints
    and heatmap terms (pass ``heatmap_data`` from
    :func:`build_heatmap_patches`).

    track_vps: [T, S, 3] per-support VP (homogeneous pixel coords);
    track_has_vp: [T, S] bool.
    """
    init = MinimalInfiniteLines3d.from_segments(batch.line)
    params0 = pack_minimal_lines(init)
    sup_views = views.select(batch.img_index)
    weights = res.compute_line_weights(batch.line2d) * batch.mask
    free = (batch.count_images() >= cfg.min_num_images) & batch.track_mask
    weights = weights * free[:, None]

    use_vp = cfg.use_vp and track_vps is not None
    if use_vp:
        vp_w = (track_has_vp & batch.mask
                & free[:, None]).astype(jnp.float32) * cfg.vp_multiplier
    else:
        S = batch.max_supports
        track_vps = jnp.zeros((batch.num_tracks, S, 3))
        vp_w = jnp.zeros((batch.num_tracks, S))

    use_heatmap = cfg.use_heatmap and heatmap_data is not None
    if use_heatmap:
        hm_patches, hm_origin, hm_u, hm_v, hm_len = heatmap_data
        n_along, n_perp = hm_patches.shape[2], hm_patches.shape[3]
    else:
        S = batch.max_supports
        hm_patches = jnp.zeros((batch.num_tracks, S, 1, 1))
        hm_origin = jnp.zeros((batch.num_tracks, S, 2))
        hm_u = jnp.zeros((batch.num_tracks, S, 2))
        hm_v = jnp.zeros((batch.num_tracks, S, 2))
        hm_len = jnp.ones((batch.num_tracks, S))
        n_along, n_perp = 1, 1

    from limap_tpu.base.infinite_line import (line_world_to_pixel,
                                              minimal_to_plucker)

    def residual_one(params, kvec, qvec, tvec, ps, pe, w, vps, vw,
                     patches, origin, u_ax, v_ax, seg_len):
        line = unpack_minimal_lines(params)
        vb = CameraViewsBatch(kvec, qvec, tvec)
        rs = []
        if cfg.use_geometric:
            r = res.line_geometric_residual(
                line.uvec[None], line.wvec[None], vb, Segments(ps, pe),
                cfg.geometric_alpha)
            r = jnp.where((w > 0)[:, None], r, 0.0)
            r2 = jax.lax.stop_gradient(jnp.sum(r * r, -1))
            rw = robust_weight(r2, cfg.loss, cfg.loss_scale)
            scale = jnp.sqrt(w * rw + 1e-12)[:, None]
            rs.append(jnp.where((w > 0)[:, None], r * scale, 0.0).reshape(-1))
        r_vp = res.vp_constraint_residual(line.uvec[None], line.wvec[None],
                                          vb, vps)
        rs.append(jnp.where(vw > 0, r_vp * jnp.sqrt(vw + 1e-12), 0.0))
        if use_heatmap:
            d, m = minimal_to_plucker(line.uvec, line.wvec)
            coor = line_world_to_pixel(kvec, qvec, tvec,
                                       jnp.broadcast_to(d, kvec.shape[:-1]
                                                        + (3,)),
                                       jnp.broadcast_to(m, kvec.shape[:-1]
                                                        + (3,)))  # [S, 3]
            r_hm = jax.vmap(
                lambda c, o, u, v, ln, p: _heatmap_residual(
                    c, o, u, v, ln, p, n_along, n_perp, 1.0))(
                coor, origin, u_ax, v_ax, seg_len, patches)  # [S, A]
            hw = (w > 0)[:, None] * cfg.heatmap_multiplier
            rs.append((r_hm * jnp.sqrt(hw + 1e-12)
                       * (hw > 0)).reshape(-1))
        return jnp.concatenate(rs)

    aux = (sup_views.kvec, sup_views.qvec, sup_views.tvec,
           batch.line2d.start, batch.line2d.end, weights, track_vps, vp_w,
           hm_patches, hm_origin, hm_u, hm_v, hm_len)
    result = lm_solve(params0, residual_one, retract_quat_so2, 4, aux,
                      num_iterations=num_iterations)
    return unpack_minimal_lines(result.params), result


def line_refinement(cfg: dict, tracks: List[LineTrack], imagecols,
                    vpresults: Optional[Dict[int, "object"]] = None,
                    num_iterations: int = 20) -> List[LineTrack]:
    """Python driver (line_refinement.py:15-136 in the reference):
    refine tracks, re-trim segments, return new tracks."""
    if not tracks:
        return tracks
    rcfg = RefinementConfig.from_dict(cfg) if isinstance(cfg, dict) else cfg
    id2idx = imagecols.img_id_to_index()
    views = imagecols.batch()
    batch = tracks_to_batch(tracks, id2idx)

    track_vps = None
    track_has_vp = None
    if vpresults is not None and rcfg.use_vp:
        T, S = batch.mask.shape
        vps = np.zeros((T, S, 3), np.float32)
        has = np.zeros((T, S), bool)
        img_ids = np.asarray(batch.image_ids)
        line_ids = np.asarray(batch.line_ids)
        mask = np.asarray(batch.mask)
        for ti in range(T):
            for si in range(S):
                if not mask[ti, si]:
                    continue
                resu = vpresults.get(int(img_ids[ti, si]))
                if resu is None:
                    continue
                lid = int(line_ids[ti, si])
                if lid < resu.count_lines() and resu.HasVP(lid):
                    vps[ti, si] = resu.GetVP(lid)
                    has[ti, si] = True
        track_vps = jnp.asarray(vps)
        track_has_vp = jnp.asarray(has)

    refined, _ = solve_line_refinement(batch, views, rcfg, track_vps,
                                       track_has_vp, num_iterations)
    out = get_output_tracks(batch, views, refined,
                            rcfg.num_outliers_aggregator)
    return batch_to_tracks(out)
