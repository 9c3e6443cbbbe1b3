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
    # cross-view feature consistency (refinement_config.h:83-88)
    fconsis_multiplier: float = 1.0
    n_samples_feature: int = 100
    sample_range_min: float = 0.05
    sample_range_max: float = 0.95


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


def build_fconsis_terms(batch: TrackBatch, views: CameraViewsBatch,
                        featuremaps: Dict[int, "object"], id2row,
                        n_samples: int = 10,
                        sample_range=(0.05, 0.95),
                        patch_radius: int = 10, max_terms: int = 64):
    """Cross-view feature-consistency terms per track
    (ComputeFConsistencySamples, base/linetrack.cc:353-447 + the
    FeatureConsisTgtFunctor wiring, refine.cc:363-500).

    For each track: sample points along the 3D line, select for each
    sample the longest well-aligned supporting image as the *reference*
    and pair it with every other supporting image as a *target*.  Each
    (sample, ref, tgt) term carries the sample's perpendicular 2D line
    in the reference image and two local feature patches (ref and tgt)
    cut around the initial intersection points — patches keep device
    memory bounded exactly like the reference's use_patches mode.

    featuremaps: {img_id: [H, W, C] float array}.
    Returns padded arrays:
      (ref_kvec/qvec/tvec [T,F,·], tgt_kvec/qvec/tvec [T,F,·],
       sample_coords [T,F,3], ref_patch/tgt_patch [T,F,P,P,C],
       ref_origin/tgt_origin [T,F,2], term_w [T,F])
    """
    import numpy as np

    id2row_inv = {row: img_id for img_id, row in id2row.items()}
    T = batch.num_tracks
    F = max_terms
    P = 2 * patch_radius + 1
    C = next(iter(featuremaps.values())).shape[-1] if featuremaps else 1
    z = np.zeros
    out = dict(
        ref_view=z((T, F), np.int32), tgt_view=z((T, F), np.int32),
        coords=z((T, F, 3), np.float32),
        ref_patch=z((T, F, P, P, C), np.float32),
        tgt_patch=z((T, F, P, P, C), np.float32),
        ref_origin=z((T, F, 2), np.float32),
        tgt_origin=z((T, F, 2), np.float32),
        w=z((T, F), np.float32))

    line_start = np.asarray(batch.line.start)
    line_end = np.asarray(batch.line.end)
    img_index = np.asarray(batch.img_index)
    mask = np.asarray(batch.mask)
    l2s = np.asarray(batch.line2d.start)
    l2e = np.asarray(batch.line2d.end)
    kv = np.asarray(views.kvec)
    qv = np.asarray(views.qvec)
    tv = np.asarray(views.tvec)

    def project(row, p3):
        from limap_tpu.base.pose import quat_rotate
        import jax.numpy as jnp
        pc = np.asarray(quat_rotate(jnp.asarray(qv[row]),
                                    jnp.asarray(p3))) + tv[row]
        return np.array([kv[row, 0] * pc[0] / pc[2] + kv[row, 2],
                         kv[row, 1] * pc[1] / pc[2] + kv[row, 3]])

    def cut_patch(fmap, center):
        H, W, _ = fmap.shape
        cy = int(round(center[1]))
        cx = int(round(center[0]))
        y0, x0 = cy - patch_radius, cx - patch_radius
        patch = np.zeros((P, P, fmap.shape[-1]), np.float32)
        ys0, xs0 = max(0, y0), max(0, x0)
        ys1, xs1 = min(H, y0 + P), min(W, x0 + P)
        if ys1 > ys0 and xs1 > xs0:
            patch[ys0 - y0:ys1 - y0, xs0 - x0:xs1 - x0] = \
                fmap[ys0:ys1, xs0:xs1]
        return patch, np.array([x0, y0], np.float32)

    for ti in range(T):
        sup = np.nonzero(mask[ti])[0]
        if len(sup) < 2:
            continue
        fill = 0
        ts = np.linspace(0.0, 1.0, n_samples)
        for t in ts:
            p3 = line_start[ti] * (1 - t) + line_end[ti] * t
            # supports whose projection falls inside the sample range
            good = []
            for si in sup:
                row = img_index[ti, si]
                if int(row) not in id2row_inv:
                    continue
                xy = project(row, p3)
                d2 = l2e[ti, si] - l2s[ti, si]
                ln = np.linalg.norm(d2)
                if ln < 1e-6:
                    continue
                proj = (xy - l2s[ti, si]) @ (d2 / ln) / ln
                if sample_range[0] <= proj <= sample_range[1]:
                    good.append((si, ln, xy))
            if len(good) < 2:
                continue
            # reference = longest supporting line
            good.sort(key=lambda g: -g[1])
            ref_si, _, ref_xy = good[0]
            ref_row = int(img_index[ti, ref_si])
            d2 = l2e[ti, ref_si] - l2s[ti, ref_si]
            d2 = d2 / (np.linalg.norm(d2) + 1e-12)
            perp = np.array([-d2[1], d2[0]])
            # homogeneous coords of the perpendicular sample line
            coords = np.array([perp[1], -perp[0],
                               perp[0] * ref_xy[1] - perp[1] * ref_xy[0]])
            n = np.linalg.norm(coords[:2]) + 1e-12
            coords = coords / n
            ref_fmap = featuremaps.get(id2row_inv[ref_row])
            if ref_fmap is None:
                continue
            ref_patch, ref_origin = cut_patch(ref_fmap, ref_xy)
            for (tgt_si, _, tgt_xy) in good[1:]:
                if fill >= F:
                    break
                tgt_row = int(img_index[ti, tgt_si])
                tgt_fmap = featuremaps.get(id2row_inv[tgt_row])
                if tgt_fmap is None:
                    continue
                tgt_patch, tgt_origin = cut_patch(tgt_fmap, tgt_xy)
                out["ref_view"][ti, fill] = ref_row
                out["tgt_view"][ti, fill] = tgt_row
                out["coords"][ti, fill] = coords
                out["ref_patch"][ti, fill] = ref_patch
                out["tgt_patch"][ti, fill] = tgt_patch
                out["ref_origin"][ti, fill] = ref_origin
                out["tgt_origin"][ti, fill] = tgt_origin
                out["w"][ti, fill] = 1.0
                fill += 1
        # reference weight normalization (refine.cc:394-396)
        if fill:
            out["w"][ti, :fill] = 1.0 / max(
                (n_samples / 100.0) * (fill / n_samples / 5.0 + 1e-9),
                1e-3)
    import jax.numpy as jnp
    return tuple(jnp.asarray(out[k]) for k in
                 ("ref_view", "tgt_view", "coords", "ref_patch",
                  "tgt_patch", "ref_origin", "tgt_origin", "w"))


def _fconsis_residual(uvec, wvec, views, ref_view, tgt_view, coords,
                      ref_patch, tgt_patch, ref_origin, tgt_origin):
    """Feature difference between the line-sample intersections in the
    reference and target views (FeatureConsisTgtFunctor,
    pixel_cost_functions.h:200+), differentiable w.r.t. the minimal
    line.  All args are per-term ([F, ...])."""
    import jax.numpy as jnp

    from limap_tpu.base.infinite_line import (line_world_to_pixel,
                                              minimal_to_plucker)
    from limap_tpu.features.featuremap import interpolate_bilinear
    from limap_tpu.triangulation.functions import epipolar_line

    d, m = minimal_to_plucker(uvec, wvec)
    F = coords.shape[0]
    vref = views.select(ref_view)
    vtgt = views.select(tgt_view)
    db = jnp.broadcast_to(d, (F, 3))
    mb = jnp.broadcast_to(m, (F, 3))
    coor_ref = line_world_to_pixel(vref.kvec, vref.qvec, vref.tvec, db,
                                   mb)                      # [F, 3]
    x_ref_h = jnp.cross(coor_ref, coords)
    x_ref = x_ref_h[..., :2] / (x_ref_h[..., 2:3] + 1e-12)
    epl = epipolar_line(vref, vtgt, x_ref)
    coor_tgt = line_world_to_pixel(vtgt.kvec, vtgt.qvec, vtgt.tvec, db,
                                   mb)
    x_tgt_h = jnp.cross(coor_tgt, epl)
    x_tgt = x_tgt_h[..., :2] / (x_tgt_h[..., 2:3] + 1e-12)

    Pp = ref_patch.shape[1]

    def sample(patch, origin, xy):
        local = xy - origin                      # (x, y) in patch coords
        pts = jnp.stack([local[..., 1], local[..., 0]], -1)  # (row, col)
        inside = jnp.all((pts >= 0) & (pts <= Pp - 1), -1)
        vals = interpolate_bilinear(patch, pts[None, :])[0]
        return vals, inside

    f_ref, in_ref = jax.vmap(sample)(ref_patch, ref_origin, x_ref)
    f_tgt, in_tgt = jax.vmap(sample)(tgt_patch, tgt_origin, x_tgt)
    ok = (in_ref & in_tgt)[:, None]
    return jnp.where(ok, f_tgt - f_ref, 0.0)    # [F, C]


def solve_line_refinement(
        batch: TrackBatch, views: CameraViewsBatch,
        cfg: RefinementConfig = RefinementConfig(),
        track_vps: Optional[jnp.ndarray] = None,
        track_has_vp: Optional[jnp.ndarray] = None,
        heatmap_data=None,
        fconsis_data=None,
        num_iterations: int = 20):
    """Refine all tracks; optional per-(track, support) VP constraints,
    heatmap terms (pass ``heatmap_data`` from
    :func:`build_heatmap_patches`) and cross-view feature-consistency
    terms (pass ``fconsis_data`` from :func:`build_fconsis_terms`).

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

    use_fconsis = cfg.use_feature and fconsis_data is not None
    if use_fconsis:
        (fc_ref_view, fc_tgt_view, fc_coords, fc_ref_patch, fc_tgt_patch,
         fc_ref_origin, fc_tgt_origin, fc_w) = fconsis_data
    else:
        Fz, Pz, Cz = 1, 1, 1
        fc_ref_view = jnp.zeros((batch.num_tracks, Fz), jnp.int32)
        fc_tgt_view = jnp.zeros((batch.num_tracks, Fz), jnp.int32)
        fc_coords = jnp.zeros((batch.num_tracks, Fz, 3))
        fc_ref_patch = jnp.zeros((batch.num_tracks, Fz, Pz, Pz, Cz))
        fc_tgt_patch = jnp.zeros((batch.num_tracks, Fz, Pz, Pz, Cz))
        fc_ref_origin = jnp.zeros((batch.num_tracks, Fz, 2))
        fc_tgt_origin = jnp.zeros((batch.num_tracks, Fz, 2))
        fc_w = jnp.zeros((batch.num_tracks, Fz))

    from limap_tpu.base.infinite_line import (line_world_to_pixel,
                                              minimal_to_plucker)

    def residual_one(params, kvec, qvec, tvec, ps, pe, w, vps, vw,
                     patches, origin, u_ax, v_ax, seg_len,
                     fr_view, ft_view, f_coords, fr_patch, ft_patch,
                     fr_origin, ft_origin, f_w):
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
        if use_fconsis:
            r_fc = _fconsis_residual(line.uvec, line.wvec, views,
                                     fr_view, ft_view, f_coords,
                                     fr_patch, ft_patch, fr_origin,
                                     ft_origin)            # [F, C]
            fw = f_w[:, None] * cfg.fconsis_multiplier
            rs.append((r_fc * jnp.sqrt(fw + 1e-12)
                       * (fw > 0)).reshape(-1))
        return jnp.concatenate(rs)

    aux = (sup_views.kvec, sup_views.qvec, sup_views.tvec,
           batch.line2d.start, batch.line2d.end, weights, track_vps, vp_w,
           hm_patches, hm_origin, hm_u, hm_v, hm_len,
           fc_ref_view, fc_tgt_view, fc_coords, fc_ref_patch,
           fc_tgt_patch, fc_ref_origin, fc_tgt_origin, fc_w)
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
