"""Line bundle adjustment / per-track refinement — batched LM on TPU.

Replaces the reference's Ceres engines for the fixed-camera paths:

- ``solve_line_bundle_adjustment`` == HybridBAEngine with
  ``set_constant_camera()`` as used by the triangulation runner
  (/root/reference/src/limap/runners/line_triangulation.py:210-219 and
  optimize/solve.py:31): each track's minimal (uvec, wvec) line is an
  independent 4-DOF problem -> thousands solved simultaneously by
  :func:`limap_tpu.optimize.lm.lm_solve`.
- ``get_output_tracks`` == GetOutputLineTracks: re-trim segments from the
  refined infinite lines via the supports
  (hybrid_bundle_adjustment.cc:298-310).

Robustness matches RefinementConfig: CauchyLoss(0.25) on the line
geometric term (refinement_config.h:21), applied as an IRLS weight with
stop_gradient (equivalent to Ceres' corrected residuals at convergence).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from limap_tpu.base.camera import CameraViewsBatch
from limap_tpu.base.infinite_line import (
    InfiniteLines3d, MinimalInfiniteLines3d,
    segment_from_infinite_line_2d_supports)
from limap_tpu.base.lines import Segments
from limap_tpu.base.linetrack import TrackBatch
from limap_tpu.optimize import residuals as res
from limap_tpu.optimize.lm import LMResult, lm_solve, retract_quat_so2


@dataclasses.dataclass(frozen=True)
class LineBAConfig:
    """Subset of HybridBAConfig / RefinementConfig relevant to the
    fixed-camera path (hybrid_bundle_adjustment_config.h:17-49)."""

    geometric_alpha: float = 10.0
    min_num_images: int = 4       # tracks below stay constant
    num_outliers_aggregator: int = 2
    loss: str = "cauchy"          # "trivial" | "cauchy" | "huber"
    loss_scale: float = 0.25
    max_num_iterations: int = 100

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "LineBAConfig":
        if d is None:
            return cls()
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


def robust_weight(r2: jnp.ndarray, loss: str, scale: float) -> jnp.ndarray:
    """IRLS weight rho'(s) for the given robust loss."""
    if loss == "trivial":
        return jnp.ones_like(r2)
    if loss == "cauchy":
        return 1.0 / (1.0 + r2 / (scale * scale))
    if loss == "huber":
        r = jnp.sqrt(r2 + 1e-12)
        return jnp.where(r <= scale, 1.0, scale / r)
    raise ValueError(f"unknown loss {loss}")


def pack_minimal_lines(lines: MinimalInfiniteLines3d) -> jnp.ndarray:
    return jnp.concatenate([lines.uvec, lines.wvec], axis=-1)


def unpack_minimal_lines(params: jnp.ndarray) -> MinimalInfiniteLines3d:
    return MinimalInfiniteLines3d(uvec=params[..., :4], wvec=params[..., 4:6])


import functools


@functools.lru_cache(maxsize=32)
def _build_ba_residual(cfg: LineBAConfig):
    """Residual closure per config — cached so repeated BA calls with
    the same config reuse one jitted LM program (function identity keys
    the jit cache inside lm_solve)."""

    def residual_one(params, kvec, qvec, tvec, p_start, p_end, w, valid):
        """One track: supports [S, ...] -> flattened residuals [2S]."""
        line = unpack_minimal_lines(params)
        vb = CameraViewsBatch(kvec, qvec, tvec)
        r = res.line_geometric_residual(
            line.uvec[None], line.wvec[None], vb,
            Segments(p_start, p_end), cfg.geometric_alpha)  # [S, 2]
        # padded supports carry arbitrary cameras/segments — zero them
        # BEFORE robust weighting so they cannot pollute the cost.
        r = jnp.where(valid[:, None], r, 0.0)
        r2 = jax.lax.stop_gradient(jnp.sum(r * r, axis=-1))
        rw = robust_weight(r2, cfg.loss, cfg.loss_scale)
        scale = jnp.sqrt(w * rw + 1e-12)[:, None]
        r = jnp.where((w > 0)[:, None], r * scale, 0.0)
        return r.reshape(-1)

    return residual_one


def solve_line_bundle_adjustment(
        batch: TrackBatch, views: CameraViewsBatch,
        cfg: LineBAConfig = LineBAConfig(),
        num_iterations: int = 20) -> Tuple[MinimalInfiniteLines3d, LMResult]:
    """Refine all track lines with fixed cameras; returns refined minimal
    lines + LM diagnostics.

    batch: padded tracks [T, S]; views: full image batch (rows gathered
    via batch.img_index).
    """
    init = MinimalInfiniteLines3d.from_segments(batch.line)
    params0 = pack_minimal_lines(init)

    sup_views = views.select(batch.img_index)       # [T, S, ...]
    weights = res.compute_line_weights(batch.line2d)  # [T, S]
    weights = weights * batch.mask
    # constant-line guard (hybrid_bundle_adjustment.cc:112-118): tracks
    # with too few images keep zero weights => zero update.
    n_img = batch.count_images()
    free = (n_img >= cfg.min_num_images) & batch.track_mask
    weights = weights * free[:, None]

    residual_one = _build_ba_residual(cfg)
    aux = (sup_views.kvec, sup_views.qvec, sup_views.tvec,
           batch.line2d.start, batch.line2d.end, weights, batch.mask)
    result = lm_solve(params0, residual_one, retract_quat_so2, 4, aux,
                      num_iterations=num_iterations)
    return unpack_minimal_lines(result.params), result


def get_output_tracks(batch: TrackBatch, views: CameraViewsBatch,
                      refined: MinimalInfiniteLines3d,
                      num_outliers: int = 2) -> TrackBatch:
    """Re-trim segments from refined infinite lines using the 2D supports
    (GetOutputLineTracks, hybrid_bundle_adjustment.cc:298-310)."""
    inf = refined.to_plucker()
    sup_views = views.select(batch.img_index)

    def trim_one(d, m, kvec, qvec, tvec, ps, pe, mask):
        line = InfiniteLines3d(d, m)
        vb = CameraViewsBatch(kvec, qvec, tvec)
        return segment_from_infinite_line_2d_supports(
            line, vb, Segments(ps, pe), mask, num_outliers)

    seg = jax.vmap(trim_one)(
        inf.d, inf.m, sup_views.kvec, sup_views.qvec, sup_views.tvec,
        batch.line2d.start, batch.line2d.end, batch.mask)
    # keep original line for padded/invalid tracks
    ok = batch.track_mask & (jnp.sum(batch.mask, 1) > 0)
    start = jnp.where(ok[:, None], seg.start, batch.line.start)
    end = jnp.where(ok[:, None], seg.end, batch.line.end)
    return batch._replace(line=Segments(start, end))
