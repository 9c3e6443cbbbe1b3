"""Pose-only optimization with point + line correspondences.

Re-implements /root/reference/src/limap/optimize/hybrid_localization:
the LineLocCostFunction zoo (hybrid_localization_config.h:18-33 and
cost_functions.h) as batched differentiable residuals, and the
LineLocEngine / JointLocEngine solvers as a single-problem LM over the
6-DOF pose (the batched engine also solves MANY queries at once — used
by RANSAC local optimization).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.base.camera import CameraViewsBatch
from limap_tpu.base.lines import EPS, Segments
from limap_tpu.base import line_geometry as lg
from limap_tpu.optimize.lm import lm_solve, retract_pose
from limap_tpu.optimize.line_ba import robust_weight

COST_FUNCTIONS = ("2d_midpoint_dist2", "2d_midpoint_angle_dist3",
                  "2d_perpendicular_dist2", "2d_perpendicular_dist4",
                  "3d_line_line_dist2", "3d_plane_line_dist2")
COST_WEIGHTS = ("none", "cosine", "line3dpp", "length", "invlength")

# reference enum / user-facing names (solve.py:6-51) -> ours
_COST_ALIASES = {
    "E2DMidpointDist2": "2d_midpoint_dist2",
    "E2DMidpointAngleDist3": "2d_midpoint_angle_dist3",
    "E2DPerpendicularDist2": "2d_perpendicular_dist2",
    "E2DPerpendicularDist4": "2d_perpendicular_dist4",
    "E3DLineLineDist2": "3d_line_line_dist2",
    "E3DPlaneLineDist2": "3d_plane_line_dist2",
    "ENoneWeight": "none", "ECosineWeight": "cosine",
    "ELine3dppWeight": "line3dpp", "ELengthWeight": "length",
    "EInvLengthWeight": "invlength",
    # user-facing spellings accepted by the reference's
    # get_lineloc_cost_func (solve.py:6-33)
    "MidpointDist": "2d_midpoint_dist2",
    "MidpointDist2": "2d_midpoint_dist2",
    "2DMidpointDist": "2d_midpoint_dist2",
    "2DMidpointDist2": "2d_midpoint_dist2",
    "MidpointAngle": "2d_midpoint_angle_dist3",
    "MidpointAngleDist": "2d_midpoint_angle_dist3",
    "2DMidpointAngleDist": "2d_midpoint_angle_dist3",
    "PerpendicularDist": "2d_perpendicular_dist2",
    "PerpendicularDist2": "2d_perpendicular_dist2",
    "2DPerpendicularDist": "2d_perpendicular_dist2",
    "2DPerpendicularDist2": "2d_perpendicular_dist2",
    "PerpendicularDist4": "2d_perpendicular_dist4",
    "2DPerpendicularDist4": "2d_perpendicular_dist4",
    "3DLineLineDist": "3d_line_line_dist2",
    "3DLineLineDist2": "3d_line_line_dist2",
    "3DPlaneLineDist": "3d_plane_line_dist2",
    "3DPlaneLineDist2": "3d_plane_line_dist2",
    "Cosine": "cosine", "Line3dpp": "line3dpp", "Length": "length",
    "InvLength": "invlength",
}


@dataclasses.dataclass(frozen=True)
class LineLocConfig:
    """LineLocConfig (hybrid_localization_config.h:35-66)."""

    cost_function: str = "2d_perpendicular_dist2"
    cost_function_weight: str = "none"
    weight_point: float = 1.0
    weight_line: float = 1.0
    loss: str = "trivial"
    loss_scale: float = 1.0
    max_num_iterations: int = 100
    alpha: float = 10.0

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "LineLocConfig":
        if d is None:
            return cls()
        d = {k: _COST_ALIASES.get(v, v) if isinstance(v, str) else v
             for k, v in d.items()}
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


def _weight_2d(weight_type: str, proj_dir: jnp.ndarray, l2d: Segments,
               alpha: float) -> jnp.ndarray:
    """Ceres_Compute2DWeight (cost_functions.h:29-62)."""
    if weight_type == "none":
        return jnp.ones(l2d.start.shape[:-1])
    direc = l2d.end - l2d.start
    norm = jnp.sqrt(jnp.sum(direc * direc, -1) + 1e-8)
    if weight_type == "length":
        return norm
    if weight_type == "invlength":
        return 1.0 / norm
    cos = jnp.abs(jnp.sum(proj_dir * direc, -1)) / norm
    cos = jnp.minimum(cos, 1.0)
    if weight_type == "cosine":
        return jnp.exp(alpha * (1.0 - cos))
    if weight_type == "line3dpp":
        return jnp.exp(alpha * jnp.arccos(cos))
    raise ValueError(f"unknown weight {weight_type!r}")


def line_loc_residuals(l3d: Segments, l2d: Segments,
                       views: CameraViewsBatch,
                       cfg: LineLocConfig) -> jnp.ndarray:
    """Per-correspondence residual block [..., R] (R in {2, 3, 4}).

    l3d/l2d broadcast; views hold the (single, broadcast) query pose.
    """
    proj = lg.project_segments(l3d, views)  # [..., 2]
    pd = proj.direction()
    w = _weight_2d(cfg.cost_function_weight, pd, l2d, cfg.alpha)[..., None]
    cf = cfg.cost_function

    if cf == "2d_midpoint_dist2":
        r = proj.midpoint() - l2d.midpoint()
    elif cf == "2d_midpoint_angle_dist3":
        md = proj.midpoint() - l2d.midpoint()
        dir1 = proj.direction()
        dir2 = l2d.direction()
        sine = jnp.abs(dir1[..., 0] * dir2[..., 1]
                       - dir1[..., 1] * dir2[..., 0])
        r = jnp.concatenate(
            [md, (proj.length() * sine)[..., None]], axis=-1)
    elif cf in ("2d_perpendicular_dist2", "2d_perpendicular_dist4"):
        # distance of observed endpoints to the projected infinite line
        # (cost_functions.h:94-117: disp * sine formulation)
        p2d = proj.midpoint()
        d2d = proj.direction()

        def per_endpoint(p):
            disp = p - p2d
            dn = jnp.sqrt(jnp.sum(disp * disp, -1) + 1e-8)
            sine = jnp.abs(d2d[..., 0] * disp[..., 1]
                           - d2d[..., 1] * disp[..., 0]) / dn
            return disp * sine[..., None]

        r4_start = per_endpoint(l2d.start)
        r4_end = per_endpoint(l2d.end)
        if cf == "2d_perpendicular_dist4":
            r = jnp.concatenate([r4_start, r4_end], axis=-1)
        else:
            r = jnp.concatenate(
                [jnp.sqrt(jnp.sum(r4_start**2, -1, keepdims=True) + 1e-8),
                 jnp.sqrt(jnp.sum(r4_end**2, -1, keepdims=True) + 1e-8)],
                axis=-1)
    elif cf == "3d_line_line_dist2":
        # 3D distance between the back-projected rays of the observed
        # endpoints and the 3D line (cost_functions.h Ceres_3DLineLineDist)
        C = views.center()
        d3 = l3d.direction()

        def ray_line_dist(p):
            ray = views.ray_direction(p)
            n = jnp.cross(ray, d3)
            nn = jnp.sum(n * n, -1)
            d = l3d.start - C
            generic = jnp.abs(jnp.sum(n * d, -1)) \
                / jnp.sqrt(jnp.maximum(nn, 1e-8))
            cr = jnp.cross(ray, d)
            parallel = jnp.sqrt(jnp.sum(cr * cr, -1)
                                / (jnp.sum(ray * ray, -1) + 1e-8) + 1e-8)
            return jnp.where(nn <= 1e-8, parallel, generic)

        r = jnp.stack([ray_line_dist(l2d.start), ray_line_dist(l2d.end)],
                      axis=-1)
    elif cf == "3d_plane_line_dist2":
        # distance of the 3D endpoints to the back-projection plane of
        # the observed 2D segment
        C = views.center()
        n = jnp.cross(views.ray_direction(l2d.start),
                      views.ray_direction(l2d.end))
        n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + EPS)
        r = jnp.stack(
            [jnp.abs(jnp.sum(n * (l3d.start - C), -1)),
             jnp.abs(jnp.sum(n * (l3d.end - C), -1))], axis=-1)
    else:
        raise ValueError(f"unknown cost function {cf!r}")
    return r * w


def pack_pose(qvec, tvec) -> jnp.ndarray:
    return jnp.concatenate([jnp.asarray(qvec, jnp.float32).reshape(-1),
                            jnp.asarray(tvec, jnp.float32).reshape(-1)])


def solve_jointloc(l3d_start: np.ndarray, l3d_end: np.ndarray,
                   l2d_start: np.ndarray, l2d_end: np.ndarray,
                   p3ds: np.ndarray, p2ds: np.ndarray,
                   kvec: np.ndarray, qvec0: np.ndarray, tvec0: np.ndarray,
                   cfg: LineLocConfig = LineLocConfig(),
                   line_mask=None, point_mask=None,
                   num_iterations: int = 50):
    """JointLocEngine: optimize one pose from point+line matches.

    Arrays may be empty.  Returns (qvec, tvec, final_cost).
    """
    nl = len(l3d_start)
    npt = len(p3ds)
    if line_mask is None:
        line_mask = np.ones(nl, bool)
    if point_mask is None:
        point_mask = np.ones(npt, bool)

    # data enters via aux (leading [1] batch dim) so the residual
    # function identity — and therefore the cached fused LM program —
    # is reused across calls (repeated LO refits would otherwise
    # retrace the whole solver every call)
    def b(x, shape, dtype=jnp.float32):
        return jnp.asarray(x, dtype).reshape((1,) + shape)

    aux = (b(l3d_start, (nl, 3)), b(l3d_end, (nl, 3)),
           b(l2d_start, (nl, 2)), b(l2d_end, (nl, 2)),
           b(line_mask, (nl,), jnp.bool_),
           b(p3ds, (npt, 3)), b(p2ds, (npt, 2)),
           b(point_mask, (npt,), jnp.bool_),
           b(kvec, (4,)))
    residual_fn = _jointloc_residual(cfg, nl > 0, npt > 0)

    params0 = pack_pose(qvec0, tvec0)[None]
    result = lm_solve(params0, residual_fn, retract_pose, 6, aux=aux,
                      num_iterations=num_iterations)
    p = np.asarray(result.params[0])
    return p[:4], p[4:7], float(result.cost[0])


import functools


@functools.lru_cache(maxsize=64)
def _jointloc_residual(cfg: LineLocConfig, has_lines: bool,
                       has_points: bool):
    """Cached residual function for solve_jointloc (stable identity ->
    the LM program in optimize/lm.py compiles once per config+shape)."""

    def residual_fn(params, l3s, l3e, l2s, l2e, lmask, p3, p2, pmask, kv):
        views = CameraViewsBatch(kv, params[:4], params[4:7])
        rs = []
        if has_lines:
            l3d = Segments(l3s, l3e)
            l2d = Segments(l2s, l2e)
            r_line = line_loc_residuals(l3d, l2d, views, cfg)  # [nl, R]
            r2 = jax.lax.stop_gradient(jnp.sum(r_line**2, -1))
            rw = robust_weight(r2, cfg.loss, cfg.loss_scale)
            scale = jnp.sqrt(cfg.weight_line * rw + 1e-12)
            r_line = jnp.where(lmask[:, None], r_line * scale[:, None], 0.0)
            rs.append(r_line.reshape(-1))
        if has_points:
            r_pt = views.project(p3) - p2
            r2 = jax.lax.stop_gradient(jnp.sum(r_pt**2, -1))
            rw = robust_weight(r2, cfg.loss, cfg.loss_scale)
            scale = jnp.sqrt(cfg.weight_point * rw + 1e-12)
            r_pt = jnp.where(pmask[:, None], r_pt * scale[:, None], 0.0)
            rs.append(r_pt.reshape(-1))
        return jnp.concatenate(rs) if rs else jnp.zeros((1,))

    return residual_fn
