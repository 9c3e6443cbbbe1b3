"""Hybrid point-line absolute pose estimation (PnPL).

Re-designs /root/reference/src/limap/estimators/absolute_pose: the
LO-RANSAC loops (joint_pose_estimator.cc, pl_absolute_pose_ransac.h,
pl_absolute_pose_hybrid_ransac.h) become one batched kernel — minimal
samples of all four solver types {P3P, P2P1LL, P1P2LL, P3LL} (the
reference's PoseLib dispatch, joint_pose_estimator.cc:113-122) are
drawn with combinatorial type probabilities and solved simultaneously,
all (pose, correspondence) scores evaluated as one [H, N] matrix —
with Levenberg-Marquardt local optimization (the reference's
non-minimal Ceres step) on the best model's inliers.  Works from 3
points, 3 lines, or any mix.

Front door mirrors ``pl_estimate_absolute_pose``
(_pl_estimate_absolute_pose.py:9-147): method None = direct nonlinear
optimization; "ransac"/"solver"/"hybrid" = sample + score both data
types + local optimization.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.base.camera import CameraViewsBatch
from limap_tpu.base.lines import Segments
from limap_tpu.base.pose import rotmat_to_quat
from limap_tpu.estimators.p3p import p3p
from limap_tpu.estimators.pnl_solvers import (line2d_to_normal, p1p2ll,
                                              p2p1ll, p3ll)
from limap_tpu.optimize.hybrid_localization import (LineLocConfig,
                                                    line_loc_residuals,
                                                    solve_jointloc)


@dataclasses.dataclass(frozen=True)
class RansacOptions:
    """Options surface of _pl_estimate_absolute_pose.py:110-146."""

    method: Optional[str] = "hybrid"   # None | "ransac" | "solver" | "hybrid"
    thres: float = 10.0                # point reprojection threshold (px)
    thres_point: float = 10.0
    thres_line: float = 10.0
    n_hypotheses: int = 1024
    weight_point: float = 1.0
    weight_line: float = 1.0
    final_least_squares: bool = True

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "RansacOptions":
        if d is None:
            return cls()
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


@jax.jit
def _score_poses(Rs, ts, kvec, p3ds, p2ds, l3d_s, l3d_e, l2d_s, l2d_e,
                 th_point, th_line, w_point, w_line):
    """Score [H] candidate poses against both data types.

    Returns (scores [H], point_inliers [H, Np], line_inliers [H, Nl]).
    """
    qvecs = rotmat_to_quat(Rs)
    views = CameraViewsBatch(jnp.broadcast_to(kvec, Rs.shape[:-2] + (4,)),
                             qvecs, ts)
    # points
    vp = CameraViewsBatch(views.kvec[:, None], views.qvec[:, None],
                          views.tvec[:, None])
    proj = vp.project(p3ds[None])  # [H, Np, 2]
    err_pt = jnp.linalg.norm(proj - p2ds[None], axis=-1)
    depth_ok = vp.projdepth(p3ds[None]) > 1e-6
    pt_inlier = (err_pt <= th_point) & depth_ok

    # lines: max endpoint-perpendicular distance of observed endpoints
    # to the projected line
    l3 = Segments(l3d_s[None], l3d_e[None])
    l2 = Segments(l2d_s[None], l2d_e[None])
    cfg = LineLocConfig(cost_function="2d_perpendicular_dist2")
    r = line_loc_residuals(l3, l2, vp, cfg)  # [H, Nl, 2]
    err_line = jnp.max(jnp.abs(r), axis=-1)
    line_depth_ok = (vp.projdepth(l3.start) > 1e-6) \
        & (vp.projdepth(l3.end) > 1e-6)
    line_inlier = (err_line <= th_line) & line_depth_ok

    scores = (w_point * jnp.sum(pt_inlier, -1)
              + w_line * jnp.sum(line_inlier, -1))
    return scores, pt_inlier, line_inlier


def pl_estimate_absolute_pose(cfg: dict, l3ds, l3d_ids, l2ds, p3ds, p2ds,
                              camera, campose=None, inliers_line=None,
                              inliers_point=None, jointloc_cfg=None,
                              seed: int = 0, silent: bool = True):
    """Front door (reference _pl_estimate_absolute_pose.py:9).

    Args:
      cfg: {"ransac": {...}, "optimize": {...}, "line_cost_func": ...}
      l3ds: list of (2, 3) 3D segments (track lines).
      l3d_ids: per 2D line, index into l3ds.
      l2ds: list of (2, 2) observed 2D segments.
      p3ds, p2ds: point correspondences.
      camera: Camera (pinhole); campose: optional initial CameraPose.

    Returns (CameraPose, ransac_stats | None).
    """
    from limap_tpu.base.camera import CameraPose

    ransac_cfg = RansacOptions.from_dict(cfg.get("ransac"))
    loc_cfg = LineLocConfig.from_dict(cfg.get("optimize"))
    if "line_cost_func" in cfg:
        loc_cfg = dataclasses.replace(
            loc_cfg, cost_function=LineLocConfig.from_dict(
                {"cost_function": cfg["line_cost_func"]}).cost_function)

    l3ds = np.asarray(l3ds, np.float64).reshape(-1, 2, 3)
    l3d_ids = np.asarray(l3d_ids, np.int64).reshape(-1)
    l2ds = np.asarray(l2ds, np.float64).reshape(-1, 2, 2)
    p3ds = np.asarray(p3ds, np.float64).reshape(-1, 3)
    p2ds = np.asarray(p2ds, np.float64).reshape(-1, 2)
    l3d_sel = l3ds[l3d_ids] if len(l3d_ids) else np.zeros((0, 2, 3))
    kvec = camera.kvec()

    if ransac_cfg.method is None:
        # direct optimization from the provided pose (+ optional inliers)
        if inliers_point is not None:
            p3ds, p2ds = p3ds[inliers_point], p2ds[inliers_point]
        if inliers_line is not None:
            l3d_sel, l2ds = l3d_sel[inliers_line], l2ds[inliers_line]
        assert campose is not None, "direct optimization needs a prior pose"
        q, t, cost = solve_jointloc(
            l3d_sel[:, 0], l3d_sel[:, 1], l2ds[:, 0], l2ds[:, 1], p3ds,
            p2ds, kvec, campose.qvec, campose.tvec, loc_cfg)
        return CameraPose(q, t), None

    # ---- batched hybrid RANSAC over the 4 minimal solver types ----
    # Sample counts per type follow the reference's combinatorial
    # solver probabilities (hybrid_pose_estimator.h:45-127): weight of
    # each {points, lines} split is the number of distinct minimal
    # samples of that type.
    n_pts = len(p3ds)
    n_lines = len(l2ds)
    key = jax.random.PRNGKey(seed)
    H = ransac_cfg.n_hypotheses
    kv = jnp.asarray(kvec, jnp.float32)
    p3_j = jnp.asarray(p3ds, jnp.float32)
    p2_j = jnp.asarray(p2ds, jnp.float32)

    def comb(n, k):
        from math import comb as _c
        return float(_c(n, k)) if n >= k else 0.0

    weights = {
        "p3p": comb(n_pts, 3),
        "p2p1ll": comb(n_pts, 2) * n_lines,
        "p1p2ll": n_pts * comb(n_lines, 2),
        "p3ll": comb(n_lines, 3),
    }
    total_w = sum(weights.values())
    if total_w == 0:
        raise ValueError(
            "PnPL RANSAC needs >= 3 correspondences (points + lines)")
    n_samples = {k: int(round(H * w / total_w)) for k, w in weights.items()}

    def bearings(p2d):
        u = (p2d[..., 0] - kv[2]) / kv[0]
        v = (p2d[..., 1] - kv[3]) / kv[1]
        b = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)
        return b / jnp.linalg.norm(b, axis=-1, keepdims=True)

    # line observations in solver form (camera-plane normals + 3D
    # point/direction); safe placeholders when there are no lines
    if n_lines:
        l2s_j = jnp.asarray(l2ds[:, 0], jnp.float32)
        l2e_j = jnp.asarray(l2ds[:, 1], jnp.float32)
        ln_n = line2d_to_normal(l2s_j, l2e_j, kv)        # [Nl, 3]
        ln_P = jnp.asarray(
            0.5 * (l3d_sel[:, 0] + l3d_sel[:, 1]), jnp.float32)
        ln_V = l3d_sel[:, 1] - l3d_sel[:, 0]
        ln_V = jnp.asarray(
            ln_V / (np.linalg.norm(ln_V, axis=-1, keepdims=True) + 1e-12),
            jnp.float32)

    blocks = []  # (Rs, ts, ok) per solver type
    keys = jax.random.split(key, 8)

    if n_samples["p3p"] > 0:
        idx = jax.random.randint(keys[0], (n_samples["p3p"], 3), 0, n_pts)
        # degenerate (repeated) samples score poorly; no need to reject
        Rs, ts, ok = p3p(bearings(p2_j[idx]), p3_j[idx])   # [H1, 4, ...]
        blocks.append((Rs, ts, ok))
    if n_samples["p2p1ll"] > 0:
        hp = n_samples["p2p1ll"]
        ip = jax.random.randint(keys[1], (hp, 2), 0, n_pts)
        il = jax.random.randint(keys[2], (hp,), 0, n_lines)
        Rs, ts, ok = p2p1ll(bearings(p2_j[ip]), p3_j[ip],
                            ln_n[il], ln_P[il], ln_V[il], n_roots=4)
        blocks.append((Rs, ts, ok))
    if n_samples["p1p2ll"] > 0:
        hp = n_samples["p1p2ll"]
        ip = jax.random.randint(keys[3], (hp,), 0, n_pts)
        il = jax.random.randint(keys[4], (hp, 2), 0, n_lines)
        Rs, ts, ok = p1p2ll(bearings(p2_j[ip]), p3_j[ip],
                            ln_n[il], ln_P[il], ln_V[il], n_roots=4)
        blocks.append((Rs, ts, ok))
    if n_samples["p3ll"] > 0:
        hp = n_samples["p3ll"]
        il = jax.random.randint(keys[5], (hp, 3), 0, n_lines)
        Rs, ts, ok = p3ll(ln_n[il], ln_P[il], ln_V[il], n_roots=4)
        blocks.append((Rs, ts, ok))

    Rs = jnp.concatenate([b[0].reshape(-1, 3, 3) for b in blocks], axis=0)
    ts = jnp.concatenate([b[1].reshape(-1, 3) for b in blocks], axis=0)
    ok = jnp.concatenate([b[2].reshape(-1) for b in blocks], axis=0)

    l3s = jnp.asarray(l3d_sel[:, 0], jnp.float32)
    l3e = jnp.asarray(l3d_sel[:, 1], jnp.float32)
    l2s = jnp.asarray(l2ds[:, 0], jnp.float32)
    l2e = jnp.asarray(l2ds[:, 1], jnp.float32)
    scores, pt_inl, ln_inl = _score_poses(
        Rs, ts, kv, p3_j, p2_j, l3s, l3e, l2s, l2e,
        ransac_cfg.thres_point, ransac_cfg.thres_line,
        ransac_cfg.weight_point, ransac_cfg.weight_line)
    scores = jnp.where(ok, scores, -1.0)
    best = int(jnp.argmax(scores))

    R_best = np.asarray(Rs[best])
    t_best = np.asarray(ts[best])
    point_inliers = np.asarray(pt_inl[best])
    line_inliers = np.asarray(ln_inl[best])
    stats = {
        "best_num_inliers": float(scores[best]),
        "inlier_ratio": float(
            (point_inliers.sum() + line_inliers.sum())
            / max(n_pts + len(l2ds), 1)),
        "point_inliers": point_inliers,
        "line_inliers": line_inliers,
    }

    pose = CameraPose(R=R_best, tvec=t_best)
    if ransac_cfg.final_least_squares:
        q, t, _ = solve_jointloc(
            l3d_sel[:, 0], l3d_sel[:, 1], l2ds[:, 0], l2ds[:, 1],
            p3ds, p2ds, kvec, pose.qvec, pose.tvec, loc_cfg,
            line_mask=line_inliers, point_mask=point_inliers)
        pose = CameraPose(q, t)
    return pose, stats
