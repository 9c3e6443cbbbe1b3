"""Distributed hybrid (pose + intrinsics + line + point) bundle
adjustment.

The reference's HybridBAEngine hands one big sparse problem to Ceres and
picks a Schur solver by image count
(/root/reference/src/limap/optimize/hybrid_bundle_adjustment/hybrid_bundle_adjustment.cc:227-264:
DENSE_SCHUR <= 50 images, SPARSE_SCHUR <= 900, ITERATIVE_SCHUR +
SCHUR_JACOBI beyond).  The TPU-native design shards *tracks* (line and
point) across the device mesh and keeps cameras replicated:

  per device, per local track:
    residuals + Jacobians (landmark tangent [4|3], camera tangent
    [6 (+2 focal)]) via jacfwd
    eliminate the small landmark block locally (Schur complement)
    accumulate the reduced camera system
  psum over the track axis  <- the only cross-chip traffic
  solve the damped reduced system (replicated):
    dense Cholesky-style solve for small scenes, or matrix-free
    preconditioned CG over the per-track Schur terms (the
    ITERATIVE_SCHUR + SCHUR_JACOBI equivalent — the reduced matrix is
    never materialized, so memory stays linear in images)
  back-substitute landmark updates locally (no communication)

Camera parameters live in one flat tangent vector
``[I*6 poses | C*2 focal]``; every support row carries the column
indices of its blocks, so lines, points and optional per-camera focal
lengths all accumulate through one scatter scheme.  Residuals:

- line: cosine-weighted endpoint-perpendicular distance to the
  projected infinite line (line_refinement/cost_functions.h:96-195)
- point: pixel reprojection error, weighted ``lw_point``
  (hybrid_bundle_adjustment.cc:125-154, config lw_point = 0.1)

Constancy flags mirror HybridBAConfig
(hybrid_bundle_adjustment_config.h:21-33): constant_pose,
constant_line, constant_point, constant_intrinsics (focal is optimized
only when ``optimize_focal`` is set — the reference's default subset
manifold fixes the principal point and optimizes focal,
hybrid_bundle_adjustment.cc:69-76).

One step == one Gauss-Newton/LM iteration of the joint problem; iterate
from the driver.  Gauge freedom is fixed by freezing the first pose.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from limap_tpu.base.camera import CameraViewsBatch
from limap_tpu.base.lines import Segments
from limap_tpu.optimize import residuals as res
from limap_tpu.optimize.lm import retract_pose, retract_quat_so2
from limap_tpu.optimize.line_ba import robust_weight, unpack_minimal_lines
from limap_tpu.parallel.mesh import TRACK_AXIS


@dataclasses.dataclass(frozen=True)
class HybridBAOptions:
    geometric_alpha: float = 10.0
    loss: str = "cauchy"
    loss_scale: float = 0.25
    damping: float = 1e-3
    n_fixed_poses: int = 1  # gauge fixing
    lw_point: float = 0.1   # hybrid_bundle_adjustment_config.h:37
    constant_pose: bool = False
    constant_line: bool = False
    constant_point: bool = False
    optimize_focal: bool = False  # frees (fx, fy) per camera
    solver: str = "auto"    # auto | dense | cg
    dense_threshold: int = 256  # images; beyond -> CG (ITERATIVE_SCHUR)
    cg_iters: int = 64


class HybridBAState(NamedTuple):
    line_params: jnp.ndarray   # [Tl, 6] minimal lines (sharded)
    point_params: jnp.ndarray  # [Tp, 3] points (sharded)
    pose_params: jnp.ndarray   # [I, 7] (qvec, tvec), replicated
    cam_fxfy: jnp.ndarray      # [C, 2] focal lengths, replicated


def _weighted(r, weight, opts):
    r = jnp.where((weight > 0)[:, None], r, 0.0)
    r2 = jax.lax.stop_gradient(jnp.sum(r * r, axis=-1))
    rw = robust_weight(r2, opts.loss, opts.loss_scale)
    scale = jnp.sqrt(weight * rw + 1e-12)[:, None]
    return jnp.where((weight > 0)[:, None], r * scale, 0.0)


def _views(pose_packed, kvec_base, cam_fxfy, cam_index, d_cam):
    """Per-support views with perturbed focal (d_cam [S, 2])."""
    fxfy = cam_fxfy[cam_index] + d_cam
    kvec = jnp.concatenate([fxfy, kvec_base[:, 2:4]], axis=-1)
    return CameraViewsBatch(kvec, pose_packed[:, :4], pose_packed[:, 4:7])


def _schur_terms(r0, J_land, J_cam, damping, land_dim):
    """Generic landmark elimination.

    r0 [S, R]; J_land [S, R, L]; J_cam [S, R, Dc].
    Returns (H_pp_diag [S,Dc,Dc], S_red [S,S,Dc,Dc], g_red [S,Dc],
    H_ll_inv [L,L], b_l [L], H_cl [S,Dc,L]).
    """
    H_ll = jnp.einsum("sra,srb->ab", J_land, J_land)
    b_l = jnp.einsum("sra,sr->a", J_land, r0)
    H_cl = jnp.einsum("srp,sra->spa", J_cam, J_land)
    g_c = jnp.einsum("srp,sr->sp", J_cam, r0)
    H_cc_diag = jnp.einsum("srp,srq->spq", J_cam, J_cam)
    H_ll_inv = jnp.linalg.inv(H_ll + (damping + 1e-8) * jnp.eye(land_dim))
    A = H_cl @ H_ll_inv
    S_red = -jnp.einsum("spa,tqa->stpq", A, H_cl)
    g_red = g_c - jnp.einsum("spa,a->sp", A, b_l)
    return H_cc_diag, S_red, g_red, H_ll_inv, b_l, H_cl


def _line_track_terms(line_params, pose_params, cam_fxfy, kvec, cam_index,
                      img_index, l2d_start, l2d_end, weight,
                      opts: HybridBAOptions, lam=None):
    if lam is None:
        lam = opts.damping
    S = img_index.shape[0]

    def f(delta_l, delta_p, delta_c):
        lp = retract_quat_so2(line_params, delta_l)
        q = pose_params[img_index, :4]
        t = pose_params[img_index, 4:7]
        packed = jax.vmap(retract_pose)(
            jnp.concatenate([q, t], axis=-1), delta_p)
        views = _views(packed, kvec, cam_fxfy, cam_index, delta_c)
        line = unpack_minimal_lines(lp)
        r = res.line_geometric_residual(line.uvec[None], line.wvec[None],
                                        views,
                                        Segments(l2d_start, l2d_end),
                                        opts.geometric_alpha)
        return _weighted(r, weight, opts)

    z_l = jnp.zeros(4)
    z_p = jnp.zeros((S, 6))
    z_c = jnp.zeros((S, 2))
    r0 = f(z_l, z_p, z_c)
    J_l = jax.jacfwd(f, argnums=0)(z_l, z_p, z_c)          # [S, 2, 4]
    J_p = jax.jacfwd(f, argnums=1)(z_l, z_p, z_c)          # [S,2,S,6]
    J_p = jnp.moveaxis(jnp.diagonal(J_p, axis1=0, axis2=2), -1, 0)
    if opts.optimize_focal:
        J_c = jax.jacfwd(f, argnums=2)(z_l, z_p, z_c)      # [S,2,S,2]
        J_c = jnp.moveaxis(jnp.diagonal(J_c, axis1=0, axis2=2), -1, 0)
        J_cam = jnp.concatenate([J_p, J_c], axis=-1)       # [S, 2, 8]
    else:
        J_cam = J_p
    if opts.constant_pose:
        J_cam = J_cam.at[..., :6].set(0.0) if opts.optimize_focal \
            else jnp.zeros_like(J_cam)
    if opts.constant_line:
        J_l = jnp.zeros_like(J_l)
    return (r0,) + _schur_terms(r0, J_l, J_cam, lam, 4)


def _point_track_terms(point, pose_params, cam_fxfy, kvec, cam_index,
                       img_index, p2d, weight, opts: HybridBAOptions,
                       lam=None):
    if lam is None:
        lam = opts.damping
    S = img_index.shape[0]
    sw = np.sqrt(opts.lw_point)

    def f(delta_x, delta_p, delta_c):
        x = point + delta_x
        q = pose_params[img_index, :4]
        t = pose_params[img_index, 4:7]
        packed = jax.vmap(retract_pose)(
            jnp.concatenate([q, t], axis=-1), delta_p)
        views = _views(packed, kvec, cam_fxfy, cam_index, delta_c)
        r = (views.project(x[None]) - p2d) * sw
        return _weighted(r, weight, opts)

    z_x = jnp.zeros(3)
    z_p = jnp.zeros((S, 6))
    z_c = jnp.zeros((S, 2))
    r0 = f(z_x, z_p, z_c)
    J_x = jax.jacfwd(f, argnums=0)(z_x, z_p, z_c)
    J_p = jax.jacfwd(f, argnums=1)(z_x, z_p, z_c)
    J_p = jnp.moveaxis(jnp.diagonal(J_p, axis1=0, axis2=2), -1, 0)
    if opts.optimize_focal:
        J_c = jax.jacfwd(f, argnums=2)(z_x, z_p, z_c)
        J_c = jnp.moveaxis(jnp.diagonal(J_c, axis1=0, axis2=2), -1, 0)
        J_cam = jnp.concatenate([J_p, J_c], axis=-1)
    else:
        J_cam = J_p
    if opts.constant_pose:
        J_cam = J_cam.at[..., :6].set(0.0) if opts.optimize_focal \
            else jnp.zeros_like(J_cam)
    if opts.constant_point:
        J_x = jnp.zeros_like(J_x)
    return (r0,) + _schur_terms(r0, J_x, J_cam, lam, 3)


def _cols_for(img_index, cam_index, n_images, opts):
    """[S, Dc] flat column indices into the camera tangent vector."""
    base = img_index[:, None] * 6 + jnp.arange(6)[None, :]
    if not opts.optimize_focal:
        return base
    camc = n_images * 6 + cam_index[:, None] * 2 + jnp.arange(2)[None, :]
    return jnp.concatenate([base, camc], axis=-1)


def _accumulate_dense(D, cols, H_cc_diag, S_red):
    """Dense reduced matrix from per-track terms (small scenes)."""
    Hp = jnp.zeros((D, D))
    T, S, Dc = cols.shape
    ci = cols[:, :, None, :, None]                      # [T,S,1,Dc,1]
    cj = cols[:, None, :, None, :]                      # [T,1,S,1,Dc]
    ci = jnp.broadcast_to(ci, (T, S, S, Dc, Dc))
    cj = jnp.broadcast_to(cj, (T, S, S, Dc, Dc))
    Hp = Hp.at[ci, cj].add(S_red)
    di = cols[:, :, :, None]
    dj = cols[:, :, None, :]
    Hp = Hp.at[jnp.broadcast_to(di, H_cc_diag.shape),
               jnp.broadcast_to(dj, H_cc_diag.shape)].add(H_cc_diag)
    return Hp


def _scatter_g(D, cols, g_red):
    return jnp.zeros(D).at[cols].add(g_red)


def _matvec(v, cols, H_cc_diag, S_red):
    """Reduced-matrix vector product from per-track Schur terms."""
    vc = v[cols]                                          # [T, S, Dc]
    out_diag = jnp.einsum("tspq,tsq->tsp", H_cc_diag, vc)
    out_schur = jnp.einsum("tsupq,tuq->tsp", S_red, vc)
    out = out_diag + out_schur
    return jnp.zeros_like(v).at[cols].add(out)


def _solve_cg(g, matvec_fn, precond_inv, iters):
    """Truncated preconditioned conjugate gradient (the SCHUR_JACOBI
    iterative-Schur equivalent).

    The reduced camera system has a near-null scale-gauge direction, so
    plain CG can blow up late in the iteration; this variant freezes the
    iterate on non-positive curvature (Steihaug-style) and on residual
    convergence, which keeps the step inside the well-conditioned
    subspace."""
    gnorm2 = jnp.vdot(g, g)
    x0 = jnp.zeros_like(g)
    r0 = g  # b - A @ 0
    z0 = precond_inv(r0)

    def body(carry, _):
        x, r, z, p, done = carry
        Ap = matvec_fn(p)
        pAp = jnp.vdot(p, Ap)
        # stop on non-positive curvature or convergence
        stop = done | (pAp <= 1e-12 * jnp.vdot(p, p)) \
            | (jnp.vdot(r, r) <= 1e-12 * gnorm2)
        rz = jnp.vdot(r, z)
        alpha = jnp.where(stop, 0.0, rz / jnp.where(pAp == 0, 1.0, pAp))
        x1 = x + alpha * p
        r1 = r - alpha * Ap
        z1 = precond_inv(r1)
        beta = jnp.where(stop, 0.0,
                         jnp.vdot(r1, z1) / jnp.where(rz == 0, 1.0, rz))
        p1 = jnp.where(stop, p, z1 + beta * p)
        return (x1, r1, z1, p1, stop), None

    (x, _, _, _, _), _ = jax.lax.scan(
        body, (x0, r0, z0, z0, jnp.asarray(False)), None, length=iters)
    return x


def make_hybrid_ba_step(mesh: Mesh, n_images: int, n_cameras: int = 1,
                        opts: HybridBAOptions = HybridBAOptions()):
    """Build the jitted distributed BA step for a given mesh.

    Returned fn: (state, line_data, point_data) -> (new_state, cost).
    line_data: (kvec [Tl,S,4], cam_index [Tl,S], img_index [Tl,S],
                l2d_start, l2d_end, weight)
    point_data: (kvec [Tp,Sp,4], cam_index, img_index, p2d [Tp,Sp,2],
                 weight) — pass arrays with Tp = n_devices (weight 0)
    when there are no points.
    All track-leading arrays are sharded over TRACK_AXIS; cameras are
    replicated.
    """
    D = n_images * 6 + (n_cameras * 2 if opts.optimize_focal else 0)
    use_dense = opts.solver == "dense" or (
        opts.solver == "auto" and n_images <= opts.dense_threshold)

    lspec = tuple(P(TRACK_AXIS) for _ in range(6))
    pspec = tuple(P(TRACK_AXIS) for _ in range(5))
    state_spec = HybridBAState(P(TRACK_AXIS), P(TRACK_AXIS), P(), P())

    def step(state: HybridBAState, line_data, point_data, lam):
        kv_l, ci_l, ii_l, l2s, l2e, w_l = line_data
        kv_p, ci_p, ii_p, p2d, w_p = point_data

        lt = jax.vmap(lambda lp, kv, ci, ii, ls, le, w: _line_track_terms(
            lp, state.pose_params, state.cam_fxfy, kv, ci, ii, ls, le, w,
            opts, lam))(state.line_params, kv_l, ci_l, ii_l, l2s, l2e, w_l)
        pt = jax.vmap(lambda x, kv, ci, ii, pp, w: _point_track_terms(
            x, state.pose_params, state.cam_fxfy, kv, ci, ii, pp, w,
            opts, lam))(state.point_params, kv_p, ci_p, ii_p, p2d, w_p)

        (r0_l, Hd_l, Sr_l, g_l, Hinv_l, bl_l, Hcl_l) = lt
        (r0_p, Hd_p, Sr_p, g_p, Hinv_p, bl_p, Hcl_p) = pt
        cols_l = jax.vmap(lambda ii, ci: _cols_for(ii, ci, n_images,
                                                   opts))(ii_l, ci_l)
        cols_p = jax.vmap(lambda ii, ci: _cols_for(ii, ci, n_images,
                                                   opts))(ii_p, ci_p)

        gp = _scatter_g(D, cols_l, g_l) + _scatter_g(D, cols_p, g_p)
        gp = jax.lax.psum(gp, TRACK_AXIS)
        cost = jax.lax.psum(jnp.sum(r0_l * r0_l) + jnp.sum(r0_p * r0_p),
                            TRACK_AXIS)

        fixed = jnp.arange(D) < opts.n_fixed_poses * 6
        if opts.constant_pose:
            fixed = fixed | (jnp.arange(D) < n_images * 6)

        if use_dense:
            Hp = _accumulate_dense(D, cols_l, Hd_l, Sr_l) \
                + _accumulate_dense(D, cols_p, Hd_p, Sr_p)
            Hp = jax.lax.psum(Hp, TRACK_AXIS)
            A = Hp + lam * jnp.diag(jnp.maximum(jnp.diag(Hp), 1e-8)) \
                + 1e-8 * jnp.eye(D)
            A = jnp.where(fixed[:, None] | fixed[None, :], jnp.eye(D), A)
            g = jnp.where(fixed, 0.0, gp)
            delta = -jnp.linalg.solve(A, g)
        else:
            # matrix-free CG with block-Jacobi preconditioner: the
            # reduced matrix is applied from the per-track Schur terms,
            # with one psum per matvec (ITERATIVE_SCHUR + SCHUR_JACOBI,
            # hybrid_bundle_adjustment.cc:244-253)
            diag0 = jnp.zeros(D).at[cols_l].add(
                jnp.diagonal(Hd_l, axis1=-2, axis2=-1)
                + jnp.diagonal(jnp.einsum("tsspq->tspq", Sr_l),
                               axis1=-2, axis2=-1))
            diag0 = diag0 + jnp.zeros(D).at[cols_p].add(
                jnp.diagonal(Hd_p, axis1=-2, axis2=-1)
                + jnp.diagonal(jnp.einsum("tsspq->tspq", Sr_p),
                               axis1=-2, axis2=-1))
            diag0 = jax.lax.psum(diag0, TRACK_AXIS)
            damp = lam * jnp.maximum(diag0, 1e-8) + 1e-8
            inv_diag = jnp.where(fixed, 1.0, 1.0 / (diag0 + damp))

            def matvec_fn(v):
                v = jnp.where(fixed, 0.0, v)
                out = _matvec(v, cols_l, Hd_l, Sr_l) \
                    + _matvec(v, cols_p, Hd_p, Sr_p)
                out = jax.lax.psum(out, TRACK_AXIS)
                out = out + damp * v
                return jnp.where(fixed, v, out)

            g = jnp.where(fixed, 0.0, gp)
            delta = -_solve_cg(g, matvec_fn, lambda r: inv_diag * r,
                               opts.cg_iters)
        dp = delta[:n_images * 6].reshape(n_images, 6)
        if opts.constant_pose:
            dp = jnp.zeros_like(dp)

        new_pose = jax.vmap(retract_pose)(state.pose_params, dp)
        if opts.optimize_focal:
            dc = delta[n_images * 6:].reshape(n_cameras, 2)
            new_fxfy = state.cam_fxfy + dc
        else:
            new_fxfy = state.cam_fxfy

        # back-substitute landmark updates locally
        def backsub(cols, Hinv, b, Hcl):
            dcam = delta[cols]                         # [T, S, Dc]
            rhs = b + jnp.einsum("tspa,tsp->ta", Hcl, dcam)
            return -jnp.einsum("tab,tb->ta", Hinv, rhs)

        d_line = backsub(cols_l, Hinv_l, bl_l, Hcl_l)
        if opts.constant_line:
            d_line = jnp.zeros_like(d_line)
        new_lines = jax.vmap(retract_quat_so2)(state.line_params, d_line)
        d_pt = backsub(cols_p, Hinv_p, bl_p, Hcl_p)
        if opts.constant_point:
            d_pt = jnp.zeros_like(d_pt)
        new_points = state.point_params + d_pt
        return HybridBAState(new_lines, new_points, new_pose,
                             new_fxfy), cost

    sharded = jax.jit(shard_map(step, mesh=mesh,
                                in_specs=(state_spec, lspec, pspec, P()),
                                out_specs=(state_spec, P()),
                                check_vma=False))

    def run(state, line_data, point_data, lam=None):
        # lam is a TRACED damping scalar so the driver's LM accept/
        # reject loop can adapt it without recompiling
        if lam is None:
            lam = opts.damping
        return sharded(state, line_data, point_data,
                       jnp.float32(lam))

    return run


def make_hybrid_ba_cost(mesh: Mesh, opts: HybridBAOptions = HybridBAOptions()):
    """Residual-only cost of a HybridBAState (no Jacobians) — used by
    the driver's LM accept/reject loop to evaluate candidate steps."""

    def _line_cost(line_params, pose_params, cam_fxfy, kvec, cam_index,
                   img_index, l2d_start, l2d_end, weight):
        q = pose_params[img_index, :4]
        t = pose_params[img_index, 4:7]
        packed = jnp.concatenate([q, t], axis=-1)
        views = _views(packed, kvec, cam_fxfy, cam_index,
                       jnp.zeros((img_index.shape[0], 2)))
        line = unpack_minimal_lines(line_params)
        r = res.line_geometric_residual(line.uvec[None], line.wvec[None],
                                        views,
                                        Segments(l2d_start, l2d_end),
                                        opts.geometric_alpha)
        return _weighted(r, weight, opts)

    def _point_cost(point, pose_params, cam_fxfy, kvec, cam_index,
                    img_index, p2d, weight):
        q = pose_params[img_index, :4]
        t = pose_params[img_index, 4:7]
        packed = jnp.concatenate([q, t], axis=-1)
        views = _views(packed, kvec, cam_fxfy, cam_index,
                       jnp.zeros((img_index.shape[0], 2)))
        r = (views.project(point[None]) - p2d) * np.sqrt(opts.lw_point)
        return _weighted(r, weight, opts)

    lspec = tuple(P(TRACK_AXIS) for _ in range(6))
    pspec = tuple(P(TRACK_AXIS) for _ in range(5))
    state_spec = HybridBAState(P(TRACK_AXIS), P(TRACK_AXIS), P(), P())

    def cost(state, line_data, point_data):
        kv_l, ci_l, ii_l, l2s, l2e, w_l = line_data
        kv_p, ci_p, ii_p, p2d, w_p = point_data
        r_l = jax.vmap(lambda lp, kv, ci, ii, ls, le, w: _line_cost(
            lp, state.pose_params, state.cam_fxfy, kv, ci, ii, ls, le,
            w))(state.line_params, kv_l, ci_l, ii_l, l2s, l2e, w_l)
        r_p = jax.vmap(lambda x, kv, ci, ii, pp, w: _point_cost(
            x, state.pose_params, state.cam_fxfy, kv, ci, ii, pp,
            w))(state.point_params, kv_p, ci_p, ii_p, p2d, w_p)
        return jax.lax.psum(jnp.sum(r_l * r_l) + jnp.sum(r_p * r_p),
                            TRACK_AXIS)

    return jax.jit(shard_map(cost, mesh=mesh,
                             in_specs=(state_spec, lspec, pspec),
                             out_specs=P(), check_vma=False))
