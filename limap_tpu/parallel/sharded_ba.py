"""Distributed hybrid (pose + line) bundle adjustment.

The reference's HybridBAEngine hands one big sparse problem to Ceres and
picks a Schur solver by image count
(/root/reference/src/limap/optimize/hybrid_bundle_adjustment/hybrid_bundle_adjustment.cc:227-264).
The TPU-native design shards *line tracks* across the device mesh and
keeps poses replicated:

  per device, per local track:
    residuals + Jacobians (line tangent [4], pose tangent [6]) via jacfwd
    eliminate the 4x4 line block locally (Schur complement)
    accumulate the reduced camera system  S_pp [I,6,I,6], g_p [I,6]
  psum(S_pp, g_p) over the track axis  <- the only cross-chip traffic
  solve the damped reduced system (replicated), update poses
  back-substitute line updates locally (no communication)

One step == one Gauss-Newton/LM iteration of the joint problem; iterate
from the driver.  Gauge freedom is fixed by freezing the first pose.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
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


class HybridBAState(NamedTuple):
    line_params: jnp.ndarray  # [T, 6] minimal lines (sharded over tracks)
    pose_params: jnp.ndarray  # [I, 7] (qvec, tvec), replicated


def _line_residuals(line_params, pose_params, kvec, img_index, l2d_start,
                    l2d_end, weight, opts: HybridBAOptions):
    """Residuals of ONE track over its supports.

    line_params [6]; pose_params [I, 7]; supports [S].
    Returns [S, 2] weighted residuals.
    """
    line = unpack_minimal_lines(line_params)
    qvec = pose_params[img_index, :4]
    tvec = pose_params[img_index, 4:7]
    views = CameraViewsBatch(kvec, qvec, tvec)
    r = res.line_geometric_residual(line.uvec[None], line.wvec[None], views,
                                    Segments(l2d_start, l2d_end),
                                    opts.geometric_alpha)
    r = jnp.where((weight > 0)[:, None], r, 0.0)
    r2 = jax.lax.stop_gradient(jnp.sum(r * r, axis=-1))
    rw = robust_weight(r2, opts.loss, opts.loss_scale)
    scale = jnp.sqrt(weight * rw + 1e-12)[:, None]
    return jnp.where((weight > 0)[:, None], r * scale, 0.0)


def _track_terms(line_params, pose_params, kvec, img_index, l2d_start,
                 l2d_end, weight, n_images: int, opts: HybridBAOptions):
    """Schur-eliminated contributions of one track.

    Returns (S_pp [I,6,I,6] as sparse scatter args, g_p scatter args,
    H_ll [4,4], b_l [4], H_lp [S,4,6]) — we materialize the track's
    contribution to the reduced system via support-pair outer products.
    """
    S = img_index.shape[0]

    def f_line(delta_l):
        return _line_residuals(retract_quat_so2(line_params, delta_l),
                               pose_params, kvec, img_index, l2d_start,
                               l2d_end, weight, opts)

    def f_pose(delta_p_all):
        # delta_p_all: [S, 6] — independent tangent per support (the
        # Jacobian w.r.t. each support's own pose)
        q = pose_params[img_index, :4]
        t = pose_params[img_index, 4:7]
        packed = jnp.concatenate([q, t], axis=-1)
        new = jax.vmap(retract_pose)(packed, delta_p_all)
        views = CameraViewsBatch(kvec, new[:, :4], new[:, 4:7])
        line = unpack_minimal_lines(line_params)
        r = res.line_geometric_residual(line.uvec[None], line.wvec[None],
                                        views, Segments(l2d_start, l2d_end),
                                        opts.geometric_alpha)
        r = jnp.where((weight > 0)[:, None], r, 0.0)
        r2 = jax.lax.stop_gradient(jnp.sum(r * r, axis=-1))
        rw = robust_weight(r2, opts.loss, opts.loss_scale)
        scale = jnp.sqrt(weight * rw + 1e-12)[:, None]
        return jnp.where((weight > 0)[:, None], r * scale, 0.0)

    r0 = f_line(jnp.zeros(4))                       # [S, 2]
    J_l = jax.jacfwd(f_line)(jnp.zeros(4))          # [S, 2, 4]
    J_p_full = jax.jacfwd(f_pose)(jnp.zeros((S, 6)))  # [S, 2, S, 6]
    # each residual depends only on its own support's pose -> take the
    # block diagonal over the two support axes
    J_p = jnp.diagonal(J_p_full, axis1=0, axis2=2)    # [2, 6, S]
    J_p = jnp.moveaxis(J_p, -1, 0)                    # [S, 2, 6]

    H_ll = jnp.einsum("sca,scb->ab", J_l, J_l)      # [4, 4]
    b_l = jnp.einsum("sca,sc->a", J_l, r0)          # [4]
    H_pl = jnp.einsum("scp,sca->spa", J_p, J_l)     # [S, 6, 4]
    g_p = jnp.einsum("scp,sc->sp", J_p, r0)         # [S, 6]
    H_pp_diag = jnp.einsum("scp,scq->spq", J_p, J_p)  # [S, 6, 6]

    H_ll_damped = H_ll + opts.damping * jnp.eye(4) \
        + 1e-8 * jnp.eye(4)
    H_ll_inv = jnp.linalg.inv(H_ll_damped)

    # reduced camera system contributions
    A = H_pl @ H_ll_inv                              # [S, 6, 4]
    # S_pp[c_s, c_t] -= A_s @ H_pl_t^T ; g_p[c_s] -= A_s @ b_l
    S_red = -jnp.einsum("spa,tqa->stpq", A, H_pl)    # [S, S, 6, 6]
    g_red = g_p - jnp.einsum("spa,a->sp", A, b_l)    # [S, 6]
    return H_pp_diag, S_red, g_red, H_ll_inv, b_l, H_pl, r0


@partial(jax.jit, static_argnums=(2, 3))
def hybrid_ba_terms(state: HybridBAState, data, n_images: int,
                    opts: HybridBAOptions):
    """Per-track Schur terms, batched over the (sharded) track axis.

    data: (kvec [T,S,4], img_index [T,S], l2d_start [T,S,2],
           l2d_end [T,S,2], weight [T,S])
    Returns the local (unsummed) reduced system [I*6, I*6], [I*6].
    """
    kvec, img_index, l2d_s, l2d_e, weight = data

    def one(lp, kv, idx, ls, le, w):
        return _track_terms(lp, state.pose_params, kv, idx, ls, le, w,
                            n_images, opts)

    H_pp_diag, S_red, g_red, H_ll_inv, b_l, H_pl, r0 = jax.vmap(one)(
        state.line_params, kvec, img_index, l2d_s, l2d_e, weight)

    I = n_images
    Hp = jnp.zeros((I, 6, I, 6))
    gp = jnp.zeros((I, 6))
    T, S = img_index.shape
    rows = img_index  # [T, S]
    # diagonal blocks
    Hp = Hp.at[rows, :, rows, :].add(H_pp_diag)
    # Schur cross terms over support pairs
    ci = rows[:, :, None].repeat(S, 2)  # [T, S, S]
    cj = rows[:, None, :].repeat(S, 1)
    Hp = Hp.at[ci, :, cj, :].add(S_red)
    gp = gp.at[rows].add(g_red)
    cost = jnp.sum(r0 * r0)
    return Hp.reshape(I * 6, I * 6), gp.reshape(I * 6), \
        (H_ll_inv, b_l, H_pl), cost


def make_hybrid_ba_step(mesh: Mesh, n_images: int,
                        opts: HybridBAOptions = HybridBAOptions()):
    """Build the jitted distributed BA step for a given mesh.

    Returned fn: (state, data) -> (new_state, cost); ``data`` arrays are
    sharded over tracks (leading axis), poses replicated.
    """
    data_spec = (P(TRACK_AXIS), P(TRACK_AXIS), P(TRACK_AXIS),
                 P(TRACK_AXIS), P(TRACK_AXIS))
    state_spec = HybridBAState(P(TRACK_AXIS), P())

    def step(state: HybridBAState, data):
        Hp, gp, (H_ll_inv, b_l, H_pl), cost = hybrid_ba_terms(
            state, data, n_images, opts)
        # reduce camera system across the track shards — ICI traffic
        Hp = jax.lax.psum(Hp, TRACK_AXIS)
        gp = jax.lax.psum(gp, TRACK_AXIS)
        cost = jax.lax.psum(cost, TRACK_AXIS)

        # damp + gauge-fix first pose(s), solve replicated
        D = n_images * 6
        lam = opts.damping
        A = Hp + lam * jnp.diag(jnp.maximum(jnp.diag(Hp), 1e-8)) \
            + 1e-8 * jnp.eye(D)
        fixed = jnp.arange(D) < opts.n_fixed_poses * 6
        A = jnp.where(fixed[:, None] | fixed[None, :],
                      jnp.eye(D), A)
        g = jnp.where(fixed, 0.0, gp)
        delta_p = -jnp.linalg.solve(A, g)
        dp = delta_p.reshape(n_images, 6)

        # update poses (replicated)
        packed = state.pose_params
        new_pose = jax.vmap(retract_pose)(packed, dp)

        # back-substitute line updates locally
        kvec, img_index, l2d_s, l2d_e, weight = data
        dp_sup = dp[img_index]  # [T_local, S, 6]
        # delta_l = -H_ll_inv (b_l + sum_s H_pl_s^T dp_s)
        rhs = b_l + jnp.einsum("tspa,tsp->ta", H_pl, dp_sup)
        delta_l = -jnp.einsum("tab,tb->ta", H_ll_inv, rhs)
        new_lines = jax.vmap(retract_quat_so2)(state.line_params, delta_l)
        return HybridBAState(new_lines, new_pose), cost

    sharded = shard_map(step, mesh=mesh,
                        in_specs=(state_spec, data_spec),
                        out_specs=(state_spec, P()),
                        check_vma=False)
    return jax.jit(sharded)
