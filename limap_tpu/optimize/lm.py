"""Batched Levenberg-Marquardt: many small independent problems at once.

The reference solves every nonlinear problem with Ceres (trust-region LM
over a sparse problem, /root/reference/src/limap/optimize/*).  On TPU the
dominant structure is different: line refinement and fixed-camera BA are
*thousands of independent tiny problems* (one 4-DOF line per track; one
6-DOF pose per query).  This module solves all of them simultaneously:
residuals/Jacobians batch over the problem axis via vmap(jacfwd), each
iteration solves a [T, D, D] linear system, and per-problem damping
follows the classic Marquardt schedule with accept/reject masking
instead of data-dependent branching.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-12


class LMResult(NamedTuple):
    params: jnp.ndarray      # [T, P] final parameters
    cost0: jnp.ndarray       # [T] initial cost
    cost: jnp.ndarray        # [T] final cost
    n_accepted: jnp.ndarray  # [T] accepted steps


def solve_spd(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve small SPD systems A x = b via explicit Cholesky.

    [..., D, D] x [..., D] with D <= ~8: unrolled Cholesky +
    forward/backward substitution fuses into VPU ops — far faster on TPU
    than the general LU path of ``jnp.linalg.solve`` for tiny blocks.
    """
    D = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(D):
        s = A[..., j, j] - jnp.sum(L[..., j, :j] ** 2, axis=-1)
        L = L.at[..., j, j].set(jnp.sqrt(jnp.maximum(s, 1e-12)))
        for i in range(j + 1, D):
            s = A[..., i, j] - jnp.sum(L[..., i, :j] * L[..., j, :j],
                                       axis=-1)
            L = L.at[..., i, j].set(s / L[..., j, j])
    # forward substitution L y = b
    y = jnp.zeros_like(b)
    for i in range(D):
        s = b[..., i] - jnp.sum(L[..., i, :i] * y[..., :i], axis=-1)
        y = y.at[..., i].set(s / L[..., i, i])
    # backward substitution L^T x = y
    x = jnp.zeros_like(b)
    for i in reversed(range(D)):
        s = y[..., i] - jnp.sum(L[..., i + 1:, i] * x[..., i + 1:], axis=-1)
        x = x.at[..., i].set(s / L[..., i, i])
    return x


import functools


@functools.lru_cache(maxsize=128)
def _build_lm_runner(residual_fn, retract_fn, tangent_dim: int,
                     num_iterations: int, lambda_init: float,
                     lambda_up: float, lambda_down: float,
                     lambda_min: float, lambda_max: float):
    """Build + cache one jitted LM program per (fns, hyperparams).

    Caching matters twice over: the whole solve runs as ONE fused XLA
    program (eager prep would pay a dispatch round-trip per op — painful
    on remote TPU backends), and repeated solves with stable function
    identities (e.g. line_ba's cached residuals) skip retracing.
    """
    D = tangent_dim

    def cost_of(params, *a):
        r = residual_fn(params, *a)
        return jnp.sum(r * r)

    def terms(params, *a):
        f = lambda delta: residual_fn(retract_fn(params, delta), *a)
        zero = jnp.zeros((D,), params.dtype)
        J = jax.jacfwd(f)(zero)          # [R, D]
        r = f(zero)
        return J.T @ J, J.T @ r, jnp.sum(r * r)

    b_terms = jax.vmap(terms)
    b_cost = jax.vmap(cost_of)
    b_retract = jax.vmap(retract_fn)

    @jax.jit
    def run(params0, *aux):
        T = params0.shape[0]
        cost0 = b_cost(params0, *aux)

        def step(state, _):
            params, lam, _, n_acc = state
            JTJ, JTr, cost = b_terms(params, *aux)
            diag = jnp.diagonal(JTJ, axis1=-2, axis2=-1)
            damp = lam[:, None] * jnp.maximum(diag, 1e-8)
            A = JTJ + jax.vmap(jnp.diag)(damp)
            delta = -solve_spd(A, JTr)
            delta = jnp.nan_to_num(delta)
            new_params = b_retract(params, delta)
            new_cost = b_cost(new_params, *aux)
            accept = new_cost < cost
            params = jnp.where(accept[:, None], new_params, params)
            lam = jnp.clip(jnp.where(accept, lam * lambda_down,
                                     lam * lambda_up),
                           lambda_min, lambda_max)
            cost = jnp.where(accept, new_cost, cost)
            return (params, lam, cost, n_acc + accept.astype(jnp.int32)), \
                None

        init = (params0, jnp.full((T,), lambda_init, params0.dtype), cost0,
                jnp.zeros((T,), jnp.int32))
        (params, _, cost, n_acc), _ = jax.lax.scan(
            step, init, None, length=num_iterations)
        return LMResult(params, cost0, cost, n_acc)

    return run


def lm_solve(params0: jnp.ndarray,
             residual_fn: Callable,
             retract_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
             tangent_dim: int,
             aux=(),
             num_iterations: int = 20,
             lambda_init: float = 1e-3,
             lambda_up: float = 4.0,
             lambda_down: float = 0.5,
             lambda_min: float = 1e-9,
             lambda_max: float = 1e6) -> LMResult:
    """Minimize sum(residual_fn(p, *aux)^2) independently per batch row.

    Args:
      params0: [T, P] packed parameter rows.
      residual_fn: ([P], *aux_row) -> [R] residuals for ONE problem
        (masked/weighted); vmapped internally over rows of params0 and
        each element of ``aux``.  Pass a *stable* function object (not a
        per-call closure) to amortize compilation across calls.
      retract_fn: ([P], [D]) -> [P] manifold retraction (quaternion
        exp-map, SO(2) rotation, plain add, ...).
      tangent_dim: D.
      aux: tuple of arrays with leading dim T, passed per-row.
      num_iterations: fixed LM iterations (XLA-friendly static bound).
    """
    run = _build_lm_runner(residual_fn, retract_fn, tangent_dim,
                           num_iterations, lambda_init, lambda_up,
                           lambda_down, lambda_min, lambda_max)
    return run(params0, *aux)


# ---------------------------------------------------------------------
# standard retractions
# ---------------------------------------------------------------------
def retract_quat_so2(params: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Minimal line retraction: params [6] = (uvec[4], wvec[2]),
    delta [4] = (so3 tangent[3], so2 angle[1]).

    Matches Ceres' QuaternionManifold (+) SphereManifold(2) block
    structure used at hybrid_bundle_adjustment.cc:96-110.
    """
    from limap_tpu.base.pose import (axis_angle_to_quat, quat_multiply,
                                     so2_rotate)
    uvec = params[:4]
    wvec = params[4:6]
    dq = axis_angle_to_quat(delta[:3])
    new_u = quat_multiply(dq, uvec)
    new_w = so2_rotate(wvec, delta[3])
    return jnp.concatenate([new_u, new_w])


def retract_pose(params: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Pose retraction: params [7] = (qvec[4], tvec[3]), delta [6]."""
    from limap_tpu.base.pose import axis_angle_to_quat, quat_multiply
    qvec = params[:4]
    tvec = params[4:7]
    dq = axis_angle_to_quat(delta[:3])
    return jnp.concatenate([quat_multiply(dq, qvec), tvec + delta[3:6]])
