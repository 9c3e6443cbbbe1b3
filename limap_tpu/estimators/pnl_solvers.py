"""Batched point-line minimal absolute-pose solvers: p2p1ll, p1p2ll, p3ll.

The reference dispatches these minimal cases to PoseLib's polynomial
solvers (/root/reference/src/limap/estimators/absolute_pose/
joint_pose_estimator.cc:113-122, sampled with combinatorial
probabilities by hybrid_pose_estimator.h:45-127).  PoseLib solves each
with a bespoke Groebner/eigenvalue routine — serial, CPU-bound, and
branch-heavy.  Here all three are reduced to ONE TPU-friendly template:

Every constraint left after eliminating the translation (and point
depth) is LINEAR in the rotation entries, i.e. of the form
``Tr(C_k @ R) = 0`` for a data-dependent 3x3 matrix ``C_k``:

* line direction:  n . (R v) = 0            -> C = v n^T
* line point (after depth elimination)       -> C = sum of outer products
* second-point epipolar component            -> C = outer-product combo

One constraint (``n1 . (R v1) = 0``) is satisfied exactly by the
2-angle family ``R(a, b) = Rot(d(a), b) @ R0(a)`` where ``d(a)`` sweeps
the great circle perpendicular to ``n1`` and ``R0(a)`` maps ``v1`` to
``d(a)``.  For any trace constraint, ``Tr(C R(a, b))`` is LINEAR in
``(cos b, sin b)``, so the remaining two constraints form a 2x2 linear
system in (cos b, sin b); Cramer's rule plus the unit-circle condition
collapse both into ONE smooth function ``G(a)`` on the circle (see
`_family_eval`).  Roots are found branch-free: evaluate ``G`` on a
fixed grid, locate sign changes with static shapes, bisect a fixed
number of iterations, and recover (near-)double roots at local minima
of ``|G|``.  Thousands of minimal samples solve simultaneously in one
XLA program — the TPU replacement for PoseLib's per-sample root
polishing.

Conventions: world-to-camera pose ``x_cam = R x_world + t``; 2D lines
enter as camera-frame back-projected plane normals ``n`` (from
normalized endpoints, ``n = x_s x x_e``); 3D lines as (point P, unit
direction V).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from limap_tpu.base.pose import quat_to_rotmat

_EPS = 1e-12


def _normalize(v):
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + _EPS)


def _any_perp(v):
    """A unit vector perpendicular to v (branch-free)."""
    ex = jnp.stack([jnp.ones_like(v[..., 0]), jnp.zeros_like(v[..., 0]),
                    jnp.zeros_like(v[..., 0])], axis=-1)
    ey = jnp.stack([jnp.zeros_like(v[..., 0]), jnp.ones_like(v[..., 0]),
                    jnp.zeros_like(v[..., 0])], axis=-1)
    use_ey = jnp.abs(v[..., 0]) > 0.9
    ref = jnp.where(use_ey[..., None], ey, ex)
    p = jnp.cross(v, ref)
    return _normalize(p)


def _skew(d):
    z = jnp.zeros_like(d[..., 0])
    return jnp.stack([
        jnp.stack([z, -d[..., 2], d[..., 1]], axis=-1),
        jnp.stack([d[..., 2], z, -d[..., 0]], axis=-1),
        jnp.stack([-d[..., 1], d[..., 0], z], axis=-1)], axis=-2)


def _rot_between(a, b):
    """Rotation R with R @ a = b for unit vectors (quaternion form).

    Branch-free fallback to a pi-rotation about a perpendicular axis
    when a ~= -b.
    """
    v = jnp.cross(a, b)
    w = 1.0 + jnp.sum(a * b, axis=-1)
    degen = w < 1e-6
    fallback = _any_perp(a)
    qv = jnp.where(degen[..., None], fallback, v)
    qw = jnp.where(degen, jnp.zeros_like(w), w)
    q = jnp.concatenate([qw[..., None], qv], axis=-1)
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    return quat_to_rotmat(q)


def _rot_axis_angle(d, beta):
    """Rodrigues rotation about unit axis d by angle beta."""
    K = _skew(d)
    I = jnp.broadcast_to(jnp.eye(3), K.shape)
    s = jnp.sin(beta)[..., None, None]
    c = jnp.cos(beta)[..., None, None]
    return I + s * K + (1.0 - c) * (K @ K)


def _trace_coeffs(M, d):
    """f(b) = Tr(M Rot(d, b)) = a cos(b) + s sin(b) + c."""
    trM = jnp.trace(M, axis1=-2, axis2=-1)
    dMd = jnp.einsum("...i,...ij,...j->...", d, M, d)
    sK = jnp.einsum("...ij,...ji->...", M, _skew(d))
    return trM - dMd, sK, dMd


def _family_eval(alpha, v1, n1, C2, C3):
    """Evaluate the branch-free root function G(alpha).

    For the rotation family R(alpha, beta) = Rot(d(alpha), beta) @
    R0(alpha), each trace constraint is linear in (cos beta, sin beta):
    ``f_k = a_k cos(beta) + b_k sin(beta) + c_k``.  Solving the 2x2
    system for (cos beta, sin beta) by Cramer and imposing
    cos^2 + sin^2 = 1 gives the single smooth equation

        G(alpha) = Nc^2 + Ns^2 - det^2 = 0,

    with Nc = c3 b2 - c2 b3, Ns = c2 a3 - c3 a2 and
    det = a2 b3 - a3 b2.  G has no branch cuts or validity regions, so
    grid sign changes + bisection find its simple roots and local
    minima of |G| recover (near-)double roots.

    Returns (G, beta, det, d, R0).  Shapes follow alpha's batch.
    """
    u = _any_perp(n1)
    w = jnp.cross(n1, u)
    d = jnp.cos(alpha)[..., None] * u + jnp.sin(alpha)[..., None] * w
    R0 = _rot_between(jnp.broadcast_to(v1, d.shape), d)
    a2, b2, c2 = _trace_coeffs(R0 @ C2, d)
    a3, b3, c3 = _trace_coeffs(R0 @ C3, d)
    det = a2 * b3 - a3 * b2
    Nc = c3 * b2 - c2 * b3
    Ns = c2 * a3 - c3 * a2
    G = Nc * Nc + Ns * Ns - det * det
    # beta from the Cramer solution (sign of det folded in; atan2 is
    # invariant to the positive scale det^2)
    beta = jnp.arctan2(Ns * det, Nc * det)
    return G, beta, det, d, R0


def solve_two_trace_constraints(v1, n1, C2, C3, n_grid: int = 256,
                                n_bisect: int = 48, n_roots: int = 8):
    """All rotations with n1.(R v1)=0, Tr(C2 R)=0, Tr(C3 R)=0.

    Single-instance core (vmap over hypotheses in callers).  Roots of
    the smooth 1-D function G (see `_family_eval`) are found with
    fixed-shape grid + bisection; (near-)double roots — where G touches
    zero without a grid sign change — are recovered by ternary
    minimization of G^2 at interior local minima of |G|.

    Returns (R [2*n_roots, 3, 3], valid [2*n_roots]).
    """
    C2 = C2 / (jnp.linalg.norm(C2) + _EPS)
    C3 = C3 / (jnp.linalg.norm(C3) + _EPS)
    alphas = jnp.linspace(-jnp.pi, jnp.pi, n_grid + 1)

    def _geval(alpha):
        return jax.vmap(_family_eval, in_axes=(0, None, None, None, None))(
            alpha, v1, n1, C2, C3)

    G, _, det, _, _ = _geval(alphas)  # [n_grid + 1]
    g_scale = jnp.max(jnp.abs(G)) + _EPS
    det_scale = jnp.max(jnp.abs(det)) + _EPS

    # --- simple roots: bisection on grid sign changes ---
    sc = G[:-1] * G[1:] < 0.0
    idx = jnp.nonzero(sc, size=n_roots, fill_value=0)[0]
    ok = sc[idx]
    lo = alphas[idx]
    hi = alphas[idx + 1]
    glo = G[idx]

    def body(_, state):
        lo, hi, glo = state
        mid = 0.5 * (lo + hi)
        gm = _geval(mid)[0]
        take_lo = glo * gm < 0.0
        hi = jnp.where(take_lo, mid, hi)
        lo = jnp.where(take_lo, lo, mid)
        glo = jnp.where(take_lo, glo, gm)
        return lo, hi, glo

    lo, hi, _ = jax.lax.fori_loop(0, n_bisect, body, (lo, hi, glo))
    root = 0.5 * (lo + hi)

    # --- (near-)double roots: G touches zero inside one grid cell ---
    absG = jnp.abs(G)
    ext = (absG[1:-1] <= absG[:-2]) & (absG[1:-1] <= absG[2:])
    # keep the n_roots candidates with SMALLEST |G| (tangencies), not
    # the first by index — ordinary local minima would crowd them out
    cand = jnp.where(ext, absG[1:-1], jnp.inf)
    eidx = jnp.argsort(cand)[:n_roots]
    e_ok = ext[eidx]
    elo = alphas[eidx]
    ehi = alphas[eidx + 2]

    def tbody(_, state):
        lo, hi = state
        m1 = lo + (hi - lo) / 3.0
        m2 = hi - (hi - lo) / 3.0
        h1 = _geval(m1)[0] ** 2
        h2 = _geval(m2)[0] ** 2
        take = h1 < h2
        hi = jnp.where(take, m2, hi)
        lo = jnp.where(take, lo, m1)
        return lo, hi

    elo, ehi = jax.lax.fori_loop(0, n_bisect, tbody, (elo, ehi))
    eroot = 0.5 * (elo + ehi)
    ge = _geval(eroot)[0]
    e_ok = e_ok & (jnp.abs(ge) < 1e-2 * g_scale)

    root = jnp.concatenate([root, eroot], axis=0)
    ok = jnp.concatenate([ok, e_ok], axis=0)
    _, beta, det_r, d, R0 = _geval(root)
    ok = ok & (jnp.abs(det_r) > 1e-9 * det_scale)
    R = _rot_axis_angle(d, beta) @ R0
    finite = jnp.isfinite(R).all(axis=(-2, -1))
    R = jnp.where(finite[..., None, None], R, jnp.eye(3))
    return R, ok & finite


# ---------------------------------------------------------------------------
# the three minimal solvers (single instance; use the *_batched wrappers)
# ---------------------------------------------------------------------------

def _p3ll_single(n, P, V, n_grid, n_roots):
    """3 line correspondences.  n/P/V: [3, 3].

    The rotation-family anchor line is degenerate for a given sample
    when the root function folds (double root) at the solution, so the
    solve runs with two different anchor lines and returns the union.
    """
    n = _normalize(n)
    V = _normalize(V)
    R1, ok1 = solve_two_trace_constraints(
        V[0], n[0], jnp.outer(V[1], n[1]), jnp.outer(V[2], n[2]),
        n_grid=n_grid, n_roots=n_roots)
    R2, ok2 = solve_two_trace_constraints(
        V[1], n[1], jnp.outer(V[2], n[2]), jnp.outer(V[0], n[0]),
        n_grid=n_grid, n_roots=n_roots)
    R = jnp.concatenate([R1, R2], axis=0)
    ok = jnp.concatenate([ok1, ok2], axis=0)
    # n_i . (R P_i + t) = 0  ->  N t = -[n_i . (R P_i)]
    N = jnp.broadcast_to(n, R.shape[:-2] + (3, 3))
    rhs = -jnp.einsum("kj,...kj->...k", n,
                      jnp.einsum("...ij,kj->...ki", R, P))
    t = jnp.linalg.solve(N + _EPS * jnp.eye(3), rhs[..., None])[..., 0]
    return R, t, ok


def _p1p2ll_single(x, X, n, P, V, n_grid, n_roots):
    """1 point (bearing x, world X) + 2 lines (n/P/V: [2, 3]).

    Solved with both lines as the rotation-family anchor (union of
    roots) — the fold degeneracy of one anchor is generic position for
    the other.
    """
    x = _normalize(x)
    n = _normalize(n)
    V = _normalize(V)
    # depth elimination across the two line-point constraints:
    # (n1.(R(P1-X))) (n2.x) - (n2.(R(P2-X))) (n1.x) = 0
    n1x = jnp.dot(n[0], x)
    n2x = jnp.dot(n[1], x)
    C3 = n2x * jnp.outer(P[0] - X, n[0]) - n1x * jnp.outer(P[1] - X, n[1])
    R1, ok1 = solve_two_trace_constraints(
        V[0], n[0], jnp.outer(V[1], n[1]), C3,
        n_grid=n_grid, n_roots=n_roots)
    R2, ok2 = solve_two_trace_constraints(
        V[1], n[1], jnp.outer(V[0], n[0]), C3,
        n_grid=n_grid, n_roots=n_roots)
    R = jnp.concatenate([R1, R2], axis=0)
    ok = jnp.concatenate([ok1, ok2], axis=0)
    # depth from line 1 (fall back to line 2 when n1.x ~ 0)
    r1 = jnp.einsum("i,...ij,j->...", n[0], R, P[0] - X)
    r2 = jnp.einsum("i,...ij,j->...", n[1], R, P[1] - X)
    use1 = jnp.abs(n1x) >= jnp.abs(n2x)
    depth = jnp.where(use1, -r1 / jnp.where(jnp.abs(n1x) < _EPS, _EPS, n1x),
                      -r2 / jnp.where(jnp.abs(n2x) < _EPS, _EPS, n2x))
    t = depth[..., None] * x - jnp.einsum("...ij,j->...i", R, X)
    return R, t, ok & (depth > 0)


def _p2p1ll_single(x, X, n, P, V, n_grid, n_roots):
    """2 points (x/X: [2, 3]) + 1 line (n/P/V: [3]).

    Solved twice — eliminating the translation through either point —
    and the union of roots returned (fold-degeneracy mitigation, same
    rationale as the anchor-line swap in p3ll/p1p2ll).
    """
    R1, t1, ok1 = _p2p1ll_one(x, X, n, P, V, n_grid, n_roots)
    R2, t2, ok2 = _p2p1ll_one(x[::-1], X[::-1], n, P, V, n_grid, n_roots)
    return (jnp.concatenate([R1, R2], axis=0),
            jnp.concatenate([t1, t2], axis=0),
            jnp.concatenate([ok1, ok2], axis=0))


def _p2p1ll_one(x, X, n, P, V, n_grid, n_roots):
    x = _normalize(x)
    n = _normalize(n)
    V = _normalize(V)
    dX = X[1] - X[0]
    dP = P - X[0]
    n_x1 = jnp.dot(n, x[0])
    n_x1s = jnp.where(jnp.abs(n_x1) < _EPS, _EPS, n_x1)
    # w = R dX + d1 x1 must be parallel to x2; project on basis (y1, y2)
    y1 = _any_perp(x[1])
    y2 = jnp.cross(x[1], y1)
    # d1 = -(n . R dP) / (n . x1)
    C2 = jnp.outer(dX, y1) - (jnp.dot(y1, x[0]) / n_x1s) * jnp.outer(dP, n)
    C3 = jnp.outer(dX, y2) - (jnp.dot(y2, x[0]) / n_x1s) * jnp.outer(dP, n)
    R, ok = solve_two_trace_constraints(V, n, C2, C3,
                                        n_grid=n_grid, n_roots=n_roots)
    d1 = -jnp.einsum("i,...ij,j->...", n, R, dP) / n_x1s
    t = d1[..., None] * x[0] - jnp.einsum("...ij,j->...i", R, X[0])
    # cheirality of the second point
    d2 = jnp.einsum("i,...i->...", x[1],
                    jnp.einsum("...ij,j->...i", R, X[1]) + t)
    return R, t, ok & (d1 > 0) & (d2 > 0)


@functools.partial(jax.jit, static_argnames=("n_grid", "n_roots"))
def p3ll(n, P, V, n_grid: int = 256, n_roots: int = 8):
    """Batched pose from 3 lines.  n/P/V: [..., 3, 3].

    Returns (R [..., 2*n_roots, 3, 3], t [..., 2*n_roots, 3],
    valid [..., 2*n_roots]).
    """
    f = functools.partial(_p3ll_single, n_grid=n_grid, n_roots=n_roots)
    for _ in range(n.ndim - 2):
        f = jax.vmap(f)
    return f(n, P, V)


@functools.partial(jax.jit, static_argnames=("n_grid", "n_roots"))
def p1p2ll(x, X, n, P, V, n_grid: int = 256, n_roots: int = 8):
    """Batched pose from 1 point + 2 lines.

    x/X: [..., 3]; n/P/V: [..., 2, 3].
    """
    f = functools.partial(_p1p2ll_single, n_grid=n_grid, n_roots=n_roots)
    for _ in range(x.ndim - 1):
        f = jax.vmap(f)
    return f(x, X, n, P, V)


@functools.partial(jax.jit, static_argnames=("n_grid", "n_roots"))
def p2p1ll(x, X, n, P, V, n_grid: int = 256, n_roots: int = 8):
    """Batched pose from 2 points + 1 line.

    x/X: [..., 2, 3]; n/P/V: [..., 3].
    """
    f = functools.partial(_p2p1ll_single, n_grid=n_grid, n_roots=n_roots)
    for _ in range(x.ndim - 2):
        f = jax.vmap(f)
    return f(x, X, n, P, V)


def line2d_to_normal(l2d_start, l2d_end, kvec):
    """Back-projected plane normal of a pixel-space 2D segment.

    kvec = (fx, fy, cx, cy).  Returns unit normals [..., 3] in the
    camera frame (n . x_cam = 0 for every camera-frame point x_cam on
    the observed line).
    """
    def norm_coords(p):
        u = (p[..., 0] - kvec[..., 2]) / kvec[..., 0]
        v = (p[..., 1] - kvec[..., 3]) / kvec[..., 1]
        return jnp.stack([u, v, jnp.ones_like(u)], axis=-1)

    xs = norm_coords(l2d_start)
    xe = norm_coords(l2d_end)
    return _normalize(jnp.cross(xs, xe))
