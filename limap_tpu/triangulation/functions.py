"""Two-view line triangulation primitives, fully batched.

Vectorized re-design of /root/reference/src/limap/triangulation/functions.cc:
epipolar IoU, two-ray point triangulation, algebraic line triangulation by
ray-plane intersection, endpoint triangulation, VP-directed triangulation,
known-infinite-line unprojection, and the one-point triangulation (which
replaces the reference's 651-line closed-form quartic
solvers/triangulation/triangulate_line_with_one_point.cc with a batched
1-D search over the pencil of lines through the known point + Newton
polish — see :func:`triangulate_line_with_one_point`).

Every function broadcasts over leading batch dims; invalid results are
flagged via ``score = -1`` exactly like the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from limap_tpu.base.camera import CameraViewsBatch
from limap_tpu.base.infinite_line import InfiniteLines3d
from limap_tpu.base.lines import EPS, Segments

INVALID_SCORE = -1.0


def _norm(v):
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + EPS)


def _invalid_like(start):
    """Invalid Line3d sentinel (start 0, end 1, score -1) like the
    reference's ``Line3d(V3D(0,0,0), V3D(1,1,1), -1)``."""
    return Segments(
        start=jnp.zeros_like(start), end=jnp.ones_like(start),
        score=jnp.full(start.shape[:-1], INVALID_SCORE, start.dtype),
        depths=jnp.full(start.shape[:-1] + (2,), -1.0, start.dtype),
    )


def _select(valid, good: Segments, bad: Segments) -> Segments:
    v = valid[..., None]
    return Segments(
        start=jnp.where(v, good.start, bad.start),
        end=jnp.where(v, good.end, bad.end),
        score=jnp.where(valid, good.score, bad.score),
        depths=jnp.where(v, good.depths, bad.depths),
    )


def test_line_inside_ranges(line: Segments, ranges) -> jnp.ndarray:
    """Axis-aligned scene-range test (functions.cc:8-26)."""
    lo, hi = ranges
    ok_s = jnp.all((line.start >= lo) & (line.start <= hi), axis=-1)
    ok_e = jnp.all((line.end >= lo) & (line.end <= hi), axis=-1)
    return ok_s & ok_e


def get_normal_direction(l2d: Segments,
                         views: CameraViewsBatch) -> jnp.ndarray:
    """Unit normal of the back-projection plane of a 2D segment
    (functions.cc:28-35)."""
    c_start = views.ray_direction(l2d.start)
    c_end = views.ray_direction(l2d.end)
    return _norm(jnp.cross(c_start, c_end))


def get_direction_from_vp(vp: jnp.ndarray,
                          views: CameraViewsBatch) -> jnp.ndarray:
    """World direction of a vanishing point (functions.cc:37-42)."""
    u = (vp[..., 0] - views.kvec[..., 2] * vp[..., 2]) / views.kvec[..., 0]
    v = (vp[..., 1] - views.kvec[..., 3] * vp[..., 2]) / views.kvec[..., 1]
    d_cam = jnp.stack([u, v, vp[..., 2]], axis=-1)
    from limap_tpu.base.pose import quat_normalize, quat_rotate
    qc = views.qvec * jnp.asarray([1.0, -1, -1, -1], views.qvec.dtype)
    return _norm(quat_rotate(quat_normalize(qc), d_cam))


def compute_essential_matrix(view1: CameraViewsBatch,
                             view2: CameraViewsBatch) -> jnp.ndarray:
    """E = [t_rel]x R_rel (functions.cc:44-67)."""
    R1, R2 = view1.R(), view2.R()
    relR = R2 @ jnp.swapaxes(R1, -1, -2)
    relT = view2.tvec - jnp.einsum("...ij,...j->...i", relR, view1.tvec)
    tx = _skew(relT)
    return tx @ relR


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros_like(v[..., 0])
    rows = jnp.stack(
        [z, -v[..., 2], v[..., 1],
         v[..., 2], z, -v[..., 0],
         -v[..., 1], v[..., 0], z], axis=-1)
    return rows.reshape(rows.shape[:-1] + (3, 3))


def _K_inv(views: CameraViewsBatch) -> jnp.ndarray:
    fx, fy = views.kvec[..., 0], views.kvec[..., 1]
    cx, cy = views.kvec[..., 2], views.kvec[..., 3]
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    Ki = jnp.stack([1 / fx, z, -cx / fx, z, 1 / fy, -cy / fy, z, z, o],
                   axis=-1)
    return Ki.reshape(Ki.shape[:-1] + (3, 3))


def compute_fundamental_matrix(view1: CameraViewsBatch,
                               view2: CameraViewsBatch) -> jnp.ndarray:
    """F = K2^-T E K1^-1 (functions.cc:69-74)."""
    E = compute_essential_matrix(view1, view2)
    K1i = _K_inv(view1)
    K2i = _K_inv(view2)
    return jnp.swapaxes(K2i, -1, -2) @ E @ K1i


def epipolar_line(view1: CameraViewsBatch, view2: CameraViewsBatch,
                  p1: jnp.ndarray) -> jnp.ndarray:
    """``F @ [p1; 1]`` computed matrix-free.

    Forming F as batched 3x3 matrices makes XLA emit tiny padded-MXU
    dot_generals plus layout copies that dominate the proposal kernel
    (~50 ms/scene profiled in-env); the chain
    ``K2^-T [t_rel]x R2 R1^T K1^-1`` applied to a vector is pure
    elementwise math + two quaternion rotations + one cross product.
    """
    from limap_tpu.base.pose import quat_normalize, quat_rotate

    u = (p1[..., 0] - view1.kvec[..., 2]) / view1.kvec[..., 0]
    v = (p1[..., 1] - view1.kvec[..., 3]) / view1.kvec[..., 1]
    x1 = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)       # K1^-1 p1
    q1c = quat_normalize(view1.qvec
                         * jnp.asarray([1.0, -1, -1, -1],
                                       view1.qvec.dtype))
    rx = quat_rotate(view2.qvec, quat_rotate(q1c, x1))      # R_rel x1
    rt = quat_rotate(view2.qvec, quat_rotate(q1c, view1.tvec))
    t_rel = view2.tvec - rt
    ex = jnp.cross(t_rel, rx)                               # E x1
    fx2, fy2 = view2.kvec[..., 0], view2.kvec[..., 1]
    cx2, cy2 = view2.kvec[..., 2], view2.kvec[..., 3]
    return jnp.stack([ex[..., 0] / fx2, ex[..., 1] / fy2,
                      ex[..., 2] - (cx2 / fx2) * ex[..., 0]
                      - (cy2 / fy2) * ex[..., 1]], axis=-1)  # K2^-T E x1


def compute_epipolar_iou(l1: Segments, view1: CameraViewsBatch,
                         l2: Segments, view2: CameraViewsBatch,
                         F: jnp.ndarray = None) -> jnp.ndarray:
    """IoU of l2 with the epipolar band of l1 (functions.cc:76-98).

    Pass a precomputed fundamental matrix ``F`` to amortize it across all
    matches of an image pair (the reference recomputes it per call).
    """
    coor_l2 = l2.coords()

    def intersect_at(p):
        if F is None:
            epline = _norm(epipolar_line(view1, view2, p))
        else:
            ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
            epline = _norm(jnp.einsum("...ij,...j->...i", F, ph))
        c_homo = jnp.cross(coor_l2, epline)
        return c_homo[..., :2] / (c_homo[..., 2:3] + EPS)

    c_start = intersect_at(l1.start)
    c_end = intersect_at(l1.end)
    dir2 = l2.direction()
    len2 = l2.length()
    c1 = jnp.sum((c_start - l2.start) * dir2, axis=-1) / (len2 + EPS)
    c2 = jnp.sum((c_end - l2.start) * dir2, axis=-1) / (len2 + EPS)
    lo = jnp.minimum(c1, c2)
    hi = jnp.maximum(c1, c2)
    return (jnp.minimum(hi, 1.0) - jnp.maximum(lo, 0.0)) / (
        jnp.maximum(hi, 1.0) - jnp.minimum(lo, 0.0) + EPS)


def triangulate_point(p1, view1: CameraViewsBatch,
                      p2, view2: CameraViewsBatch):
    """Two-ray midpoint triangulation + cheirality (functions.cc:100-117).

    Returns (point [..., 3], valid mask).
    """
    C1 = view1.center()
    C2 = view2.center()
    n1 = view1.ray_direction(p1)
    n2 = view2.ray_direction(p2)
    a11 = jnp.sum(n1 * n1, axis=-1)
    a12 = -jnp.sum(n1 * n2, axis=-1)
    a22 = jnp.sum(n2 * n2, axis=-1)
    b1 = jnp.sum(n1 * (C2 - C1), axis=-1)
    b2 = jnp.sum(n2 * (C1 - C2), axis=-1)
    det = a11 * a22 - a12 * a12
    det_safe = jnp.where(jnp.abs(det) < EPS, 1.0, det)
    t1 = (b1 * a22 - b2 * a12) / det_safe
    t2 = (a11 * b2 - a12 * b1) / det_safe
    point = 0.5 * (n1 * t1[..., None] + C1 + n2 * t2[..., None] + C2)
    valid = ((view1.projdepth(point) >= EPS)
             & (view2.projdepth(point) >= EPS)
             & (jnp.abs(det) >= EPS))
    return point, valid


def triangulate_line_by_endpoints(l1: Segments, view1: CameraViewsBatch,
                                  l2: Segments,
                                  view2: CameraViewsBatch) -> Segments:
    """Endpoint-wise triangulation (functions.cc:171-190)."""
    ps, ok_s = triangulate_point(l1.start, view1, l2.start, view2)
    pe, ok_e = triangulate_point(l1.end, view1, l2.end, view2)
    z_s = view1.projdepth(ps)
    z_e = view1.projdepth(pe)
    good = Segments(start=ps, end=pe, score=jnp.ones_like(z_s),
                    depths=jnp.stack([z_s, z_e], axis=-1))
    return _select(ok_s & ok_e, good, _invalid_like(ps))


def triangulate_line_algebraic(l1: Segments, view1: CameraViewsBatch,
                               l2: Segments,
                               view2: CameraViewsBatch) -> Segments:
    """Asymmetric plane-ray triangulation (functions.cc:192-233).

    l1's endpoint rays are intersected with the back-projection plane of
    l2; solved via the same 3x3 system as the reference but with an
    explicit adjugate inverse (branch-free, batched).
    """
    c1_start = view1.ray_direction(l1.start)
    c1_end = view1.ray_direction(l1.end)
    c2_start = view2.ray_direction(l2.start)
    c2_end = view2.ray_direction(l2.end)
    C1 = view1.center()
    B = view2.center() - C1

    def solve_depth(ray):
        # first component of A^-1 B with A = [ray, -c2_start, -c2_end]
        # by Cramer's rule: t = det([B, -c2s, -c2e]) / det(A)
        n2 = jnp.cross(c2_start, c2_end)  # unnormalized plane normal
        denom = jnp.sum(ray * n2, axis=-1)
        nume = jnp.sum(B * n2, axis=-1)
        t = nume / jnp.where(jnp.abs(denom) < EPS, EPS, denom)
        return t

    t_s = solve_depth(c1_start)
    t_e = solve_depth(c1_end)
    p_start = c1_start * t_s[..., None] + C1
    p_end = c1_end * t_e[..., None] + C1
    z_s = view1.projdepth(p_start)
    z_e = view1.projdepth(p_end)
    d21 = view2.projdepth(p_start)
    d22 = view2.projdepth(p_end)
    valid = (z_s >= EPS) & (z_e >= EPS) & (d21 >= EPS) & (d22 >= EPS)
    valid &= jnp.all(jnp.isfinite(p_start), -1) & jnp.all(
        jnp.isfinite(p_end), -1)
    good = Segments(start=p_start, end=p_end, score=jnp.ones_like(z_s),
                    depths=jnp.stack([z_s, z_e], axis=-1))
    return _select(valid, good, _invalid_like(p_start))


def triangulate_line_with_infinite_line(
        l1: Segments, view1: CameraViewsBatch,
        inf_line: InfiniteLines3d) -> Segments:
    """Unproject l1's endpoints onto a known 3D line (functions.cc:306-321)."""
    C = view1.center()
    ray_s = InfiniteLines3d.from_point_direction(
        C, view1.ray_direction(l1.start))
    p_start = inf_line.project_from_infinite_line(ray_s)
    ray_e = InfiniteLines3d.from_point_direction(
        C, view1.ray_direction(l1.end))
    p_end = inf_line.project_from_infinite_line(ray_e)
    z_s = view1.projdepth(p_start)
    z_e = view1.projdepth(p_end)
    valid = (z_s >= EPS) & (z_e >= EPS)
    good = Segments(start=p_start, end=p_end, score=jnp.ones_like(z_s),
                    depths=jnp.stack([z_s, z_e], axis=-1))
    return _select(valid, good, _invalid_like(p_start))


def triangulate_line_with_direction(
        l1: Segments, view1: CameraViewsBatch,
        l2: Segments, view2: CameraViewsBatch,
        direction: jnp.ndarray) -> Segments:
    """VP-guided triangulation (functions.cc:387-446)."""
    n1 = get_normal_direction(l1, view1)
    direc = direction - jnp.sum(n1 * direction, -1, keepdims=True) * n1
    dnorm = jnp.linalg.norm(direc, axis=-1)
    direc = direc / (dnorm[..., None] + EPS)

    perp = jnp.cross(n1, direc)
    v1s = view1.ray_direction(l1.start)
    v1e = view1.ray_direction(l1.end)
    a1s = jnp.sum(v1s * perp, axis=-1)
    a1e = jnp.sum(v1e * perp, axis=-1)
    flip = a1s < 0
    a1s = jnp.where(flip, -a1s, a1s)
    a1e = jnp.where(flip, -a1e, a1e)
    MIN_VALUE = 0.001

    C1 = view1.center()
    C2 = view2.center()
    n2 = get_normal_direction(l2, view2)
    c1s = jnp.sum(n2 * v1s, axis=-1)
    c1e = jnp.sum(n2 * v1e, axis=-1)
    b = jnp.sum(n2 * (C2 - C1), axis=-1)
    c1 = c1s
    c2 = c1e * a1s / (a1e + EPS)
    d1s = (c1 + c2) * b / (c1 * c1 + c2 * c2 + EPS)
    d1e = d1s * a1s / (a1e + EPS)

    p_start = v1s * d1s[..., None] + C1
    p_end = v1e * d1e[..., None] + C1
    z_s = view1.projdepth(p_start)
    z_e = view1.projdepth(p_end)
    valid = ((dnorm >= EPS) & (a1s >= MIN_VALUE) & (a1e >= MIN_VALUE)
             & (z_s >= EPS) & (z_e >= EPS)
             & (view2.projdepth(p_start) >= EPS)
             & (view2.projdepth(p_end) >= EPS)
             & jnp.all(jnp.isfinite(p_start), -1)
             & jnp.all(jnp.isfinite(p_end), -1))
    good = Segments(start=p_start, end=p_end, score=jnp.ones_like(z_s),
                    depths=jnp.stack([z_s, z_e], axis=-1))
    return _select(valid, good, _invalid_like(p_start))


# ----------------------------------------------------------------------
# One-point triangulation (quartic problem), TPU-native re-derivation
# ----------------------------------------------------------------------
def _one_point_cost(theta, line, p, v1, v2):
    """Cost + depths of the pencil line through p at angle theta.

    The constrained problem of
    solvers/triangulation/triangulate_line_with_one_point.h:12-31
    (minimize distance of the backprojected endpoints lambda_i * v_i to
    the 2D trace ``line`` of the other view's plane, subject to
    collinearity with p) is re-parameterized by the angle of the line
    through p: lambda_i follows in closed form from ray/line
    intersection, turning the quartic in the Lagrange multiplier into a
    smooth 1-D objective suitable for batched grid + Newton refinement.
    """
    d = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    # normal of the pencil line through p
    n = jnp.stack([-d[..., 1], d[..., 0]], axis=-1)
    c = -jnp.sum(n * p, axis=-1)

    def lam(v):
        denom = jnp.sum(n * v, axis=-1)
        return -c / jnp.where(jnp.abs(denom) < EPS, EPS, denom)

    lam1 = lam(v1)
    lam2 = lam(v2)
    lx, ly, lz = line[..., 0], line[..., 1], line[..., 2]
    lnorm = jnp.sqrt(lx * lx + ly * ly + EPS)

    def dist(lam_i, v):
        x = lam_i[..., None] * v
        return (lx * x[..., 0] + ly * x[..., 1] + lz) / lnorm

    e1 = dist(lam1, v1)
    e2 = dist(lam2, v2)
    return e1 * e1 + e2 * e2, lam1, lam2


def triangulate_line_with_one_point_2d(
        line: jnp.ndarray, p: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray,
        n_grid: int = 64, n_newton: int = 8):
    """Solve the reduced 2D problem; returns (lambda1, lambda2).

    Negative lambdas signal failure like the reference's (-1, -1) return.
    ``line``: [..., 3] = (nx, ny, alpha); ``p``/``v1``/``v2``: [..., 2].
    """
    thetas = jnp.linspace(0.0, jnp.pi, n_grid, endpoint=False)
    costs = jax.vmap(
        lambda th: _one_point_cost(th, line, p, v1, v2)[0])(thetas)
    # costs: [n_grid, ...]; pick best seed per problem
    best = jnp.argmin(costs, axis=0)
    theta = thetas[best]

    f = lambda th: _one_point_cost(th, line, p, v1, v2)[0]
    df = jax.grad(lambda th: jnp.sum(f(th)))
    # damped Newton via finite second derivative (cheap, batched)
    def newton_step(th, _):
        g = df(th)
        h = 1e-3
        hess = (df(th + h) - df(th - h)) / (2 * h)
        step = g / jnp.where(jnp.abs(hess) < EPS, EPS, hess)
        step = jnp.clip(step, -0.05, 0.05)
        th_new = th - step
        accept = f(th_new) <= f(th)
        return jnp.where(accept, th_new, th), None

    theta, _ = jax.lax.scan(newton_step, theta, None, length=n_newton)
    _, lam1, lam2 = _one_point_cost(theta, line, p, v1, v2)
    ok = (lam1 > 0) & (lam2 > 0)
    return (jnp.where(ok, lam1, -1.0), jnp.where(ok, lam2, -1.0))


def triangulate_line_with_one_point(
        l1: Segments, view1: CameraViewsBatch,
        l2: Segments, view2: CameraViewsBatch,
        point: jnp.ndarray) -> Segments:
    """Triangulation through a known 3D point (functions.cc:323-385).

    Sets up the in-plane coordinate frame exactly like the reference,
    then solves the reduced problem with the batched pencil search.
    """
    n1 = get_normal_direction(l1, view1)
    C1 = view1.center()
    p_proj = point - jnp.sum(n1 * (point - C1), -1, keepdims=True) * n1
    v1s = view1.ray_direction(l1.start)
    v1e = view1.ray_direction(l1.end)

    n2 = get_normal_direction(l2, view2)
    alpha = -jnp.sum(n2 * view2.center(), axis=-1)

    # frame: e0 = v1s, e1 = orthogonalized v1e, e2 = normal
    e0 = v1s
    e1 = _norm(v1e - jnp.sum(e0 * v1e, -1, keepdims=True) * e0)
    e2 = _norm(jnp.cross(e0, e1))
    R = jnp.stack([e0, e1, e2], axis=-1)  # columns

    def to_frame(v):
        return jnp.einsum("...ij,...i->...j", R, v)

    v2_t = to_frame(v1e)[..., :2]
    p_t = to_frame(p_proj - C1)[..., :2]
    n2_t = to_frame(n2)
    alpha_t = alpha + jnp.sum(n2 * C1, axis=-1)

    line2d = jnp.stack([n2_t[..., 0], n2_t[..., 1], alpha_t], axis=-1)
    v1_t = jnp.stack([jnp.ones_like(alpha_t), jnp.zeros_like(alpha_t)],
                     axis=-1)
    v2_t = _norm(v2_t)
    lam1, lam2 = triangulate_line_with_one_point_2d(line2d, p_t, v1_t, v2_t)

    ls2 = v1_t * lam1[..., None]
    le2 = v2_t * lam2[..., None]
    z = jnp.zeros_like(lam1)[..., None]
    lstart = jnp.einsum(
        "...ij,...j->...i", R, jnp.concatenate([ls2, z], -1)) + C1
    lend = jnp.einsum(
        "...ij,...j->...i", R, jnp.concatenate([le2, z], -1)) + C1
    z_s = view1.projdepth(lstart)
    z_e = view1.projdepth(lend)
    valid = ((lam1 > 0) & (lam2 > 0) & (z_s >= EPS) & (z_e >= EPS)
             & (view2.projdepth(lstart) >= EPS)
             & (view2.projdepth(lend) >= EPS))
    good = Segments(start=lstart, end=lend, score=jnp.ones_like(z_s),
                    depths=jnp.stack([z_s, z_e], axis=-1))
    return _select(valid, good, _invalid_like(lstart))


def line_triangulation_covariance(l1: Segments, view1: CameraViewsBatch,
                                  l2: Segments, view2: CameraViewsBatch,
                                  covariance: jnp.ndarray) -> jnp.ndarray:
    """First-order uncertainty propagation for algebraic triangulation
    (functions.cc:235-292).

    Propagates the [..., 8, 8] covariance of the stacked endpoint pixels
    ``(l1.start, l1.end, l2.start, l2.end)`` through the two-view
    ray/plane endpoint map to the [..., 6, 6] covariance of the
    triangulated 3D endpoints ``(start, end)``.  The reference
    hand-derives the 6x8 Jacobian via matrix-inverse perturbations; here
    the identical map (see :func:`triangulate_line_algebraic`) is
    differentiated exactly with forward-mode autodiff and batched with
    vmap — one fused XLA program for all pairs.
    """
    x8 = jnp.concatenate([l1.start, l1.end, l2.start, l2.end], axis=-1)

    def endpoints(x, v1: CameraViewsBatch, v2: CameraViewsBatch):
        c1s = v1.ray_direction(x[0:2])
        c1e = v1.ray_direction(x[2:4])
        c2s = v2.ray_direction(x[4:6])
        c2e = v2.ray_direction(x[6:8])
        C1 = v1.center()
        B = v2.center() - C1
        n2 = jnp.cross(c2s, c2e)  # back-projection plane of l2
        bn = jnp.sum(B * n2)
        t_s = bn / (jnp.sum(c1s * n2) + EPS)
        t_e = bn / (jnp.sum(c1e * n2) + EPS)
        return jnp.concatenate([C1 + t_s * c1s, C1 + t_e * c1e])

    jac = jax.jacfwd(endpoints)
    for _ in x8.shape[:-1]:
        jac = jax.vmap(jac)
    J = jac(x8, view1, view2)  # [..., 6, 8]
    return J @ covariance @ jnp.swapaxes(J, -1, -2)
