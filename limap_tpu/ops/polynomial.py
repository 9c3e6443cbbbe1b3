"""Branch-free closed-form polynomial root solvers (batched, jittable).

Replaces the reference's dependency on PoseLib's univariate solvers
(poselib::univariate::solve_quartic_real used at
/root/reference/src/limap/solvers/triangulation/triangulate_line_with_one_point.cc:557)
with vmappable closed forms: cubics via the trigonometric/Cardano method,
quartics via Ferrari + resolvent cubic, followed by a few Newton polish
steps to recover f32 accuracy.  Complex roots are returned as NaN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def solve_quadratic(a, b, c):
    """Real roots of a x^2 + b x + c; [..., 2] (NaN when complex)."""
    disc = b * b - 4 * a * c
    s = jnp.sqrt(jnp.maximum(disc, 0.0))
    # numerically stable form
    q = -0.5 * (b + jnp.sign(b + (b == 0)) * s)
    a_safe = jnp.where(jnp.abs(a) < _EPS, _EPS, a)
    q_safe = jnp.where(jnp.abs(q) < _EPS, _EPS, q)
    r1 = q / a_safe
    r2 = c / q_safe
    nan = jnp.full_like(r1, jnp.nan)
    ok = disc >= 0
    return jnp.stack([jnp.where(ok, r1, nan), jnp.where(ok, r2, nan)],
                     axis=-1)


def solve_cubic_real(b, c, d):
    """One real root of x^3 + b x^2 + c x + d (always exists)."""
    # depressed cubic t^3 + p t + q with x = t - b/3
    p = c - b * b / 3.0
    q = 2.0 * b**3 / 27.0 - b * c / 3.0 + d
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # disc > 0: one real root (Cardano)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    t_cardano = u + v

    # disc <= 0: three real roots; take t = 2 sqrt(-p/3) cos(phi/3)
    r = jnp.sqrt(jnp.maximum(-p / 3.0, _EPS))
    r3 = jnp.maximum(r**3, _EPS)
    cos_phi = jnp.clip(-q / (2.0 * r3), -1.0, 1.0)
    phi = jnp.arccos(cos_phi)
    t_trig = 2.0 * r * jnp.cos(phi / 3.0)

    t = jnp.where(disc > 0, t_cardano, t_trig)
    return t - b / 3.0


def _polish_quartic(roots, b, c, d, e, iters: int = 3):
    """Newton-polish roots of x^4 + b x^3 + c x^2 + d x + e."""
    def step(x):
        f = (((x + b) * x + c) * x + d) * x + e
        fp = ((4 * x + 3 * b) * x + 2 * c) * x + d
        fp = jnp.where(jnp.abs(fp) < _EPS, _EPS, fp)
        return x - f / fp

    for _ in range(iters):
        roots = jnp.where(jnp.isnan(roots), roots, step(roots))
    return roots


def solve_quartic_real(b, c, d, e):
    """Real roots of x^4 + b x^3 + c x^2 + d x + e; [..., 4] (NaN pads).

    Ferrari: depress to y^4 + p y^2 + q y + r, factor via a real root of
    the resolvent cubic, then two quadratics.
    """
    p = c - 3.0 * b * b / 8.0
    q = d - b * c / 2.0 + b**3 / 8.0
    r = e - b * d / 4.0 + b * b * c / 16.0 - 3.0 * b**4 / 256.0

    # resolvent cubic: m^3 + p m^2 + (p^2/4 - r) m - q^2/8 = 0, need m>0
    m = solve_cubic_real(p, p * p / 4.0 - r, -q * q / 8.0)
    m = jnp.maximum(m, _EPS)
    sqrt2m = jnp.sqrt(2.0 * m)
    q_safe = jnp.where(jnp.abs(q) < _EPS, _EPS, q)

    # factorization (y^2 + a y + u)(y^2 - a y + v) with a = sqrt(2m),
    # u = p/2 + m - q/(2a), v = p/2 + m + q/(2a)
    half = p / 2.0 + m
    shift = q / (2.0 * sqrt2m)
    ra = solve_quadratic(jnp.ones_like(b), -sqrt2m, half + shift)
    rb = solve_quadratic(jnp.ones_like(b), sqrt2m, half - shift)
    y = jnp.concatenate([ra, rb], axis=-1)
    x = y - b[..., None] / 4.0
    return _polish_quartic(x, b[..., None], c[..., None], d[..., None],
                           e[..., None])
