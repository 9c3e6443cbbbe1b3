import jax.numpy as jnp
import numpy as np

from limap_tpu.ops import polynomial as poly


def test_quadratic(rng):
    roots = np.sort(rng.normal(size=(50, 2)), axis=1)
    b = -(roots[:, 0] + roots[:, 1])
    c = roots[:, 0] * roots[:, 1]
    out = np.sort(np.asarray(poly.solve_quadratic(
        jnp.ones(50), jnp.asarray(b), jnp.asarray(c))), axis=1)
    np.testing.assert_allclose(out, roots, atol=1e-4)


def test_quadratic_complex():
    out = np.asarray(poly.solve_quadratic(
        jnp.asarray([1.0]), jnp.asarray([0.0]), jnp.asarray([1.0])))
    assert np.isnan(out).all()


def test_cubic_real(rng):
    # x^3 + bx^2 + cx + d with known real root structure
    roots = rng.normal(size=(50, 3))
    b = -roots.sum(1)
    c = (roots[:, 0] * roots[:, 1] + roots[:, 0] * roots[:, 2]
         + roots[:, 1] * roots[:, 2])
    d = -roots.prod(1)
    out = np.asarray(poly.solve_cubic_real(
        jnp.asarray(b), jnp.asarray(c), jnp.asarray(d)))
    # the returned root satisfies the cubic
    res = out**3 + b * out**2 + c * out + d
    scale = 1 + np.abs(roots).max(1) ** 3
    np.testing.assert_allclose(res / scale, 0, atol=1e-3)


def test_quartic_four_real_roots(rng):
    roots = np.sort(rng.uniform(-3, 3, size=(100, 4)), axis=1)
    # expand (x-r1)(x-r2)(x-r3)(x-r4)
    b = -roots.sum(1)
    c = np.zeros(100)
    d = np.zeros(100)
    e = roots.prod(1)
    for i in range(4):
        for j in range(i + 1, 4):
            c += roots[:, i] * roots[:, j]
    for i in range(4):
        d -= np.prod(np.delete(roots, i, axis=1), axis=1)
    out = np.asarray(poly.solve_quartic_real(
        jnp.asarray(b), jnp.asarray(c), jnp.asarray(d), jnp.asarray(e)))
    out = np.sort(out, axis=1)
    # all four real roots recovered
    ok = np.isfinite(out).all(1)
    assert ok.mean() > 0.9
    np.testing.assert_allclose(out[ok], roots[ok], atol=5e-3)


def test_quartic_two_real_roots(rng):
    # (x^2 + 1)(x - r1)(x - r2): exactly two real roots
    r = np.sort(rng.uniform(-2, 2, size=(50, 2)), 1)
    b = -(r[:, 0] + r[:, 1])
    c = 1 + r[:, 0] * r[:, 1]
    d = b
    e = r[:, 0] * r[:, 1]
    out = np.asarray(poly.solve_quartic_real(
        jnp.asarray(b), jnp.asarray(c), jnp.asarray(d), jnp.asarray(e)))
    n_real = np.isfinite(out).sum(1)
    assert (n_real == 2).mean() > 0.9
    for i in range(50):
        reals = np.sort(out[i][np.isfinite(out[i])])
        if len(reals) == 2:
            np.testing.assert_allclose(reals, r[i], atol=5e-3)
