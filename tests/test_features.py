import jax.numpy as jnp
import numpy as np
import pytest

from limap_tpu.features import (FeatureMap, GradientFeatureExtractor,
                                extract_line_patches, interpolate_bicubic,
                                interpolate_bilinear)


def test_bilinear_exact_on_grid(rng):
    fmap = rng.normal(size=(20, 30)).astype(np.float32)
    pts = np.array([[3.0, 4.0], [10.0, 7.0]])
    out = np.asarray(interpolate_bilinear(jnp.asarray(fmap),
                                          jnp.asarray(pts)))
    np.testing.assert_allclose(out, [fmap[4, 3], fmap[7, 10]], atol=1e-6)


def test_bicubic_reproduces_linear_ramp():
    H, W = 16, 16
    ys, xs = np.mgrid[0:H, 0:W]
    fmap = (2.0 * xs + 3.0 * ys).astype(np.float32)
    pts = np.array([[5.3, 6.7], [8.1, 2.2]])
    out = np.asarray(interpolate_bicubic(jnp.asarray(fmap),
                                         jnp.asarray(pts, np.float32)))
    ref = 2.0 * pts[:, 0] + 3.0 * pts[:, 1]
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_bicubic_differentiable():
    import jax
    fmap = jnp.arange(100.0).reshape(10, 10)
    g = jax.grad(lambda p: interpolate_bicubic(fmap, p))(
        jnp.asarray([4.5, 4.5]))
    assert np.isfinite(np.asarray(g)).all()
    # ramp: d/dx = 1, d/dy = 10
    np.testing.assert_allclose(np.asarray(g), [1.0, 10.0], atol=1e-3)


def test_line_patches_shape(rng):
    fmap = jnp.asarray(rng.normal(size=(40, 60, 3)), jnp.float32)
    s = jnp.asarray([[5.0, 5.0], [10.0, 30.0]])
    e = jnp.asarray([[50.0, 8.0], [40.0, 35.0]])
    patches = extract_line_patches(fmap, s, e, n_along=16, n_perp=5)
    assert patches.shape == (2, 16, 5, 3)


def test_gradient_extractor(rng):
    img = (rng.uniform(size=(32, 48)) * 255).astype(np.uint8)
    f = GradientFeatureExtractor().extract(img)
    assert f.shape == (32, 48, 6)
    fm = FeatureMap(f)
    v = fm.interpolate(np.array([[10.5, 10.5]]))
    assert np.isfinite(np.asarray(v)).all()


@pytest.mark.slow
def test_refinement_with_heatmap(rng):
    """Heatmap term pulls a slightly-off line toward the heatmap ridge."""
    import jax.numpy as jnp
    from limap_tpu.base.linetrack import tracks_to_batch
    from limap_tpu.optimize.line_refinement import (RefinementConfig,
                                                    build_heatmap_patches,
                                                    solve_line_refinement)
    from tests.test_line_ba import build_tracks

    tracks, id2idx, vb, gt = build_tracks(rng, n_views=4, n_tracks=3)
    batch = tracks_to_batch(tracks, id2idx)
    # heatmaps: all-ones ridge everywhere (residual -> 0 on any line);
    # just verifies the term compiles + runs and cost decreases
    heatmaps = {i: np.ones((480, 640), np.float32) for i in range(4)}
    data = build_heatmap_patches(batch, heatmaps)
    refined, result = solve_line_refinement(
        batch, vb, RefinementConfig(loss="trivial", use_heatmap=True),
        heatmap_data=data, num_iterations=10)
    assert float(jnp.sum(result.cost)) <= float(jnp.sum(result.cost0))
