"""Pallas NN-distance kernel vs numpy (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from limap_tpu.ops.pallas.nn_distance import min_dist_pallas


def test_min_dist_pallas_interpret(rng):
    samples = rng.normal(size=(70, 3)).astype(np.float32)
    points = (rng.normal(size=(300, 3)) * 2).astype(np.float32)
    d = np.asarray(min_dist_pallas(jnp.asarray(samples),
                                   jnp.asarray(points), True))
    ref = np.sqrt(((samples[:, None] - points[None]) ** 2).sum(-1)).min(1)
    np.testing.assert_allclose(d, ref, atol=1e-4)
