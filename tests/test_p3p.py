import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from limap_tpu.estimators.p3p import kabsch, p3p


def test_kabsch(rng):
    R_gt = Rotation.from_rotvec(rng.normal(size=3)).as_matrix()
    t_gt = rng.normal(size=3)
    src = rng.normal(size=(6, 3))
    dst = src @ R_gt.T + t_gt
    R, t = kabsch(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-4)


@pytest.mark.slow
def test_p3p_recovers_pose(rng):
    n = 64
    found = 0
    attempts = 0
    for i in range(n):
        R_gt = Rotation.from_rotvec(rng.normal(size=3) * 0.5).as_matrix()
        C = rng.normal(size=3)
        t_gt = -R_gt @ C
        X = rng.normal(size=(3, 3)) * 2
        X[:, 2] += 6  # in front
        Xc = X @ R_gt.T + t_gt
        if (Xc[:, 2] <= 0.1).any():
            continue
        attempts += 1
        f = Xc / np.linalg.norm(Xc, axis=1, keepdims=True)
        R, t, ok = p3p(jnp.asarray(f)[None], jnp.asarray(X)[None])
        R = np.asarray(R)[0]
        t = np.asarray(t)[0]
        ok = np.asarray(ok)[0]
        best = 1e9
        for k in range(4):
            if not ok[k]:
                continue
            err = (np.abs(R[k] - R_gt).max() + np.linalg.norm(t[k] - t_gt))
            best = min(best, err)
        if best < 5e-2:
            found += 1
    assert found / attempts > 0.85
