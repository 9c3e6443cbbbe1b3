"""Minimal point-line pose solvers (p3ll / p1p2ll / p2p1ll).

Reference parity: PoseLib dispatch in
/root/reference/src/limap/estimators/absolute_pose/joint_pose_estimator.cc:113-122
and the hybrid sampling of hybrid_pose_estimator.h:45-127.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from limap_tpu.base.pose import quat_to_rotmat
from limap_tpu.estimators.pnl_solvers import (line2d_to_normal, p1p2ll,
                                              p2p1ll, p3ll)


def _random_pose(rng):
    aa = rng.normal(size=3)
    th = np.linalg.norm(aa)
    ax = aa / th
    q = np.concatenate([[np.cos(th / 2)], np.sin(th / 2) * ax])
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    return R, rng.normal(size=3)


def _make_scene(rng, R, t):
    def cam_normal(P, V):
        a = R @ P + t
        b = R @ (P + 0.7 * V) + t
        n = np.cross(a, b)
        return n / np.linalg.norm(n)

    def make_point():
        while True:
            X = rng.normal(size=3) * 2
            xc = R @ X + t
            if xc[2] > 0.1:
                return X, xc / np.linalg.norm(xc)

    Ps, Vs, ns = [], [], []
    for _ in range(3):
        P = rng.normal(size=3) * 2
        V = rng.normal(size=3)
        V /= np.linalg.norm(V)
        Ps.append(P)
        Vs.append(V)
        ns.append(cam_normal(P, V))
    X1, x1 = make_point()
    X2, x2 = make_point()
    return (np.asarray(Ps), np.asarray(Vs), np.asarray(ns),
            np.stack([X1, X2]), np.stack([x1, x2]))


def _best_err(R_gt, t_gt, R, t, ok):
    R, t, ok = np.asarray(R), np.asarray(t), np.asarray(ok)
    errs = [np.linalg.norm(R[i] - R_gt) + np.linalg.norm(t[i] - t_gt)
            for i in range(len(ok)) if ok[i]]
    return min(errs) if errs else np.inf


# float32 grid+bisection root finding: poses land well inside the
# basin of the RANSAC LM polish (reference uses exact f64 Groebner)
TOL = 5e-3


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_p3ll_recovers_pose(seed):
    rng = np.random.default_rng(seed)
    R_gt, t_gt = _random_pose(rng)
    Ps, Vs, ns, _, _ = _make_scene(rng, R_gt, t_gt)
    R, t, ok = p3ll(jnp.asarray(ns), jnp.asarray(Ps), jnp.asarray(Vs))
    assert _best_err(R_gt, t_gt, R, t, ok) < TOL


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_p1p2ll_recovers_pose(seed):
    rng = np.random.default_rng(seed)
    R_gt, t_gt = _random_pose(rng)
    Ps, Vs, ns, Xs, xs = _make_scene(rng, R_gt, t_gt)
    R, t, ok = p1p2ll(jnp.asarray(xs[0]), jnp.asarray(Xs[0]),
                      jnp.asarray(ns[:2]), jnp.asarray(Ps[:2]),
                      jnp.asarray(Vs[:2]))
    assert _best_err(R_gt, t_gt, R, t, ok) < TOL


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_p2p1ll_recovers_pose(seed):
    rng = np.random.default_rng(seed)
    R_gt, t_gt = _random_pose(rng)
    Ps, Vs, ns, Xs, xs = _make_scene(rng, R_gt, t_gt)
    R, t, ok = p2p1ll(jnp.asarray(xs), jnp.asarray(Xs),
                      jnp.asarray(ns[0]), jnp.asarray(Ps[0]),
                      jnp.asarray(Vs[0]))
    assert _best_err(R_gt, t_gt, R, t, ok) < TOL


def test_p3ll_batched():
    rng = np.random.default_rng(7)
    R_gt, t_gt = _random_pose(rng)
    batch = [_make_scene(rng, R_gt, t_gt)[:3] for _ in range(5)]
    ns = jnp.asarray([b[2] for b in batch])
    Ps = jnp.asarray([b[0] for b in batch])
    Vs = jnp.asarray([b[1] for b in batch])
    R, t, ok = p3ll(ns, Ps, Vs)
    assert R.shape[0] == 5 and R.shape[-2:] == (3, 3)
    for i in range(5):
        assert _best_err(R_gt, t_gt, R[i], t[i], ok[i]) < TOL


def test_line2d_to_normal_is_perpendicular():
    rng = np.random.default_rng(0)
    kvec = jnp.asarray([400.0, 420.0, 320.0, 240.0])
    s = jnp.asarray(rng.uniform(0, 640, size=(10, 2)), jnp.float32)
    e = jnp.asarray(rng.uniform(0, 640, size=(10, 2)), jnp.float32)
    n = line2d_to_normal(s, e, kvec)
    xs = jnp.stack([(s[:, 0] - 320.0) / 400.0, (s[:, 1] - 240.0) / 420.0,
                    jnp.ones(10)], axis=-1)
    xe = jnp.stack([(e[:, 0] - 320.0) / 400.0, (e[:, 1] - 240.0) / 420.0,
                    jnp.ones(10)], axis=-1)
    assert np.abs(np.asarray(jnp.sum(n * xs, -1))).max() < 1e-5
    assert np.abs(np.asarray(jnp.sum(n * xe, -1))).max() < 1e-5
    assert np.allclose(np.linalg.norm(np.asarray(n), axis=-1), 1.0,
                       atol=1e-5)


@pytest.mark.slow
def test_pl_ransac_line_only_and_mixed():
    """Full PnPL front door in pure-line / mixed / few-point regimes."""
    from limap_tpu.base.camera import Camera
    from limap_tpu.estimators.absolute_pose import pl_estimate_absolute_pose

    rng = np.random.default_rng(1)
    R_gt, _ = _random_pose(rng)
    t_gt = np.array([0.2, -0.1, 4.0])
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
    cam = Camera(model="PINHOLE", params=[400.0, 400.0, 320.0, 240.0],
                 cam_id=0, hw=(480, 640))

    def project(X):
        xc = R_gt @ X + t_gt
        return (K @ (xc / xc[2]))[:2]

    p3ds, p2ds = [], []
    while len(p3ds) < 20:
        X = rng.normal(size=3) * 1.5
        if (R_gt @ X + t_gt)[2] < 0.5:
            continue
        p3ds.append(X)
        p2ds.append(project(X))
    p3ds, p2ds = np.array(p3ds), np.array(p2ds)
    p2ds[::5] += rng.normal(size=p2ds[::5].shape) * 80  # outliers

    l3ds, l2ds, ids = [], [], []
    while len(l3ds) < 20:
        P = rng.normal(size=3) * 1.5
        V = rng.normal(size=3)
        V /= np.linalg.norm(V)
        A, B = P - 0.4 * V, P + 0.4 * V
        if (R_gt @ A + t_gt)[2] < 0.5 or (R_gt @ B + t_gt)[2] < 0.5:
            continue
        ids.append(len(l3ds))
        l3ds.append(np.stack([A, B]))
        l2ds.append(np.stack([project(A), project(B)]))
    l3ds, l2ds, ids = np.array(l3ds), np.array(l2ds), np.array(ids)
    l2ds[::6] += rng.normal(size=l2ds[::6].shape) * 60  # outliers

    cfg = {"ransac": {"method": "hybrid", "thres_point": 5.0,
                      "thres_line": 5.0, "n_hypotheses": 512}}

    def rot_err(pose):
        Rm = np.asarray(pose.R())
        return np.degrees(np.arccos(np.clip(
            (np.trace(Rm.T @ R_gt) - 1) / 2, -1, 1)))

    pose, stats = pl_estimate_absolute_pose(
        cfg, l3ds, ids, l2ds, p3ds, p2ds, cam, seed=0)
    assert rot_err(pose) < 0.1
    assert np.linalg.norm(np.asarray(pose.tvec) - t_gt) < 0.01

    # pure line localization (impossible before p3ll existed)
    pose, _ = pl_estimate_absolute_pose(
        cfg, l3ds, ids, l2ds, np.zeros((0, 3)), np.zeros((0, 2)), cam,
        seed=0)
    assert rot_err(pose) < 0.1
    assert np.linalg.norm(np.asarray(pose.tvec) - t_gt) < 0.01

    # 2 points + lines (exercises p2p1ll / p1p2ll sampling)
    pose, _ = pl_estimate_absolute_pose(
        cfg, l3ds, ids, l2ds, p3ds[:2], p2ds[:2], cam, seed=0)
    assert rot_err(pose) < 0.1
