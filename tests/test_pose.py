import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from limap_tpu.base import pose


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_rotmat_matches_scipy(rng):
    q = random_quats(rng, 64)
    R = np.asarray(pose.quat_to_rotmat(jnp.asarray(q)))
    # scipy uses (x, y, z, w)
    R_ref = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_rotmat_quat_roundtrip(rng):
    q = random_quats(rng, 128)
    q = np.where(q[:, :1] < 0, -q, q)  # canonical sign
    R = np.asarray(pose.quat_to_rotmat(jnp.asarray(q)))
    q2 = np.asarray(pose.rotmat_to_quat(jnp.asarray(R)))
    np.testing.assert_allclose(q2, q, atol=1e-4)


def test_rotmat_quat_edge_cases():
    # identity and 180-degree rotations stress the pivot selection
    mats = [np.eye(3)]
    for axis in range(3):
        aa = np.zeros(3)
        aa[axis] = np.pi
        mats.append(Rotation.from_rotvec(aa).as_matrix())
    for R in mats:
        q = np.asarray(pose.rotmat_to_quat(jnp.asarray(R)))
        R2 = np.asarray(pose.quat_to_rotmat(jnp.asarray(q)))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = random_quats(rng, 32)
    v = rng.normal(size=(32, 3))
    out = np.asarray(pose.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    R = np.asarray(pose.quat_to_rotmat(jnp.asarray(q)))
    ref = np.einsum("nij,nj->ni", R, v)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_axis_angle_to_quat(rng):
    aa = rng.normal(size=(16, 3))
    q = np.asarray(pose.axis_angle_to_quat(jnp.asarray(aa)))
    ref = Rotation.from_rotvec(aa).as_quat()[:, [3, 0, 1, 2]]
    # sign-canonicalize both
    q = np.where(q[:, :1] < 0, -q, q)
    ref = np.where(ref[:, :1] < 0, -ref, ref)
    np.testing.assert_allclose(q, ref, atol=1e-5)
    # zero rotation is differentiable-safe and exact
    q0 = np.asarray(pose.axis_angle_to_quat(jnp.zeros(3)))
    np.testing.assert_allclose(q0, [1, 0, 0, 0], atol=1e-6)


def test_pose_center_projdepth(rng):
    q = random_quats(rng, 8)
    t = rng.normal(size=(8, 3))
    C = np.asarray(pose.pose_center(jnp.asarray(q), jnp.asarray(t)))
    R = np.asarray(pose.quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(
        C, -np.einsum("nji,nj->ni", R, t), atol=1e-5)
    p = rng.normal(size=(8, 3))
    d = np.asarray(pose.projdepth(jnp.asarray(q), jnp.asarray(t),
                                  jnp.asarray(p)))
    ref = np.einsum("nij,nj->ni", R, p) + t
    np.testing.assert_allclose(d, ref[:, 2], atol=1e-5)
