"""Cameras, poses and batched camera views.

Two layers, by design:

- Host-side :class:`Camera` / :class:`CameraPose` / :class:`CameraView`
  mirror the reference's containers
  (/root/reference/src/limap/base/camera.h:34,88, camera_view.h:19,56) for
  IO, undistortion policy and scene bookkeeping.  They support the COLMAP
  camera model zoo (camera.h:21-32) at the parameter level.
- Device-side :class:`CameraViewsBatch` is the SoA pytree that every TPU
  kernel consumes: ``kvec [N,4] = (fx, fy, cx, cy)``, ``qvec [N,4]``,
  ``tvec [N,3]``.  Geometry kernels require undistorted (pinhole) views,
  exactly like the reference's triangulator requires
  ``imagecols.IsUndistorted()`` (base_line_triangulator.cc:49).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from limap_tpu.base.pose import (quat_normalize, quat_rotate, quat_to_rotmat,
                                 rotmat_to_quat)

EPS = 1e-12

# COLMAP camera models (camera.h:21-32): id -> (name, num_params,
# focal idxs, principal-point idxs)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3, (0,), (1, 2)),
    1: ("PINHOLE", 4, (0, 1), (2, 3)),
    2: ("SIMPLE_RADIAL", 4, (0,), (1, 2)),
    3: ("RADIAL", 5, (0,), (1, 2)),
    4: ("OPENCV", 8, (0, 1), (2, 3)),
    5: ("OPENCV_FISHEYE", 8, (0, 1), (2, 3)),
    6: ("FULL_OPENCV", 12, (0, 1), (2, 3)),
    7: ("FOV", 5, (0, 1), (2, 3)),
    8: ("SIMPLE_RADIAL_FISHEYE", 4, (0,), (1, 2)),
    9: ("RADIAL_FISHEYE", 5, (0,), (1, 2)),
    10: ("THIN_PRISM_FISHEYE", 12, (0, 1), (2, 3)),
}
MODEL_NAME_TO_ID = {v[0]: k for k, v in CAMERA_MODELS.items()}
_UNDISTORTED_MODELS = (0, 1)


class Camera:
    """Host-side camera: COLMAP model id + params + (h, w)."""

    def __init__(self, model=1, params=None, cam_id=-1, hw=(-1, -1), K=None):
        if isinstance(model, str):
            model = MODEL_NAME_TO_ID[model]
        self.model_id = int(model)
        self.camera_id = int(cam_id)
        self.height, self.width = int(hw[0]), int(hw[1])
        name, n_params, _, _ = CAMERA_MODELS[self.model_id]
        if K is not None:
            K = np.asarray(K, dtype=np.float64)
            fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
            if self.model_id == 0:
                params = [fx, cx, cy]
            elif self.model_id == 1:
                params = [fx, fy, cx, cy]
            else:
                raise ValueError(
                    f"K-only init supported for pinhole models, got {name}")
        if params is None:
            params = np.zeros(n_params)
        self.params = np.asarray(params, dtype=np.float64).copy()
        if len(self.params) != n_params:
            raise ValueError(
                f"model {name} expects {n_params} params, got "
                f"{len(self.params)}")

    # ---- intrinsics ----
    @property
    def model_name(self) -> str:
        return CAMERA_MODELS[self.model_id][0]

    def focal_idxs(self) -> Tuple[int, ...]:
        return CAMERA_MODELS[self.model_id][2]

    def pp_idxs(self) -> Tuple[int, ...]:
        return CAMERA_MODELS[self.model_id][3]

    def kvec(self) -> np.ndarray:
        """(fx, fy, cx, cy) — the layout used by all kernels."""
        fi = self.focal_idxs()
        pi = self.pp_idxs()
        fx = self.params[fi[0]]
        fy = self.params[fi[1]] if len(fi) == 2 else fx
        return np.array([fx, fy, self.params[pi[0]], self.params[pi[1]]])

    def K(self) -> np.ndarray:
        fx, fy, cx, cy = self.kvec()
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    def K_inv(self) -> np.ndarray:
        return np.linalg.inv(self.K())

    def h(self) -> int:
        return self.height

    def w(self) -> int:
        return self.width

    def uncertainty(self, depth: float, var2d: float = 5.0) -> float:
        """var2d * depth / mean focal (camera.cc:228-242)."""
        fi = self.focal_idxs()
        f = float(np.mean([self.params[i] for i in fi]))
        return var2d * depth / f

    def is_undistorted(self) -> bool:
        if self.model_id in _UNDISTORTED_MODELS:
            return True
        # distortion params all zero also counts (image_collection semantics)
        fi = set(self.focal_idxs()) | set(self.pp_idxs())
        extra = [p for i, p in enumerate(self.params) if i not in fi]
        return bool(np.all(np.abs(extra) < 1e-12))

    def resize(self, width: int, height: int) -> None:
        """Rescale intrinsics to a new image size (camera.h:68-70)."""
        if self.width <= 0 or self.height <= 0:
            raise ValueError("camera has no size set")
        sx = width / self.width
        sy = height / self.height
        s = (sx + sy) / 2.0
        for i in self.focal_idxs():
            self.params[i] *= s
        pi = self.pp_idxs()
        self.params[pi[0]] *= sx
        self.params[pi[1]] *= sy
        self.width, self.height = int(width), int(height)

    def set_max_image_dim(self, val: int) -> None:
        """Downscale so that max(h, w) <= val (camera.h:71)."""
        if val <= 0:
            return
        mx = max(self.width, self.height)
        if mx <= val:
            return
        ratio = val / mx
        self.resize(int(round(self.width * ratio)),
                    int(round(self.height * ratio)))

    # ---- (de)serialization, dict layout compatible with limap ----
    def as_dict(self) -> dict:
        return {
            "model_id": self.model_id,
            "params": np.asarray(self.params).tolist(),
            "cam_id": self.camera_id,
            "height": self.height,
            "width": self.width,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Camera":
        return cls(model=d.get("model_id", 1), params=d.get("params"),
                   cam_id=d.get("cam_id", -1),
                   hw=(d.get("height", -1), d.get("width", -1)))

    def __eq__(self, other) -> bool:
        return (isinstance(other, Camera)
                and self.model_id == other.model_id
                and np.allclose(self.params, other.params)
                and (self.height, self.width) == (other.height, other.width))


class CameraPose:
    """qvec (w,x,y,z) + tvec, world-to-camera (camera.h:88-112)."""

    def __init__(self, qvec=(1.0, 0, 0, 0), tvec=(0.0, 0, 0), R=None,
                 initialized=True):
        if R is not None:
            qvec = np.asarray(rotmat_to_quat(jnp.asarray(R)))
        self.qvec = np.asarray(qvec, dtype=np.float64)
        self.qvec = self.qvec / (np.linalg.norm(self.qvec) + EPS)
        self.tvec = np.asarray(tvec, dtype=np.float64)
        self.initialized = bool(initialized)

    def R(self) -> np.ndarray:
        return np.asarray(quat_to_rotmat(jnp.asarray(self.qvec)))

    def T(self) -> np.ndarray:
        return self.tvec

    def center(self) -> np.ndarray:
        return -self.R().T @ self.tvec

    def projdepth(self, p3d) -> float:
        return float((self.R() @ np.asarray(p3d) + self.tvec)[2])

    def as_dict(self) -> dict:
        return {"qvec": self.qvec.tolist(), "tvec": self.tvec.tolist(),
                "initialized": self.initialized}

    @classmethod
    def from_dict(cls, d: dict) -> "CameraPose":
        return cls(qvec=d["qvec"], tvec=d["tvec"],
                   initialized=d.get("initialized", True))


class CameraView:
    """Camera + pose + image name (camera_view.h:56-88), host side."""

    def __init__(self, cam: Optional[Camera] = None,
                 pose: Optional[CameraPose] = None,
                 image_name: str = "none"):
        self.cam = cam if cam is not None else Camera()
        self.pose = pose if pose is not None else CameraPose()
        self.image_name = image_name

    # intrinsic/extrinsic shortcuts
    def K(self):
        return self.cam.K()

    def K_inv(self):
        return self.cam.K_inv()

    def R(self):
        return self.pose.R()

    def T(self):
        return self.pose.T()

    def h(self):
        return self.cam.h()

    def w(self):
        return self.cam.w()

    def matrix(self) -> np.ndarray:
        """P = K [R | t] (camera_view.cc:53-59)."""
        P = np.concatenate([self.R(), self.T()[:, None]], axis=1)
        return self.K() @ P

    def projection(self, p3d) -> np.ndarray:
        p = self.K() @ (self.R() @ np.asarray(p3d) + self.T())
        return p[:2] / (p[2] + EPS)

    def ray_direction(self, p2d) -> np.ndarray:
        v = self.R().T @ self.K_inv() @ np.array([p2d[0], p2d[1], 1.0])
        return v / np.linalg.norm(v)

    def get_direction_from_vp(self, vp) -> np.ndarray:
        v = self.R().T @ self.K_inv() @ np.asarray(vp)
        return v / np.linalg.norm(v)

    def read_image(self, set_gray: bool = False):
        import cv2
        img = cv2.imread(self.image_name)
        if self.w() > 0 and self.h() > 0 and img is not None:
            if (img.shape[1], img.shape[0]) != (self.w(), self.h()):
                img = cv2.resize(img, (self.w(), self.h()))
        if set_gray and img is not None:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        return img

    def as_dict(self) -> dict:
        return {"camera": self.cam.as_dict(), "pose": self.pose.as_dict(),
                "image_name": self.image_name}

    @classmethod
    def from_dict(cls, d: dict) -> "CameraView":
        return cls(Camera.from_dict(d["camera"]),
                   CameraPose.from_dict(d["pose"]),
                   d.get("image_name", "none"))


# ======================================================================
# Device-side batched views
# ======================================================================
class CameraViewsBatch(NamedTuple):
    """SoA batch of pinhole views for kernels.

    kvec: [..., 4] (fx, fy, cx, cy); qvec: [..., 4]; tvec: [..., 3].
    """

    kvec: jnp.ndarray
    qvec: jnp.ndarray
    tvec: jnp.ndarray

    @classmethod
    def from_views(cls, views) -> "CameraViewsBatch":
        kv = np.stack([v.cam.kvec() for v in views]).astype(np.float32)
        qv = np.stack([v.pose.qvec for v in views]).astype(np.float32)
        tv = np.stack([v.pose.tvec for v in views]).astype(np.float32)
        return cls(jnp.asarray(kv), jnp.asarray(qv), jnp.asarray(tv))

    def select(self, idx) -> "CameraViewsBatch":
        return CameraViewsBatch(self.kvec[idx], self.qvec[idx], self.tvec[idx])

    # ---- batched geometry ----
    def R(self) -> jnp.ndarray:
        return quat_to_rotmat(self.qvec)

    def K(self) -> jnp.ndarray:
        fx, fy, cx, cy = (self.kvec[..., 0], self.kvec[..., 1],
                          self.kvec[..., 2], self.kvec[..., 3])
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        K = jnp.stack([fx, z, cx, z, fy, cy, z, z, o], axis=-1)
        return K.reshape(K.shape[:-1] + (3, 3))

    def center(self) -> jnp.ndarray:
        # -R^T t via the conjugate quaternion: forming batched 3x3
        # rotation matrices makes XLA pad tiny dot_generals onto the MXU
        qc = quat_normalize(self.qvec
                            * jnp.asarray([1.0, -1, -1, -1],
                                          self.qvec.dtype))
        return quat_rotate(qc, -self.tvec)

    def projdepth(self, p3d: jnp.ndarray) -> jnp.ndarray:
        return (quat_rotate(self.qvec, p3d) + self.tvec)[..., 2]

    def project(self, p3d: jnp.ndarray) -> jnp.ndarray:
        """World point [..., 3] -> pixel [..., 2]."""
        pc = quat_rotate(self.qvec, p3d) + self.tvec
        u = pc[..., 0] / (pc[..., 2] + EPS)
        v = pc[..., 1] / (pc[..., 2] + EPS)
        x = self.kvec[..., 0] * u + self.kvec[..., 2]
        y = self.kvec[..., 1] * v + self.kvec[..., 3]
        return jnp.stack([x, y], axis=-1)

    def ray_direction(self, p2d: jnp.ndarray) -> jnp.ndarray:
        """Unit world-space ray through pixel [..., 2]
        (camera_view.cc:67-69)."""
        u = (p2d[..., 0] - self.kvec[..., 2]) / self.kvec[..., 0]
        v = (p2d[..., 1] - self.kvec[..., 3]) / self.kvec[..., 1]
        d_cam = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)
        # world dir = R^T d_cam = rotate by conjugate quaternion
        qc = self.qvec * jnp.asarray([1.0, -1, -1, -1], self.qvec.dtype)
        d = quat_rotate(quat_normalize(qc), d_cam)
        return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + EPS)

    def uncertainty(self, depth: jnp.ndarray,
                    var2d: float = 5.0) -> jnp.ndarray:
        f = 0.5 * (self.kvec[..., 0] + self.kvec[..., 1])
        return var2d * depth / f
