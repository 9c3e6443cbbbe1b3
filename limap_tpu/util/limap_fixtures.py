"""Loader for pickled LIMAP reference fixtures.

The reference ships real 7Scenes-Stairs localization fixtures
(reference runners/tests/data/localization/*.npy) whose payloads pickle
pybind11 objects from ``_limap._base`` (Line2d/Line3d via as_array,
Camera/CameraPose via as_dict — see reference base/bindings.cc:149-886).
This module registers lightweight stand-in classes under those module
names so the fixtures can be unpickled without the reference's C++
extension, and converts them to limap_tpu types.
"""

from __future__ import annotations

import sys
import types

import numpy as np


class _StubLine2d:
    """State = (2, 2) array stacking [start; end] (bindings.cc:149-155)."""

    def __setstate__(self, arr):
        arr = np.asarray(arr, np.float64)
        self.start = arr[0]
        self.end = arr[1]
        self.score = -1.0

    def as_array(self):
        return np.stack([self.start, self.end])


class _StubLine3d:
    """State = (2, 3) array stacking [start; end] (bindings.cc:213-219)."""

    def __setstate__(self, arr):
        arr = np.asarray(arr, np.float64)
        self.start = arr[0]
        self.end = arr[1]

    def as_array(self):
        return np.stack([self.start, self.end])


class _StubCamera:
    """State = dict(model_id, params, cam_id, height, width, initialized)
    (camera.cc:265-275)."""

    def __setstate__(self, d):
        self.model_id = int(d["model_id"])
        self.params = np.asarray(d["params"], np.float64)
        self.cam_id = int(d.get("cam_id", -1))
        self.height = int(d.get("height", -1))
        self.width = int(d.get("width", -1))


class _StubCameraPose:
    """State = dict(qvec, tvec, initialized) (camera.cc:288-293)."""

    def __setstate__(self, d):
        self.qvec = np.asarray(d["qvec"], np.float64)
        self.tvec = np.asarray(d["tvec"], np.float64)
        self.initialized = bool(d.get("initialized", True))

    def R(self):
        w, x, y, z = self.qvec / np.linalg.norm(self.qvec)
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])


_STUBS = {
    "Line2d": _StubLine2d,
    "Line3d": _StubLine3d,
    "Camera": _StubCamera,
    "CameraPose": _StubCameraPose,
}


def register_limap_stub_modules():
    """Install fake ``_limap`` / ``_limap._base`` modules for unpickling."""
    if "_limap._base" in sys.modules:
        return
    root = types.ModuleType("_limap")
    base = types.ModuleType("_limap._base")
    for name, cls in _STUBS.items():
        setattr(base, name, cls)
    root._base = base
    sys.modules["_limap"] = root
    sys.modules["_limap._base"] = base


def load_localization_fixture(path):
    """Load a reference localization fixture into plain numpy arrays.

    Returns a dict with keys: cfg, l3ds [T,2,3], l2ds [N,2,2],
    l3d_ids [N], p3ds [M,3], p2ds [M,2], camera (limap_tpu Camera),
    pose_gt / pose_point (limap_tpu CameraPose), image (H,W,3 uint8).
    """
    from limap_tpu.base.camera import Camera, CameraPose

    register_limap_stub_modules()
    data = np.load(path, allow_pickle=True).item()

    cam = data["camera"]
    camera = Camera(model=cam.model_id, params=cam.params,
                    cam_id=cam.cam_id, hw=(cam.height, cam.width))

    def _pose(p):
        return CameraPose(qvec=p.qvec, tvec=p.tvec)

    return {
        "cfg": data["cfg"],
        "l3ds": np.stack([l.as_array() for l in data["l3ds"]])
        if len(data["l3ds"]) else np.zeros((0, 2, 3)),
        "l2ds": np.stack([l.as_array() for l in data["l2ds"]])
        if len(data["l2ds"]) else np.zeros((0, 2, 2)),
        "l3d_ids": np.asarray(data["l3d_ids"], np.int64),
        "p3ds": np.asarray(data["p3ds"], np.float64).reshape(-1, 3),
        "p2ds": np.asarray(data["p2ds"], np.float64).reshape(-1, 2),
        "camera": camera,
        "pose_gt": _pose(data["pose_gt"]),
        "pose_point": _pose(data["pose_point"]),
        "image": np.asarray(data["image"]),
    }
