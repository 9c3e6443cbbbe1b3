"""SuperPoint keypoint detector/descriptor in JAX/Flax.

Functional re-implementation of the architecture the reference vendors
at /root/reference/src/limap/point2d/superpoint/superpoint.py (VGG-style
encoder + 65-channel detector head + 256-d descriptor head with bicubic
descriptor sampling).  Weights load from the standard
``superpoint_v1.pth`` torch checkpoint when a path is supplied (zero
network egress in this environment, so nothing is downloaded); without
weights the module still runs (random init) and the classical
:class:`HarrisPatchExtractor` below provides a learned-free default.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
    _HAS_FLAX = True
except ImportError:  # pragma: no cover
    _HAS_FLAX = False


if _HAS_FLAX:
    class SuperPointNet(nn.Module):
        """conv layout of the magicleap SuperPoint."""

        @nn.compact
        def __call__(self, x):  # x: [B, H, W, 1]
            def block(x, c, name):
                x = nn.Conv(c, (3, 3), padding=1, name=f"{name}a")(x)
                x = nn.relu(x)
                x = nn.Conv(c, (3, 3), padding=1, name=f"{name}b")(x)
                return nn.relu(x)

            x = block(x, 64, "conv1")
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = block(x, 64, "conv2")
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = block(x, 128, "conv3")
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = block(x, 128, "conv4")

            # detector head: 65 = 8x8 cells + dustbin
            cPa = nn.relu(nn.Conv(256, (3, 3), padding=1, name="convPa")(x))
            semi = nn.Conv(65, (1, 1), name="convPb")(cPa)
            # descriptor head
            cDa = nn.relu(nn.Conv(256, (3, 3), padding=1, name="convDa")(x))
            desc = nn.Conv(256, (1, 1), name="convDb")(cDa)
            desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True)
                           + 1e-8)
            return semi, desc


def load_torch_weights(params: dict, pth_path: str) -> dict:
    """Map a superpoint_v1.pth state dict into the Flax params tree."""
    import torch
    sd = torch.load(pth_path, map_location="cpu")
    name_map = {
        "conv1a": "conv1a", "conv1b": "conv1b", "conv2a": "conv2a",
        "conv2b": "conv2b", "conv3a": "conv3a", "conv3b": "conv3b",
        "conv4a": "conv4a", "conv4b": "conv4b", "convPa": "convPa",
        "convPb": "convPb", "convDa": "convDa", "convDb": "convDb",
    }
    new = {"params": {}}
    for tname, fname in name_map.items():
        w = sd[f"{tname}.weight"].numpy()  # [out, in, kh, kw]
        b = sd[f"{tname}.bias"].numpy()
        new["params"][fname] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": b,
        }
    return new


def simple_nms(scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Fast NMS via max-pool comparison."""
    from jax import lax
    k = 2 * radius + 1
    pooled = lax.reduce_window(scores, -jnp.inf, lax.max, (1, k, k),
                               (1, 1, 1), "SAME")
    return jnp.where(scores == pooled, scores, 0.0)


def sample_descriptors(desc_map: jnp.ndarray, keypoints: jnp.ndarray,
                       stride: int = 8) -> jnp.ndarray:
    """Bilinear descriptor sampling at pixel keypoints [N, 2] (xy)."""
    Hc, Wc, D = desc_map.shape
    x = keypoints[:, 0] / stride - 0.5
    y = keypoints[:, 1] / stride - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, Wc - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, Hc - 2)
    fx = jnp.clip(x - x0, 0, 1)[:, None]
    fy = jnp.clip(y - y0, 0, 1)[:, None]
    d = (desc_map[y0, x0] * (1 - fx) * (1 - fy)
         + desc_map[y0, x0 + 1] * fx * (1 - fy)
         + desc_map[y0 + 1, x0] * (1 - fx) * fy
         + desc_map[y0 + 1, x0 + 1] * fx * fy)
    return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)


class SuperPoint:
    """Host wrapper: detect + describe with optional torch weights."""

    def __init__(self, weight_path: Optional[str] = None,
                 nms_radius: int = 4, keypoint_threshold: float = 0.005,
                 max_keypoints: int = 2048):
        if not _HAS_FLAX:
            raise ImportError("flax is required for SuperPoint")
        self.net = SuperPointNet()
        self.params = self.net.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 1)))
        if weight_path:
            self.params = load_torch_weights(self.params, weight_path)
        self.nms_radius = nms_radius
        self.keypoint_threshold = keypoint_threshold
        self.max_keypoints = max_keypoints

    def __call__(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        img = np.asarray(image, np.float32)
        if img.ndim == 3:
            img = img.mean(-1)
        if img.max() > 1.5:
            img = img / 255.0
        H, W = img.shape
        H8, W8 = (H // 8) * 8, (W // 8) * 8
        x = jnp.asarray(img[:H8, :W8])[None, :, :, None]
        semi, desc = self.net.apply(self.params, x)
        semi = semi[0]
        # cell softmax, drop dustbin, unfold to full resolution
        prob = jax.nn.softmax(semi, axis=-1)[..., :64]
        Hc, Wc = prob.shape[:2]
        heat = prob.reshape(Hc, Wc, 8, 8).transpose(0, 2, 1, 3).reshape(
            Hc * 8, Wc * 8)
        heat = simple_nms(heat[None], self.nms_radius)[0]
        heat_np = np.asarray(heat)
        ys, xs = np.nonzero(heat_np > self.keypoint_threshold)
        scores = heat_np[ys, xs]
        order = np.argsort(-scores)[:self.max_keypoints]
        kps = np.stack([xs[order], ys[order]], axis=1).astype(np.float32)
        d = np.asarray(sample_descriptors(desc[0], jnp.asarray(kps)))
        return {"keypoints": kps, "scores": scores[order],
                "descriptors": d}

    def dense(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        """Dense outputs (compute_dense_descriptor_and_score in the
        reference, superpoint.py:243-272): the full-resolution score
        map (cell softmax, dustbin dropped, unfolded) and the
        L2-normalized descriptor grid at 1/8 resolution."""
        img = np.asarray(image, np.float32)
        if img.ndim == 3:
            img = img.mean(-1)
        if img.max() > 1.5:
            img = img / 255.0
        H, W = img.shape
        H8, W8 = (H // 8) * 8, (W // 8) * 8
        x = jnp.asarray(img[:H8, :W8])[None, :, :, None]
        semi, desc = self.net.apply(self.params, x)
        prob = jax.nn.softmax(semi[0], axis=-1)[..., :64]
        Hc, Wc = prob.shape[:2]
        heat = prob.reshape(Hc, Wc, 8, 8).transpose(0, 2, 1, 3).reshape(
            Hc * 8, Wc * 8)
        # the Flax net already L2-normalizes desc over channels
        return {"dense_score": np.asarray(heat),
                "dense_descriptor": np.asarray(desc[0])}


class HarrisPatchExtractor:
    """Learned-free keypoints + patch descriptors (works without any
    checkpoint; the default point front-end in this environment)."""

    def __init__(self, max_keypoints: int = 2048, block: int = 9):
        self.max_keypoints = max_keypoints
        self.block = block

    def __call__(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        import cv2
        img = np.asarray(image)
        if img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        img32 = img.astype(np.float32)
        corners = cv2.goodFeaturesToTrack(
            img32, self.max_keypoints, 0.01, 5)
        if corners is None:
            return {"keypoints": np.zeros((0, 2), np.float32),
                    "scores": np.zeros(0),
                    "descriptors": np.zeros((0, 64))}
        kps = corners.reshape(-1, 2)
        half = self.block // 2
        pad = np.pad(img32, half, mode="edge")
        descs = []
        for x, y in kps:
            xi, yi = int(round(x)), int(round(y))
            patch = pad[yi:yi + self.block, xi:xi + self.block]
            # downsample 9x9 -> 8x8-ish flatten, normalize
            v = cv2.resize(patch, (8, 8)).reshape(-1)
            v = v - v.mean()
            descs.append(v / (np.linalg.norm(v) + 1e-8))
        return {"keypoints": kps.astype(np.float32),
                "scores": np.ones(len(kps)),
                "descriptors": np.stack(descs)}
