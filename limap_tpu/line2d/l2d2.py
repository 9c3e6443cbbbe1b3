"""L2D2 line descriptor (patch CNN) + mutual-NN matcher.

Counterpart of /root/reference/src/limap/line2d/L2D2/
{RAL_net_cov.py, extractor.py, matcher.py}.  The descriptor network
(L2Net variant: 7 conv blocks with affine-free BatchNorm, input
instance-normalization, final (12, 8) conv collapsing a 48x32 patch to
a 128-d L2-normalized vector) runs as a pure-JAX NHWC forward over a
torch-keyed parameter dict, so the published ``L2D2.pth`` checkpoint is
a relayout away; patches are cut with the reference's exact affine
(rotate the line horizontal, crop length x length*2/3, resize 48x32,
extractor.py:72-118) and the whole patch batch runs through ONE jitted
forward per image.  Parity with the in-tree torch net is tested in
tests/test_l2d2.py.  Without weights (zero-egress env) the network runs
with seeded orthogonal init — enough for pipeline smoke tests.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.line2d.base import (BaseDetector, BaseMatcher,
                                   register_extractor, register_matcher)

BN_EPS = 1e-5
PATCH_MEAN = 0.492967568115862   # extractor.py:141
PATCH_STD = 0.272086182765434

# (conv torch key index inside `features`, out_ch, in_ch, (kh, kw),
#  stride, padding); BN (affine-free) follows each conv at index + 1
_CONVS = [
    (0, 32, 1, (3, 3), 1, ((1, 1), (1, 1))),
    (3, 32, 32, (3, 3), 1, ((1, 1), (1, 1))),
    (6, 64, 32, (4, 3), 2, ((1, 1), (1, 1))),
    (9, 64, 64, (3, 3), 1, ((1, 1), (1, 1))),
    (12, 128, 64, (4, 3), 2, ((1, 1), (1, 1))),
    (15, 128, 128, (3, 3), 1, ((1, 1), (1, 1))),
    (19, 128, 128, (12, 8), 1, ((0, 0), (0, 0))),
]


def _spec():
    spec = []
    for (i, o, c, (kh, kw), _, _) in _CONVS:
        spec.append((f"features.{i}.weight", (o, c, kh, kw)))
        spec.append((f"features.{i + 1}.running_mean", (o,)))
        spec.append((f"features.{i + 1}.running_var", (o,)))
    return spec


def load_torch_state_dict(sd) -> Dict[str, jnp.ndarray]:
    params = {}
    for key, shape in _spec():
        if key not in sd:
            raise KeyError(f"missing checkpoint entry {key}")
        v = np.asarray(sd[key], np.float32)
        if tuple(v.shape) != tuple(shape):
            raise ValueError(f"{key}: {v.shape} != {shape}")
        if v.ndim == 4:
            v = np.transpose(v, (2, 3, 1, 0))
        params[key] = jnp.asarray(v)
    return params


def init_params(seed: int = 0) -> Dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    params = {}
    for key, shape in _spec():
        if key.endswith(".running_mean"):
            v = np.zeros(shape, np.float32)
        elif key.endswith(".running_var"):
            v = np.ones(shape, np.float32)
        else:
            o = shape[0]
            flat = rng.normal(size=(o, int(np.prod(shape[1:]))))
            if flat.shape[0] <= flat.shape[1]:
                q, _ = np.linalg.qr(flat.T)
                q = q.T
            else:
                q, _ = np.linalg.qr(flat)
            v = (0.6 * q.reshape(shape)).astype(np.float32)
            v = np.transpose(v, (2, 3, 1, 0))
        params[key] = jnp.asarray(v)
    return params


def l2d2_forward(p: Dict, patches: jnp.ndarray) -> jnp.ndarray:
    """patches [B, 48, 32, 1] (already mean/std normalized) -> [B, 128]
    L2-normalized descriptors (RAL_net_cov.py:17-64)."""
    x = patches
    # input instance-normalization (input_norm)
    flat = x.reshape(x.shape[0], -1)
    mp = jnp.mean(flat, axis=1)[:, None, None, None]
    sp = jnp.std(flat, axis=1, ddof=1)[:, None, None, None] + 1e-7
    x = (x - mp) / sp
    for (i, _, _, _, stride, pad) in _CONVS:
        w = p[f"features.{i}.weight"]
        x = jax.lax.conv_general_dilated(
            x, w, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        mean = p[f"features.{i + 1}.running_mean"]
        var = p[f"features.{i + 1}.running_var"]
        x = (x - mean) * jax.lax.rsqrt(var + BN_EPS)
        if i != 19:
            x = jnp.maximum(x, 0.0)
    d = x.reshape(x.shape[0], -1)
    return d / jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True) + 1e-10)


def get_patch(img: np.ndarray, line: np.ndarray) -> np.ndarray:
    """48x32 line-aligned patch (extractor.py:72-118, exact affine)."""
    import cv2

    h, w = img.shape
    line = np.asarray(line, np.float64)
    if line[1, 1] < line[0, 1]:
        line = line[[1, 0]]
    angle = np.arctan2(line[1, 0] - line[0, 0], line[1, 1] - line[0, 1])
    midpoint = line.mean(axis=0)
    T1 = np.array([[1.0, 0, -midpoint[0]], [0, 1, -midpoint[1]],
                   [0, 0, 1]])
    TR = np.array([[np.cos(angle), -np.sin(angle), 0],
                   [np.sin(angle), np.cos(angle), 0], [0, 0, 1]])
    T2 = np.array([[1.0, 0, w // 2], [0, 1, h // 2], [0, 0, 1]])
    A = T2 @ TR @ T1
    patch = cv2.warpAffine(img, A[:2], (w, h))
    length = np.linalg.norm(line[0] - line[1])
    new_h = max(int(np.round(length)), 5)
    new_w = new_h * 32 // 48
    patch = patch[h // 2 - new_h // 2:h // 2 + new_h // 2,
                  w // 2 - new_w // 2:w // 2 + new_w // 2]
    return cv2.resize(patch, (32, 48))


@register_extractor("l2d2")
class L2D2Extractor(BaseDetector):
    def __init__(self, options: Optional[dict] = None):
        super().__init__(options)
        options = options or {}
        self.params = None
        if self.weight_path is not None:
            ckpt = self.weight_path
            if os.path.isdir(ckpt):
                ckpt = os.path.join(ckpt, "line2d", "L2D2",
                                    "checkpoint_line_descriptor.th")
            if os.path.isfile(ckpt):
                import torch

                sd = torch.load(ckpt, map_location="cpu",
                                weights_only=False)
                if hasattr(sd, "state_dict"):
                    sd = sd.state_dict()
                self.params = load_torch_state_dict(
                    {k: v.numpy() for k, v in sd.items()})
        if self.params is None:
            self.params = init_params(options.get("seed", 0))
        self._forward = jax.jit(l2d2_forward)

    def get_module_name(self):
        return "l2d2"

    def extract(self, camview, segs) -> dict:
        img = np.asarray(camview.read_image(set_gray=True), np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        segs = np.asarray(segs)
        if len(segs) == 0:
            return {"line_descriptors": np.zeros((0, 128), np.float32)}
        patches = np.stack([
            get_patch(img, s[:4].reshape(2, 2)) for s in segs])
        patches = (patches - PATCH_MEAN) / PATCH_STD
        desc = self._forward(self.params,
                             jnp.asarray(patches[..., None],
                                         jnp.float32))
        return {"line_descriptors": np.asarray(desc)}


@register_matcher("l2d2")
class L2D2Matcher(BaseMatcher):
    def __init__(self, extractor, options: Optional[dict] = None):
        super().__init__(extractor, options)
        assert extractor.get_module_name() == "l2d2"

    def get_module_name(self):
        return "l2d2"

    def match_pair(self, descinfo1, descinfo2):
        d1 = np.asarray(descinfo1["line_descriptors"])
        d2 = np.asarray(descinfo2["line_descriptors"])
        if len(d1) == 0 or len(d2) == 0:
            return np.zeros((0, 2), int)
        score = d1 @ d2.T
        if self.topk == 0:
            n1 = np.argmax(score, axis=1)
            n2 = np.argmax(score, axis=0)
            mutual = n2[n1] == np.arange(len(d1))
            ids1 = np.nonzero(mutual)[0]
            return np.stack([ids1, n1[ids1]], axis=1)
        k = min(self.topk, score.shape[1])
        topk = np.argsort(-score, axis=1)[:, :k]
        out = [np.stack([np.arange(len(d1)), topk[:, i]], axis=1)
               for i in range(k)]
        return np.concatenate(out, axis=0)
