"""HAWPv3-style detector: junctions + holistic attraction field.

Counterpart of /root/reference/src/limap/line2d/HAWPv3/hawp.py, whose
network lives in the external ``hawp`` package (Xue et al., "Holistic
Attraction Field Representation for Structural Line Segment Detection";
v3 = self-supervised variant).  As with DeepLSD/GlueStick, the package
and checkpoint are unavailable here, so this module provides the
representation with shared TPU-native machinery:

- a JAX net (SOLD2-style shared encoder) predicting a 65-channel
  junction cell map and a 4-channel holistic attraction field (signed
  distance + orientation encoding of the nearest line);
- detection: junction NMS (shared junctions_from_predictions) and the
  candidate-pair verifier of the SOLD2 detection module run on the
  attraction-distance heatmap exp(-|d|) — junction-pair proposals
  verified by field support is exactly HAWP's proposal+verification
  scheme expressed through batched kernels;
- a strict checkpoint loader keyed to THIS MODULE'S OWN spec
  (adaptable via ``key_map``).

NOT checkpoint-compatible with the published HAWPv3 weights: the
upstream network lives in the external ``hawp`` pip package (absent
in-env and not vendored by the reference), so no verifiable parity
target exists.  This is a HAWP-style (representation-inspired)
detector — see README "Front-end model zoo: parity status".
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.line2d.base import BaseDetector, register_detector
from limap_tpu.line2d.sold2.detection import (LineSegmentDetector,
                                              junctions_from_predictions)
from limap_tpu.line2d.sold2.nets import conv, relu


def _spec():
    spec = []

    def add(name, o, i, k, bias=True):
        spec.append((name + ".weight", (o, i, k, k)))
        if bias:
            spec.append((name + ".bias", (o,)))

    # shared encoder (4 blocks, stride 2 at blocks 2-3 -> 1/4 res)
    add("backbone.conv1a", 64, 1, 3)
    add("backbone.conv1b", 64, 64, 3)
    add("backbone.conv2a", 64, 64, 3)
    add("backbone.conv2b", 64, 64, 3)
    add("backbone.conv3a", 128, 64, 3)
    add("backbone.conv3b", 128, 128, 3)
    add("backbone.conv4a", 128, 128, 3)
    add("backbone.conv4b", 128, 128, 3)
    # junction head (65ch at 1/8)
    add("junc_head.convPa", 256, 128, 3)
    add("junc_head.convPb", 65, 256, 1)
    # attraction field head (4ch at 1/4 -> upsampled)
    add("hat_head.conv0", 128, 128, 3)
    add("hat_head.conv1", 4, 128, 1)
    return spec


def load_torch_state_dict(sd, key_map: Optional[Dict[str, str]] = None):
    if key_map:
        sd = {key_map.get(k, k): v for k, v in sd.items()}
    params = {}
    problems = []
    for key, shape in _spec():
        if key not in sd:
            problems.append(f"missing {key} {shape}")
            continue
        v = np.asarray(sd[key], np.float32)
        if tuple(v.shape) != tuple(shape):
            problems.append(f"{key}: got {tuple(v.shape)}, want {shape}")
            continue
        if v.ndim == 4:
            v = np.transpose(v, (2, 3, 1, 0))
        params[key] = jnp.asarray(v)
    if problems:
        raise ValueError("checkpoint does not match the HAWPv3 spec:\n"
                         + "\n".join(problems))
    return params


def init_params(seed: int = 0):
    rng = np.random.default_rng(seed)
    params = {}
    for key, shape in _spec():
        if key.endswith(".bias"):
            v = np.zeros(shape, np.float32)
        else:
            fan_in = int(np.prod(shape[1:]))
            v = rng.normal(0, (2.0 / fan_in) ** 0.5,
                           shape).astype(np.float32)
            v = np.transpose(v, (2, 3, 1, 0))
        params[key] = jnp.asarray(v)
    return params


def _pool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def hawp_forward(p: Dict, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """image [B, H, W, 1] -> junction logits [B, H/8, W/8, 65],
    attraction field [B, H, W, 4] (ch0 = unsigned distance)."""
    x = relu(conv(p, "backbone.conv1a", image))
    x = relu(conv(p, "backbone.conv1b", x))
    x = _pool(x)
    x = relu(conv(p, "backbone.conv2a", x))
    x = relu(conv(p, "backbone.conv2b", x))
    x = _pool(x)
    x = relu(conv(p, "backbone.conv3a", x))
    x = relu(conv(p, "backbone.conv3b", x))
    feat4 = relu(conv(p, "backbone.conv4b",
                      relu(conv(p, "backbone.conv4a", x))))  # 1/4
    jx = _pool(feat4)
    jx = relu(conv(p, "junc_head.convPa", jx))
    junc = conv(p, "junc_head.convPb", jx, padding="VALID")
    hat = conv(p, "hat_head.conv1",
               relu(conv(p, "hat_head.conv0", feat4)), padding="VALID")
    hat = jnp.abs(hat)
    B, Hc, Wc, C = hat.shape
    full = jax.image.resize(hat, (B, Hc * 4, Wc * 4, C), "bilinear")
    return {"junctions": junc, "hat": full}


@register_detector("hawpv3")
class HAWPv3Detector(BaseDetector):
    def __init__(self, options: Optional[dict] = None):
        super().__init__(options)
        options = options or {}
        self.params = None
        if self.weight_path is not None:
            import os

            ckpt = self.weight_path
            if os.path.isdir(ckpt):
                ckpt = os.path.join(ckpt, "line2d", "HAWPv3",
                                    "hawpv3-imagenet-03a84.pth")
            if os.path.isfile(ckpt):
                import torch

                blob = torch.load(ckpt, map_location="cpu",
                                  weights_only=False)
                sd = blob.get("model", blob)
                self.params = load_torch_state_dict(
                    {k: np.asarray(v) for k, v in sd.items()},
                    key_map=options.get("key_map"))
        if self.params is None:
            self.params = init_params(options.get("seed", 0))
        self._forward = jax.jit(hawp_forward)
        self.line_detector = LineSegmentDetector(
            detect_thresh=options.get("detect_thresh", 0.5),
            num_samples=32, inlier_thresh=0.8,
            use_heatmap_refinement=False,
            use_junction_refinement=False)

    def get_module_name(self):
        return "hawpv3"

    def detect(self, camview) -> np.ndarray:
        img = np.asarray(camview.read_image(set_gray=True), np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        H, W = img.shape
        Hp, Wp = -(-H // 8) * 8, -(-W // 8) * 8
        buf = np.zeros((1, Hp, Wp, 1), np.float32)
        buf[0, :H, :W, 0] = img
        out = self._forward(self.params, jnp.asarray(buf))
        juncs = junctions_from_predictions(np.asarray(out["junctions"]),
                                           grid_size=8, topk=300)
        dist = np.asarray(out["hat"])[0, :H, :W, 0]
        heatmap = np.exp(-dist)
        segs_hw = self.line_detector.detect(juncs, heatmap)
        segs = np.flip(segs_hw, axis=2).reshape(len(segs_hw), 4)
        lengths = np.linalg.norm(segs[:, 2:4] - segs[:, :2], axis=1)
        return np.concatenate([segs, lengths[:, None]], axis=1)
