"""TP-LSD-style detector: tri-points line representation.

Counterpart of /root/reference/src/limap/line2d/TP_LSD/tp_lsd.py, whose
network lives in the external ``tp_lsd`` package (Huang et al.,
"TP-LSD: Tri-Points Based Line Segment Detector", ECCV 2020).  The
tri-points representation predicts, per pixel, a line-center
probability plus two displacement vectors to the endpoints; detection
is center NMS + displacement readout — a purely batched pipeline with
no region growing, which is why it maps so well to TPU:

- JAX net: shared encoder (1/4 resolution) -> center head (sigmoid
  1ch, upsampled) + displacement head (4ch);
- detection: jitted top-K center NMS (max-pool equality), segments
  assembled from the displacement field in one gather;
- strict checkpoint loader keyed to THIS MODULE'S OWN spec
  (``key_map`` adaptable).

Faithful pieces (checkable against the reference tree): the head
semantics match the published head dict {"center": 1, "dis": 4,
"line": 1} (tp_lsd.py:22) and :func:`preprocess_tplsd` ports the exact
HSV value-channel flattening the reference applies before inference
(tp_lsd.py:57-74).  NOT checkpoint-compatible with the published
Res512.pth weights: the upstream Res320 trunk lives only in the
external ``tp_lsd`` pip package (absent in-env and not vendored by the
reference), so its state_dict layout has no verifiable in-env source —
the strict loader is keyed to THIS MODULE'S OWN trunk and fails loudly
on mismatch (``key_map`` adapts alternative layouts).  See README
"Front-end model zoo: parity status".
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.line2d.base import BaseDetector, register_detector
from limap_tpu.line2d.sold2.nets import conv, relu


def _spec():
    spec = []

    def add(name, o, i, k):
        spec.append((name + ".weight", (o, i, k, k)))
        spec.append((name + ".bias", (o,)))

    add("backbone.conv1a", 64, 1, 3)
    add("backbone.conv1b", 64, 64, 3)
    add("backbone.conv2a", 128, 64, 3)
    add("backbone.conv2b", 128, 128, 3)
    add("backbone.conv3a", 256, 128, 3)
    add("backbone.conv3b", 256, 256, 3)
    add("center_head.conv0", 128, 256, 3)
    add("center_head.conv1", 1, 128, 1)
    add("disp_head.conv0", 128, 256, 3)
    add("disp_head.conv1", 4, 128, 1)
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
        raise ValueError("checkpoint does not match the TP-LSD spec:\n"
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


def tplsd_forward(p: Dict, image: jnp.ndarray):
    """image [B, H, W, 1] -> center prob [B, H, W],
    displacements [B, H, W, 4] ((dx1, dy1, dx2, dy2) at full res)."""
    x = relu(conv(p, "backbone.conv1a", image))
    x = relu(conv(p, "backbone.conv1b", x))
    x = _pool(x)
    x = relu(conv(p, "backbone.conv2a", x))
    x = relu(conv(p, "backbone.conv2b", x))
    x = _pool(x)
    x = relu(conv(p, "backbone.conv3a", x))
    feat = relu(conv(p, "backbone.conv3b", x))          # 1/4 res
    c = conv(p, "center_head.conv1",
             relu(conv(p, "center_head.conv0", feat)), padding="VALID")
    d = conv(p, "disp_head.conv1",
             relu(conv(p, "disp_head.conv0", feat)), padding="VALID")
    B, Hc, Wc, _ = c.shape
    center = jax.nn.sigmoid(jax.image.resize(
        c, (B, Hc * 4, Wc * 4, 1), "bilinear"))[..., 0]
    disp = jax.image.resize(d, (B, Hc * 4, Wc * 4, 4), "bilinear") * 4.0
    return center, disp


@partial(jax.jit, static_argnums=(2,))
def tplsd_decode(center: jnp.ndarray, disp: jnp.ndarray, max_segs: int,
                 score_thresh: float = 0.25, nms_radius: int = 4):
    """Center NMS + displacement readout -> segs [max_segs, 5], count."""
    H, W = center.shape
    pooled = jax.lax.reduce_window(
        center, -jnp.inf, jax.lax.max,
        (2 * nms_radius + 1, 2 * nms_radius + 1), (1, 1), "SAME")
    is_peak = (center == pooled) & (center > score_thresh)
    score = jnp.where(is_peak, center, 0.0).reshape(-1)
    top_s, top_i = jax.lax.top_k(score, max_segs)
    ys = (top_i // W).astype(jnp.float32)
    xs = (top_i % W).astype(jnp.float32)
    d = disp.reshape(-1, 4)[top_i]
    segs = jnp.stack([xs + d[:, 0], ys + d[:, 1],
                      xs + d[:, 2], ys + d[:, 3], top_s], axis=1)
    count = jnp.sum(top_s > 0)
    return segs, count


def preprocess_tplsd(img: np.ndarray) -> np.ndarray:
    """The reference's exact TP-LSD input normalization
    (/root/reference/src/limap/line2d/TP_LSD/tp_lsd.py:57-74): flatten
    the HSV value channel by subtracting a heavily blurred quarter-res
    copy, re-center at 127.5.  img: [H, W, 3] RGB uint8 -> [H, W, 3]
    float32 in [0, 1] (BGR order, as fed to the published net)."""
    import cv2
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    imgv0 = hsv[..., 2]
    H, W = imgv0.shape
    imgv = cv2.resize(imgv0, (0, 0), fx=0.25, fy=0.25,
                      interpolation=cv2.INTER_LINEAR)
    imgv = cv2.GaussianBlur(imgv, (5, 5), 3)
    imgv = cv2.resize(imgv, (W, H), interpolation=cv2.INTER_LINEAR)
    imgv = cv2.GaussianBlur(imgv, (5, 5), 3)
    imgv1 = imgv0.astype(np.float32) - imgv + 127.5
    hsv[..., 2] = np.clip(imgv1, 0, 255).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR).astype(np.float32) / 255.0


@register_detector("tp_lsd")
class TPLSDDetector(BaseDetector):
    def __init__(self, options: Optional[dict] = None):
        super().__init__(options)
        options = options or {}
        self.params = None
        if self.weight_path is not None:
            import os

            ckpt = self.weight_path
            if os.path.isdir(ckpt):
                ckpt = os.path.join(ckpt, "line2d", "TP_LSD",
                                    "tp_lsd.pth")
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
        self.max_segs = options.get("max_segs", 512)
        self.score_thresh = options.get("score_thresh", 0.25)
        self._forward = jax.jit(tplsd_forward)

    def get_module_name(self):
        return "tp_lsd"

    def detect(self, camview) -> np.ndarray:
        img = np.asarray(camview.read_image(set_gray=False))
        if img.ndim == 3 and img.shape[-1] == 3 \
                and img.dtype == np.uint8:
            # published preprocessing, then luminance for the 1-ch net
            img = preprocess_tplsd(img).mean(-1)
        else:
            img = np.asarray(img, np.float32)
            if img.ndim == 3:
                img = img.mean(-1)
            if img.max() > 1.5:
                img = img / 255.0
        H, W = img.shape
        Hp, Wp = -(-H // 4) * 4, -(-W // 4) * 4
        buf = np.zeros((1, Hp, Wp, 1), np.float32)
        buf[0, :H, :W, 0] = img
        center, disp = self._forward(self.params, jnp.asarray(buf))
        segs, count = tplsd_decode(center[0, :H, :W],
                                   disp[0, :H, :W], self.max_segs,
                                   self.score_thresh)
        return np.asarray(segs)[:int(count)]
