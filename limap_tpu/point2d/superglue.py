"""SuperGlue attentional-GNN matcher, ported to JAX with exact torch
parity.

The reference vendors the full network in-tree
(/root/reference/src/limap/point2d/superglue/superglue.py:1-285):
keypoint MLP encoder, 18-layer self/cross attentional GNN, final
projection and a log-domain optimal-transport head with a learned
dustbin score.  This is a functional re-implementation: parameters are
a flat dict keyed by the published torch ``state_dict`` names (conv1d
kernels squeezed to ``[out, in]``), the forward is jitted once per
(N0, N1) shape, and the checkpoint loader is STRICT — it validates the
exact key set and shapes of the published ``superglue_indoor/outdoor``
checkpoints before accepting them.  Layer-level numeric parity against
the reference torch code is asserted in tests/test_superglue.py.

Layout convention: descriptors are ``[D, N]`` (channel-major, matching
torch's Conv1d), single pair (no batch dim).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

DESCRIPTOR_DIM = 256
KEYPOINT_ENCODER = [32, 64, 128, 256]
GNN_LAYERS = ["self", "cross"] * 9
SINKHORN_ITERATIONS = 100
MATCH_THRESHOLD = 0.2
_BN_EPS = 1e-5


# --------------------------------------------------------------- params
def _mlp_key_spec(prefix: str, channels: List[int]) -> Dict[str, tuple]:
    """state_dict keys + shapes of the reference ``MLP(channels)``
    (superglue.py:52-64): Conv1d(k=1) + BatchNorm1d + ReLU per hidden
    layer, bare Conv1d for the last."""
    spec = {}
    idx = 0
    n = len(channels)
    for i in range(1, n):
        spec[f"{prefix}.{idx}.weight"] = (channels[i], channels[i - 1], 1)
        spec[f"{prefix}.{idx}.bias"] = (channels[i],)
        idx += 1
        if i < n - 1:
            for suffix in ("weight", "bias", "running_mean", "running_var"):
                spec[f"{prefix}.{idx}.{suffix}"] = (channels[i],)
            idx += 2  # BatchNorm1d + ReLU
    return spec


def key_spec() -> Dict[str, tuple]:
    """Exact key → shape map of the published SuperGlue checkpoints
    (verifiable keys-only; no weights needed)."""
    d = DESCRIPTOR_DIM
    spec = {"bin_score": ()}
    spec.update(_mlp_key_spec("kenc.encoder", [3] + KEYPOINT_ENCODER + [d]))
    for li in range(len(GNN_LAYERS)):
        p = f"gnn.layers.{li}"
        spec[f"{p}.attn.merge.weight"] = (d, d, 1)
        spec[f"{p}.attn.merge.bias"] = (d,)
        for j in range(3):
            spec[f"{p}.attn.proj.{j}.weight"] = (d, d, 1)
            spec[f"{p}.attn.proj.{j}.bias"] = (d,)
        spec.update(_mlp_key_spec(f"{p}.mlp", [d * 2, d * 2, d]))
    spec["final_proj.weight"] = (d, d, 1)
    spec["final_proj.bias"] = (d,)
    return spec


def params_from_state_dict(sd) -> Dict[str, np.ndarray]:
    """Convert a torch ``state_dict`` (or a {name: ndarray} dict) into
    the params dict, STRICTLY validating keys and shapes against the
    published checkpoint spec."""
    arrays = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        arrays[k] = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v,
            np.float32)
    spec = key_spec()
    missing = sorted(set(spec) - set(arrays))
    unexpected = sorted(set(arrays) - set(spec))
    if missing or unexpected:
        raise ValueError(
            f"SuperGlue checkpoint key mismatch: missing={missing[:5]}"
            f"{'...' if len(missing) > 5 else ''}, "
            f"unexpected={unexpected[:5]}"
            f"{'...' if len(unexpected) > 5 else ''}")
    params = {}
    for k, shape in spec.items():
        a = arrays[k]
        if tuple(a.shape) != tuple(shape):
            raise ValueError(f"SuperGlue param {k}: shape {a.shape} != "
                             f"checkpoint spec {shape}")
        if k.endswith("weight") and a.ndim == 3:
            a = a[:, :, 0]  # Conv1d(k=1) -> dense [out, in]
        params[k] = a
    return params


def load_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch

    return params_from_state_dict(
        torch.load(path, map_location="cpu", weights_only=True))


def random_params(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random-init params with checkpoint-identical keys/shapes (for
    weight-free smoke runs in the zero-egress environment)."""
    rng = np.random.default_rng(seed)
    params = {}
    for k, shape in key_spec().items():
        if k.endswith("running_mean"):
            params[k] = np.zeros(shape, np.float32)
        elif k.endswith("running_var"):
            params[k] = np.ones(shape, np.float32)
        elif k == "bin_score":
            params[k] = np.asarray(1.0, np.float32)
        elif k.endswith("bias"):
            params[k] = np.zeros(shape, np.float32)
        else:
            a = rng.normal(size=shape).astype(np.float32)
            a *= 1.0 / np.sqrt(max(shape[-1] if len(shape) > 1 else 1, 1))
            params[k] = a[:, :, 0] if a.ndim == 3 else a
    return params


# -------------------------------------------------------------- forward
def _conv(p, prefix, x):
    return p[f"{prefix}.weight"] @ x + p[f"{prefix}.bias"][:, None]


def _mlp(p, prefix, channels, x):
    idx = 0
    n = len(channels)
    for i in range(1, n):
        x = _conv(p, f"{prefix}.{idx}", x)
        idx += 1
        if i < n - 1:
            g = p[f"{prefix}.{idx}.weight"][:, None]
            b = p[f"{prefix}.{idx}.bias"][:, None]
            m = p[f"{prefix}.{idx}.running_mean"][:, None]
            v = p[f"{prefix}.{idx}.running_var"][:, None]
            x = (x - m) * jax.lax.rsqrt(v + _BN_EPS) * g + b
            idx += 2
            x = jax.nn.relu(x)
    return x


def normalize_keypoints(kpts: jnp.ndarray, height, width) -> jnp.ndarray:
    """superglue.py:67-74 (image-size normalization)."""
    size = jnp.asarray([width, height], jnp.float32)
    center = size / 2
    scaling = jnp.max(size) * 0.7
    return (kpts - center[None, :]) / scaling


def _attention_layer(p, prefix, x, source):
    """AttentionalPropagation (superglue.py:124-132): 4-head attention
    message + MLP over [x ; message]."""
    d = x.shape[0]
    heads = 4
    dh = d // heads
    q = _conv(p, f"{prefix}.attn.proj.0", x).reshape(dh, heads, -1)
    k = _conv(p, f"{prefix}.attn.proj.1", source).reshape(dh, heads, -1)
    v = _conv(p, f"{prefix}.attn.proj.2", source).reshape(dh, heads, -1)
    scores = jnp.einsum("dhn,dhm->hnm", q, k) / dh ** 0.5
    prob = jax.nn.softmax(scores, axis=-1)
    msg = jnp.einsum("hnm,dhm->dhn", prob, v).reshape(d, -1)
    msg = _conv(p, f"{prefix}.attn.merge", msg)
    return _mlp(p, f"{prefix}.mlp", [d * 2, d * 2, d],
                jnp.concatenate([x, msg], axis=0))


def _forward_scores(params, kpts0, scores0, desc0, kpts1, scores1, desc1,
                    shape0, shape1):
    """Encoder + GNN + final projection -> raw score matrix [N0, N1]
    (superglue.py:244-278 before the OT head)."""
    kenc_channels = [3] + KEYPOINT_ENCODER + [DESCRIPTOR_DIM]
    kn0 = normalize_keypoints(kpts0, shape0[0], shape0[1])
    kn1 = normalize_keypoints(kpts1, shape1[0], shape1[1])
    inp0 = jnp.concatenate([kn0.T, scores0[None, :]], axis=0)
    inp1 = jnp.concatenate([kn1.T, scores1[None, :]], axis=0)
    desc0 = desc0 + _mlp(params, "kenc.encoder", kenc_channels, inp0)
    desc1 = desc1 + _mlp(params, "kenc.encoder", kenc_channels, inp1)
    for li, name in enumerate(GNN_LAYERS):
        src0, src1 = (desc1, desc0) if name == "cross" else (desc0, desc1)
        delta0 = _attention_layer(params, f"gnn.layers.{li}", desc0, src0)
        delta1 = _attention_layer(params, f"gnn.layers.{li}", desc1, src1)
        desc0 = desc0 + delta0
        desc1 = desc1 + delta1
    mdesc0 = _conv(params, "final_proj", desc0)
    mdesc1 = _conv(params, "final_proj", desc1)
    return jnp.einsum("dn,dm->nm", mdesc0, mdesc1) / DESCRIPTOR_DIM ** 0.5


_forward_scores_jit = jax.jit(_forward_scores)


def solve_optimal_transport(scores: jnp.ndarray, bin_score,
                            iters: int = SINKHORN_ITERATIONS):
    """Log-domain OT with dustbins (superglue.py:297-335)."""
    from limap_tpu.point2d.matching import log_sinkhorn

    return log_sinkhorn(scores, jnp.asarray(bin_score), iters)


def get_matches(Z: np.ndarray, match_threshold: float = MATCH_THRESHOLD):
    """Mutual-max + threshold match selection on the OT output
    (superglue.py:337-352).  Returns (m0, m1, mscores0, mscores1)."""
    Z = np.asarray(Z)
    inner = Z[:-1, :-1]
    m0 = inner.argmax(1)
    m1 = inner.argmax(0)
    max0 = inner.max(1)
    n0, n1 = inner.shape
    mutual0 = np.arange(n0) == m1[m0]
    mutual1 = np.arange(n1) == m0[m1]
    mscores0 = np.where(mutual0, np.exp(max0), 0.0)
    mscores1 = np.where(mutual1, mscores0[m1], 0.0)
    valid0 = mutual0 & (mscores0 > match_threshold)
    valid1 = mutual1 & valid0[m1]
    return (np.where(valid0, m0, -1), np.where(valid1, m1, -1),
            mscores0, mscores1)


class SuperGlue:
    """Pair matcher with the reference's forward contract
    (superglue.py:243-289).

    ``weight_path``: path to a published ``superglue_*.pth`` checkpoint
    (strictly validated); None -> random init (smoke/parity use only).
    """

    def __init__(self, weight_path: Optional[str] = None,
                 match_threshold: float = MATCH_THRESHOLD,
                 sinkhorn_iterations: int = SINKHORN_ITERATIONS):
        if weight_path is not None:
            self.params = {k: jnp.asarray(v) for k, v in
                           load_checkpoint(weight_path).items()}
        else:
            self.params = {k: jnp.asarray(v) for k, v in
                           random_params().items()}
        self.match_threshold = match_threshold
        self.sinkhorn_iterations = sinkhorn_iterations

    def scores(self, data: dict) -> jnp.ndarray:
        """Raw (pre-OT) descriptor score matrix [N0, N1]."""
        return _forward_scores_jit(
            self.params,
            jnp.asarray(data["keypoints0"], jnp.float32),
            jnp.asarray(data["scores0"], jnp.float32),
            jnp.asarray(data["descriptors0"], jnp.float32),
            jnp.asarray(data["keypoints1"], jnp.float32),
            jnp.asarray(data["scores1"], jnp.float32),
            jnp.asarray(data["descriptors1"], jnp.float32),
            jnp.asarray(data["image_shape0"], jnp.float32),
            jnp.asarray(data["image_shape1"], jnp.float32))

    def solve_optimal_transport(self, scores) -> jnp.ndarray:
        return solve_optimal_transport(scores, self.params["bin_score"],
                                       self.sinkhorn_iterations)

    def __call__(self, data: dict) -> dict:
        n0 = np.asarray(data["keypoints0"]).shape[0]
        n1 = np.asarray(data["keypoints1"]).shape[0]
        if n0 == 0 or n1 == 0:
            return {"matches0": np.full(n0, -1, np.int32),
                    "matches1": np.full(n1, -1, np.int32),
                    "matching_scores0": np.zeros(n0),
                    "matching_scores1": np.zeros(n1),
                    "scores": np.zeros((n0, n1))}
        raw = self.scores(data)
        Z = self.solve_optimal_transport(raw)
        m0, m1, ms0, ms1 = get_matches(Z, self.match_threshold)
        return {"matches0": m0, "matches1": m1, "matching_scores0": ms0,
                "matching_scores1": ms1, "scores": np.asarray(raw)}
