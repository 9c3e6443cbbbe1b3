"""LineTR — Line Transformer descriptor + matcher, pure-JAX port.

Counterpart of /root/reference/src/limap/line2d/LineTR/
{line_transformer.py, line_attention.py, line_process.py, extractor.py,
matcher.py, nn_matcher.py} (Yoon & Kim, "Line as a Visual Sentence",
RA-L 2021).  The torch implementation is vendored in the reference, so
this port is verified numerically against it (tests/test_linetr.py):

- host-side tokenizer (line_process.line_tokenizer): keylines split
  into sublines of <= max_tokens tokens spaced token_distance apart,
  with per-token SuperPoint descriptors/scores and a
  keyline<-subline averaging matrix — ported in NumPy exactly;
- Line Descriptive Network (KeylineEncoder): MLP positional encoders
  for sublines and tokens, a CLS token, pre-norm-free transformer
  blocks (MultiHeadAttention with LayerNorm + residual, GELU
  FeedForward) over the token axis;
- Line Signature Network: 7 SuperGlue-style self-attention
  propagation layers over the subline axis + final 1x1 projection,
  L2-normalized 256-d subline descriptors;
- matching: subline cosine-distance matrix lifted to keylines through
  the averaging matrices, mutual-NN with threshold
  (nn_matcher.nn_matcher_distmat).

Parameters live in a flat torch-keyed dict (the published
``LineTR_weight.pth`` loads as a relayout); without weights a seeded
init keeps the pipeline runnable.
"""

from __future__ import annotations

import math
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.line2d.base import (BaseDetector, BaseMatcher,
                                   register_extractor, register_matcher)

D = 256
N_HEADS = 4
D_INNER = 1024
MLP_LAYERS = [32, 64, 128, 256]
N_SIG_LAYERS = 7
LN_EPS = 1e-6
BN_EPS = 1e-5


# --------------------------------------------------------------- params
def _mlp_spec(prefix, channels):
    spec = []
    idx = 0
    n = len(channels)
    for i in range(1, n):
        spec.append((f"{prefix}.{idx}.weight",
                     (channels[i], channels[i - 1], 1)))
        spec.append((f"{prefix}.{idx}.bias", (channels[i],)))
        idx += 1
        if i < n - 1:
            for suf in ("weight", "bias", "running_mean", "running_var"):
                spec.append((f"{prefix}.{idx}.{suf}", (channels[i],)))
            idx += 2  # bn + relu
    return spec


def _spec():
    spec = []
    mlp_ch = [5] + MLP_LAYERS + [D]
    spec += _mlp_spec("klenc.line_position_enc.encoder", mlp_ch)
    spec += _mlp_spec("klenc.word_position_enc.encoder", [3] + MLP_LAYERS
                      + [D])
    # descriptive layer (n_line_descriptive_layers = 1)
    p = "klenc.desc_layers.0"
    for name in ("w_qs", "w_ks", "w_vs", "fc"):
        spec.append((f"{p}.slf_attn.{name}.weight", (D, D)))
        spec.append((f"{p}.slf_attn.{name}.bias", (D,)))
    spec.append((f"{p}.slf_attn.layer_norm.weight", (D,)))
    spec.append((f"{p}.slf_attn.layer_norm.bias", (D,)))
    spec.append((f"{p}.pos_ffn.w_1.weight", (D_INNER, D)))
    spec.append((f"{p}.pos_ffn.w_1.bias", (D_INNER,)))
    spec.append((f"{p}.pos_ffn.w_2.weight", (D, D_INNER)))
    spec.append((f"{p}.pos_ffn.w_2.bias", (D,)))
    spec.append((f"{p}.pos_ffn.layer_norm.weight", (D,)))
    spec.append((f"{p}.pos_ffn.layer_norm.bias", (D,)))
    spec.append(("klenc.cls_token", (1, 1, 1, D)))
    # signature layers
    for i in range(N_SIG_LAYERS):
        p = f"selfattn.layers.{i}"
        spec.append((f"{p}.attn.merge.weight", (D, D, 1)))
        spec.append((f"{p}.attn.merge.bias", (D,)))
        for j in range(3):
            spec.append((f"{p}.attn.proj.{j}.weight", (D, D, 1)))
            spec.append((f"{p}.attn.proj.{j}.bias", (D,)))
        spec += _mlp_spec(f"{p}.mlp", [2 * D, 2 * D, D])
    spec.append(("final_proj.weight", (D, D, 1)))
    spec.append(("final_proj.bias", (D,)))
    return spec


def load_torch_state_dict(sd) -> Dict[str, jnp.ndarray]:
    params = {}
    for key, shape in _spec():
        if key not in sd:
            raise KeyError(f"missing checkpoint entry {key} {shape}")
        v = np.asarray(sd[key], np.float32)
        if tuple(v.shape) != tuple(shape):
            raise ValueError(f"{key}: {v.shape} != {shape}")
        params[key] = jnp.asarray(v)
    return params


def init_params(seed: int = 0) -> Dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    params = {}
    for key, shape in _spec():
        if key.endswith(".running_var"):
            v = np.ones(shape, np.float32)
        elif key.endswith((".bias", ".running_mean")):
            v = np.zeros(shape, np.float32)
        elif key.endswith("layer_norm.weight") or (
                ".1.weight" in key and len(shape) == 1):
            v = np.ones(shape, np.float32)
        elif len(shape) == 1:
            v = np.ones(shape, np.float32)
        else:
            fan_in = int(np.prod(shape[1:]))
            v = rng.normal(0, (1.0 / fan_in) ** 0.5,
                           shape).astype(np.float32)
        params[key] = jnp.asarray(v)
    return params


# -------------------------------------------------------------- forward
def _mlp(p, prefix, x, channels):
    """x [..., C_in, N] -> [..., C_out, N] (conv1d MLP with BN+ReLU)."""
    idx = 0
    n = len(channels)
    for i in range(1, n):
        w = p[f"{prefix}.{idx}.weight"][..., 0]
        b = p[f"{prefix}.{idx}.bias"]
        x = jnp.einsum("oc,...cn->...on", w, x) + b[..., :, None]
        idx += 1
        if i < n - 1:
            g = p[f"{prefix}.{idx}.weight"]
            beta = p[f"{prefix}.{idx}.bias"]
            mean = p[f"{prefix}.{idx}.running_mean"]
            var = p[f"{prefix}.{idx}.running_var"]
            x = (x - mean[:, None]) * jax.lax.rsqrt(var[:, None] + BN_EPS)
            x = x * g[:, None] + beta[:, None]
            x = jnp.maximum(x, 0.0)
            idx += 2
    return x


def _layer_norm(x, g, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * g + b


def _word_attention(p, prefix, x, mask):
    """line_attention.MultiHeadAttention over the token axis.

    x [S, W1, D]; mask [S, W1, 1] (1 = valid query row)."""
    S, W1, _ = x.shape
    dim = D // N_HEADS
    residual = x

    def lin(name, v):
        w = p[f"{prefix}.{name}.weight"]
        b = p[f"{prefix}.{name}.bias"]
        return jnp.einsum("od,swd->swo", w, v) + b

    q = lin("w_qs", x).reshape(S, W1, N_HEADS, dim).transpose(0, 2, 1, 3)
    k = lin("w_ks", x).reshape(S, W1, N_HEADS, dim).transpose(0, 2, 1, 3)
    v = lin("w_vs", x).reshape(S, W1, N_HEADS, dim).transpose(0, 2, 1, 3)
    attn = jnp.einsum("shqd,shkd->shqk", q / math.sqrt(dim), k)
    # the torch mask [., S, 1, W+1, 1] broadcasts over the KEY axis,
    # i.e. it blanks the rows of padded query tokens
    attn = jnp.where(mask[:, None, :, :] == 0, -1e9, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("shqk,shkd->shqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(S, W1, D)
    w = p[f"{prefix}.fc.weight"]
    b = p[f"{prefix}.fc.bias"]
    out = jnp.einsum("od,swd->swo", w, out) + b
    out = out + residual
    return _layer_norm(out, p[f"{prefix}.layer_norm.weight"],
                       p[f"{prefix}.layer_norm.bias"])


def _feed_forward(p, prefix, x):
    residual = x
    w1 = p[f"{prefix}.w_1.weight"]
    b1 = p[f"{prefix}.w_1.bias"]
    w2 = p[f"{prefix}.w_2.weight"]
    b2 = p[f"{prefix}.w_2.bias"]
    h = jax.nn.gelu(jnp.einsum("od,swd->swo", w1, x) + b1,
                    approximate=False)
    h = jnp.einsum("od,swd->swo", w2, h) + b2
    h = h + residual
    return _layer_norm(h, p[f"{prefix}.layer_norm.weight"],
                       p[f"{prefix}.layer_norm.bias"])


def _sig_attention(p, prefix, x, source):
    """SuperGlue-style conv1d attention over sublines.  x [D, S]."""
    dim = D // N_HEADS

    def conv(name, v):
        w = p[f"{prefix}.{name}.weight"][..., 0]
        b = p[f"{prefix}.{name}.bias"]
        return jnp.einsum("oc,cn->on", w, v) + b[:, None]

    q = conv("proj.0", x).reshape(dim, N_HEADS, -1)
    k = conv("proj.1", source).reshape(dim, N_HEADS, -1)
    v = conv("proj.2", source).reshape(dim, N_HEADS, -1)
    scores = jnp.einsum("dhn,dhm->hnm", q, k) / dim ** 0.5
    prob = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hnm,dhm->dhn", prob, v).reshape(D, -1)
    return conv("merge", out)


def linetr_forward(p: Dict, sublines, resp, angle, pnt, desc, score,
                   mask) -> jnp.ndarray:
    """All inputs subline-major (no batch dim): sublines [S, 2, 2]
    (normalized), resp [S, 1], angle [S, 2], pnt [S, W, 2] (normalized),
    desc [S, W, 256], score [S, W, 1], mask [S, W+1, 1].
    -> [S, 256] L2-normalized subline descriptors."""
    # line positional encoding [D, S]
    mid = 0.5 * (sublines[:, 0] + sublines[:, 1])       # [S, 2]
    lin_in = jnp.concatenate([mid, resp, angle], axis=-1).T  # [5, S]
    klines_pos = _mlp(p, "klenc.line_position_enc.encoder", lin_in,
                      [5] + MLP_LAYERS + [D])            # [D, S]

    # word positional encoding
    word_in = jnp.concatenate([pnt, score], axis=-1)     # [S, W, 3]
    word_in = word_in.transpose(0, 2, 1)                 # [S, 3, W]
    word_pos = _mlp(p, "klenc.word_position_enc.encoder", word_in,
                    [3] + MLP_LAYERS + [D])              # [S, D, W]
    x = desc + word_pos.transpose(0, 2, 1)               # [S, W, D]

    cls = jnp.broadcast_to(p["klenc.cls_token"][0, 0], (x.shape[0], 1, D))
    x = jnp.concatenate([cls, x], axis=1)                # [S, W+1, D]

    x = _word_attention(p, "klenc.desc_layers.0.slf_attn", x, mask)
    x = _feed_forward(p, "klenc.desc_layers.0.pos_ffn", x)

    sentence = klines_pos + x[:, 0, :].T                 # [D, S]

    for i in range(N_SIG_LAYERS):
        pre = f"selfattn.layers.{i}"
        msg = _sig_attention(p, f"{pre}.attn", sentence, sentence)
        delta = _mlp(p, f"{pre}.mlp",
                     jnp.concatenate([sentence, msg], axis=0),
                     [2 * D, 2 * D, D])
        sentence = sentence + delta
    w = p["final_proj.weight"][..., 0]
    b = p["final_proj.bias"]
    out = jnp.einsum("oc,cn->on", w, sentence) + b[:, None]
    out = out / jnp.sqrt(jnp.sum(out * out, axis=0, keepdims=True)
                         + 1e-24)
    return out.T                                          # [S, D]


# ------------------------------------------------------------ tokenizer
def get_angles(lines):
    """(cos 2a, sin 2a) per line (line_process.py:31-44)."""
    if len(lines) == 0:
        return np.zeros((0, 2))
    sp, ep = lines[:, 0], lines[:, 1]
    ang = np.arctan2(ep[:, 0] - sp[:, 0], ep[:, 1] - sp[:, 1])
    ang = np.where(ang < 0, ang + np.pi, ang)
    return np.stack([np.cos(2 * ang), np.sin(2 * ang)], axis=-1)


def _point_on_line(line, dist_px):
    sp, ep = line
    vec = ep - sp
    if vec[0] != 0:
        m = vec[1] / vec[0]
        x = np.sqrt(dist_px ** 2 / (1 + m ** 2))
        y = m * x
    else:
        x = 0.0
        y = dist_px if ep[1] - sp[1] > 0 else -dist_px
    return np.asarray((x, y)) + sp


def tokenize(klines: np.ndarray, token_distance: float, max_tokens: int,
             image_shape):
    """line_process.line_tokenizer host part (:125-215): sublines,
    token positions, masks, responses, angles, averaging matrix."""
    height, width = image_shape
    lengths = np.linalg.norm(klines[:, 0] - klines[:, 1], axis=-1)
    angles = get_angles(klines)
    slines, tokens_all, masks_all, resp_all, ang_all = [], [], [], [], []
    n_slines_per_kline = []
    for i, (kline, klength) in enumerate(zip(klines, lengths)):
        tokens = []
        num_tokens = int(math.ceil(klength / token_distance))
        num_tokens = max(num_tokens, 1)
        for i_token in range(num_tokens - 1):
            tokens.append(_point_on_line(kline, i_token * token_distance))
        tok = kline[1].copy()
        tok[0] = min(tok[0], width - 0.6)
        tok[1] = min(tok[1], height - 0.6)
        tokens.append(tok)
        num_sublines = int(math.ceil(num_tokens / max_tokens))
        sub = np.zeros((num_sublines, 2, 2))
        sub[0, 0] = kline[0]
        sub[-1, 1] = kline[1]
        for i_s in range(num_sublines - 1):
            mid_tok = tokens[(i_s + 1) * max_tokens - 1]
            sub[i_s, 1] = mid_tok
            sub[i_s + 1, 0] = mid_tok
        slines.extend(sub)
        n_slines_per_kline.append(num_sublines)
        tok_s = np.zeros((num_sublines, max_tokens, 2))
        msk_s = np.zeros((num_sublines, max_tokens + 1, 1))
        msk_s[:, 0] = 1
        for i_s in range(num_sublines):
            chunk = np.asarray(tokens[i_s * max_tokens:
                                      (i_s + 1) * max_tokens])
            tok_s[i_s, :len(chunk)] = chunk
            msk_s[i_s, 1:len(chunk) + 1] = 1
        tokens_all.extend(tok_s)
        masks_all.extend(msk_s)
        max_length = token_distance * max_tokens
        for i_s in range(num_sublines):
            resp_all.append([np.linalg.norm(sub[i_s, 1] - sub[i_s, 0])
                             / max_length])
            ang_all.append(angles[i])
    S = len(slines)
    L = len(klines)
    k2s = np.zeros((L, S))
    st = 0
    for i, n_s in enumerate(n_slines_per_kline):
        k2s[i, st:st + n_s] = 1.0 / n_s
        st += n_s
    return (np.asarray(slines), np.asarray(tokens_all),
            np.asarray(masks_all), np.asarray(resp_all),
            np.asarray(ang_all), k2s)


def sample_dense_descriptors(desc_grid: np.ndarray, tokens: np.ndarray,
                             s: int = 8):
    """grid_sample(align_corners=True) over the SuperPoint descriptor
    grid + renormalize (line_process.sample_descriptors)."""
    Hc, Wc, C = desc_grid.shape
    kp = tokens.reshape(-1, 2).astype(np.float64)
    kp = kp - s / 2 + 0.5
    kp = kp / np.asarray([(Wc * s - s / 2 - 0.5),
                          (Hc * s - s / 2 - 0.5)])
    kp = kp * 2 - 1
    # align_corners=True: pix = (norm + 1)/2 * (size - 1)
    u = (kp[:, 0] + 1) / 2 * (Wc - 1)
    v = (kp[:, 1] + 1) / 2 * (Hc - 1)
    u0 = np.clip(np.floor(u).astype(int), 0, Wc - 1)
    v0 = np.clip(np.floor(v).astype(int), 0, Hc - 1)
    u1 = np.clip(u0 + 1, 0, Wc - 1)
    v1 = np.clip(v0 + 1, 0, Hc - 1)
    fu = np.clip(u - u0, 0, 1)[:, None]
    fv = np.clip(v - v0, 0, 1)[:, None]
    d = (desc_grid[v0, u0] * (1 - fv) * (1 - fu)
         + desc_grid[v0, u1] * (1 - fv) * fu
         + desc_grid[v1, u0] * fv * (1 - fu)
         + desc_grid[v1, u1] * fv * fu)
    d = d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)
    return d.reshape(tokens.shape[0], tokens.shape[1], C)


def normalize_keylines(slines, tokens, image_shape):
    height, width = image_shape
    size = np.asarray([width, height], np.float64)
    center = size / 2
    scaling = size.max() * 0.7
    return ((slines - center) / scaling,
            (tokens - center) / scaling)


# --------------------------------------------------------------- plugin
@register_extractor("linetr")
class LineTRExtractor(BaseDetector):
    def __init__(self, options: Optional[dict] = None):
        super().__init__(options)
        options = options or {}
        self.params = None
        if self.weight_path is not None:
            ckpt = self.weight_path
            if os.path.isdir(ckpt):
                ckpt = os.path.join(ckpt, "line2d", "LineTR", "weights",
                                    "LineTR_weight.pth")
            if os.path.isfile(ckpt):
                import torch

                sd = torch.load(ckpt, map_location="cpu",
                                weights_only=False)
                self.params = load_torch_state_dict(
                    {k: v.numpy() for k, v in sd.items()})
        if self.params is None:
            self.params = init_params(options.get("seed", 0))
        from limap_tpu.point2d.superpoint import SuperPoint

        self.sp = SuperPoint(weight_path=options.get("sp_weight_path"))
        self.token_distance = options.get("token_distance", 8.0)
        self.max_tokens = options.get("max_tokens", 21)
        self._forward = jax.jit(linetr_forward)

    def get_module_name(self):
        return "linetr"

    def compute_descinfo(self, img: np.ndarray, segs: np.ndarray) -> dict:
        import cv2

        segs = np.asarray(segs)
        if len(segs) == 0:
            return {"line_descriptors": np.empty((0, 256)),
                    "mat_klines2sublines": np.empty((0, 0))}
        orig_h, orig_w = img.shape[:2]
        new_h, new_w = 480, 640
        s_h, s_w = new_h / orig_h, new_w / orig_w
        new_img = cv2.resize(img, (new_w, new_h))
        klines = segs[:, :4].reshape(-1, 2, 2) * [s_w, s_h]

        dense = self.sp.dense(new_img)
        desc_grid = dense["dense_descriptor"]      # [Hc, Wc, 256]
        score_map = dense["dense_score"]           # [H, W]

        slines, tokens, masks, resp, ang, k2s = tokenize(
            klines, self.token_distance, self.max_tokens,
            (new_h, new_w))
        desc = sample_dense_descriptors(desc_grid, tokens)
        ti = np.round(tokens).astype(int)
        ti[..., 0] = ti[..., 0].clip(0, score_map.shape[1] - 1)
        ti[..., 1] = ti[..., 1].clip(0, score_map.shape[0] - 1)
        scores = score_map[ti[..., 1], ti[..., 0]][..., None]

        slines_n, tokens_n = normalize_keylines(slines, tokens,
                                                (new_h, new_w))
        out = self._forward(
            self.params, jnp.asarray(slines_n, jnp.float32),
            jnp.asarray(resp, jnp.float32), jnp.asarray(ang, jnp.float32),
            jnp.asarray(tokens_n, jnp.float32),
            jnp.asarray(desc, jnp.float32),
            jnp.asarray(scores, jnp.float32),
            jnp.asarray(masks, jnp.float32))
        return {"line_descriptors": np.asarray(out),
                "mat_klines2sublines": k2s}

    def extract(self, camview, segs) -> dict:
        img = np.asarray(camview.read_image(set_gray=True))
        return self.compute_descinfo(img, np.asarray(segs))


@register_matcher("linetr")
class LineTRMatcher(BaseMatcher):
    def __init__(self, extractor, options: Optional[dict] = None):
        super().__init__(extractor, options)
        assert extractor.get_module_name() == "linetr"
        options = options or {}
        self.nn_threshold = options.get("nn_threshold", 0.8)

    def get_module_name(self):
        return "linetr"

    def match_pair(self, descinfo1, descinfo2):
        d1 = np.asarray(descinfo1["line_descriptors"])   # [S1, 256]
        d2 = np.asarray(descinfo2["line_descriptors"])
        m1 = np.asarray(descinfo1["mat_klines2sublines"])
        m2 = np.asarray(descinfo2["mat_klines2sublines"])
        if len(d1) == 0 or len(d2) == 0 or m1.size == 0 or m2.size == 0:
            return np.zeros((0, 2), int)
        dist_sub = np.clip(2.0 - 2.0 * (d1 @ d2.T), 0, None)
        dist = m1 @ dist_sub @ m2.T                       # [L1, L2]
        if self.topk == 0:
            idx = np.argmin(dist, axis=1)
            scores = dist[np.arange(dist.shape[0]), idx]
            keep = scores < self.nn_threshold
            idx2 = np.argmin(dist, axis=0)
            keep &= np.arange(len(idx)) == idx2[idx]
            ids1 = np.nonzero(keep)[0]
            return np.stack([ids1, idx[ids1]], axis=1)
        k = min(self.topk, dist.shape[1])
        topk = np.argsort(dist, axis=1)[:, :k]
        out = [np.stack([np.arange(dist.shape[0]), topk[:, i]], axis=1)
               for i in range(k)]
        return np.concatenate(out, axis=0)
