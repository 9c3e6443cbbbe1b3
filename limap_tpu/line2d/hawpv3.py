"""HAWPv3 detector — faithful JAX port of the published architecture.

Counterpart of /root/reference/src/limap/line2d/HAWPv3/hawp.py, which
instantiates ``hawp.ssl.models.MODELS["HAWP"]`` from the external
``hawp`` package with the config the reference ships
(/root/reference/src/limap/line2d/HAWPv3/hawpv3.yaml: stacked hourglass
with NUM_STACKS=2, DEPTH=4, INPLANES=64, NUM_FEATS=128, NUM_BLOCKS=1,
HEAD_SIZE=[[3],[1],[1],[2],[2]], gray input) and loads the published
``hawpv3_wireframe.pth`` checkpoint.

This module ports the BACKBONE + MULTITASK HEAD exactly — parameter
names and shapes follow the upstream ``hawp/fsl/backbones/stacked_hg.py``
(itself derived from bearpaw/pytorch-pose ``hg.py``): pre-activation
Bottleneck2D blocks, the recursive Hourglass module, per-stack
fc/score/fc_/score_ layers, and the MultitaskHead (3x3 conv -> ReLU ->
1x1 conv per output group).  ``key_spec()`` enumerates the expected
state_dict entry for every parameter; ``load_torch_state_dict`` is
strict (any missing/mismatched backbone key raises with the full list).
HAFM line decoding + junction decoding follow the published
``hafm_decoding`` / ``get_junctions`` formulas (hawp/fsl/model).

The LOI verification head (the remaining ~15% of checkpoint weights,
whose exact v3 layout cannot be confirmed offline) is replaced by
junction-matching verification: decoded attraction-field lines are kept
when both endpoints snap to detected junctions — HAWP's proposal
mechanism, with the learned verifier's role taken by the junction
confidence product.  Unknown checkpoint keys are therefore IGNORED
(reported via ``load_torch_state_dict(..., verbose=True)``), never
silently misloaded.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.line2d.base import BaseDetector, register_detector
from limap_tpu.line2d.sold2.nets import conv, relu

# hawpv3.yaml MODEL.HGNETS + HEAD_SIZE
DEPTH = 4
INPLANES = 64
NUM_FEATS = 128
NUM_BLOCKS = 1
NUM_STACKS = 2
HEAD_SIZE = [[3], [1], [1], [2], [2]]   # md, dis, res, jloc, joff
NUM_CLASSES = sum(sum(HEAD_SIZE, []))   # 9
CH = NUM_FEATS * 2                      # Bottleneck2D.expansion = 2


# ----------------------------------------------------------- key spec
def _bottleneck_spec(prefix: str, inplanes: int, planes: int,
                     downsample: bool) -> List[Tuple[str, tuple]]:
    """Pre-activation Bottleneck2D (pytorch-pose hg.py): bn1-conv1(1x1)
    -bn2-conv2(3x3)-bn3-conv3(1x1, planes*2) [+ downsample 1x1]."""
    out = []

    def bn(name, c):
        for suf, shape in (("weight", (c,)), ("bias", (c,)),
                           ("running_mean", (c,)), ("running_var", (c,))):
            out.append((f"{prefix}.{name}.{suf}", shape))

    def cv(name, o, i, k):
        out.append((f"{prefix}.{name}.weight", (o, i, k, k)))
        out.append((f"{prefix}.{name}.bias", (o,)))

    bn("bn1", inplanes)
    cv("conv1", planes, inplanes, 1)
    bn("bn2", planes)
    cv("conv2", planes, planes, 3)
    bn("bn3", planes)
    cv("conv3", planes * 2, planes, 1)
    if downsample:
        cv("downsample.0", planes * 2, inplanes, 1)
    return out


def key_spec() -> List[Tuple[str, tuple]]:
    """Every (state_dict key, torch shape) of the ported sub-network,
    matching hawp/fsl/backbones/stacked_hg.py with the reference's
    hawpv3.yaml hyperparameters."""
    spec = []

    def cv(name, o, i, k):
        spec.append((f"{name}.weight", (o, i, k, k)))
        spec.append((f"{name}.bias", (o,)))

    def bn(name, c):
        for suf, shape in (("weight", (c,)), ("bias", (c,)),
                           ("running_mean", (c,)), ("running_var", (c,))):
            spec.append((f"{name}.{suf}", shape))

    P = "backbone"
    cv(f"{P}.conv1", INPLANES, 1, 7)          # gray input
    bn(f"{P}.bn1", INPLANES)
    # layer1: inplanes 64, planes 64 -> 128 (downsample)
    spec += _bottleneck_spec(f"{P}.layer1.0", 64, 64, True)
    # layer2: inplanes 128, planes 128 -> 256 (downsample)
    spec += _bottleneck_spec(f"{P}.layer2.0", 128, 128, True)
    # layer3: inplanes 256, planes NUM_FEATS=128 -> 256 (no downsample)
    spec += _bottleneck_spec(f"{P}.layer3.0", 256, 128, False)

    for s in range(NUM_STACKS):
        # Hourglass: hg.{s}.hg.{d}.{j}.{b} — j in 0..2 (+3 at d==0)
        for d in range(DEPTH):
            n_branches = 4 if d == 0 else 3
            for j in range(n_branches):
                for b in range(NUM_BLOCKS):
                    spec += _bottleneck_spec(
                        f"{P}.hg.{s}.hg.{d}.{j}.{b}", CH, NUM_FEATS,
                        False)
        for b in range(NUM_BLOCKS):
            spec += _bottleneck_spec(f"{P}.res.{s}.{b}", CH, NUM_FEATS,
                                     False)
        # _make_fc: Sequential(conv1x1, BN, ReLU)
        cv(f"{P}.fc.{s}.0", CH, CH, 1)
        bn(f"{P}.fc.{s}.1", CH)
        # MultitaskHead: heads.{m} = Sequential(3x3 conv, ReLU, 1x1)
        m_ch = CH // 4
        for m, out_ch in enumerate(sum(HEAD_SIZE, [])):
            cv(f"{P}.score.{s}.heads.{m}.0", m_ch, CH, 3)
            cv(f"{P}.score.{s}.heads.{m}.2", out_ch, m_ch, 1)
        if s < NUM_STACKS - 1:
            cv(f"{P}.fc_.{s}", CH, CH, 1)
            cv(f"{P}.score_.{s}", CH, NUM_CLASSES, 1)
    return spec


def load_torch_state_dict(sd: Dict[str, np.ndarray],
                          key_map: Optional[Dict[str, str]] = None,
                          verbose: bool = False) -> Dict:
    """Strict loader: every spec key must exist with the exact torch
    shape; conv weights transpose OIHW -> HWIO.  Extra checkpoint keys
    (the LOI verifier) are ignored and listed when ``verbose``."""
    if key_map:
        sd = {key_map.get(k, k): v for k, v in sd.items()}
    params = {}
    problems = []
    used = set()
    for key, shape in key_spec():
        if key not in sd:
            problems.append(f"missing {key} {shape}")
            continue
        v = np.asarray(sd[key], np.float32)
        if tuple(v.shape) != tuple(shape):
            problems.append(f"{key}: got {tuple(v.shape)}, want {shape}")
            continue
        used.add(key)
        if v.ndim == 4:
            v = np.transpose(v, (2, 3, 1, 0))
        params[key] = jnp.asarray(v)
    if problems:
        raise ValueError(
            "checkpoint does not match the published HAWPv3 "
            "stacked-hourglass spec:\n" + "\n".join(problems))
    if verbose:
        extra = sorted(k for k in sd if k not in used
                       and "num_batches_tracked" not in k)
        if extra:
            print(f"hawpv3: ignoring {len(extra)} non-backbone keys "
                  f"(LOI verifier), e.g. {extra[:5]}")
    return params


def init_params(seed: int = 0) -> Dict:
    rng = np.random.default_rng(seed)
    params = {}
    for key, shape in key_spec():
        if key.endswith(".running_var") or (key.endswith(".weight")
                                            and len(shape) == 1):
            v = np.ones(shape, np.float32)
        elif len(shape) == 1:
            v = np.zeros(shape, np.float32)
        else:
            fan_in = int(np.prod(shape[1:]))
            v = rng.normal(0, (2.0 / fan_in) ** 0.5,
                           shape).astype(np.float32)
        if v.ndim == 4:
            v = np.transpose(v, (2, 3, 1, 0))
        params[key] = jnp.asarray(v)
    return params


# ------------------------------------------------------------ forward
def _bn(p: Dict, name: str, x: jnp.ndarray) -> jnp.ndarray:
    g = p[f"{name}.weight"]
    b = p[f"{name}.bias"]
    m = p[f"{name}.running_mean"]
    v = p[f"{name}.running_var"]
    return (x - m) * jax.lax.rsqrt(v + 1e-5) * g + b


def _bottleneck(p: Dict, prefix: str, x: jnp.ndarray,
                downsample: bool) -> jnp.ndarray:
    out = relu(_bn(p, f"{prefix}.bn1", x))
    out = conv(p, f"{prefix}.conv1", out, padding="VALID")
    out = relu(_bn(p, f"{prefix}.bn2", out))
    out = conv(p, f"{prefix}.conv2", out)
    out = relu(_bn(p, f"{prefix}.bn3", out))
    out = conv(p, f"{prefix}.conv3", out, padding="VALID")
    res = conv(p, f"{prefix}.downsample.0", x, padding="VALID") \
        if downsample else x
    return out + res


def _pool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _upsample2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")


def _hourglass(p: Dict, prefix: str, depth: int,
               x: jnp.ndarray) -> jnp.ndarray:
    """Recursive hourglass forward (pytorch-pose _hour_glass_forward):
    up1 = hg[n-1][0](x); low = hg[n-1][1](pool(x)); recurse or
    hg[0][3]; low3 = hg[n-1][2]; up2 = upsample(low3)."""
    def blocks(d, j, y):
        for b in range(NUM_BLOCKS):
            y = _bottleneck(p, f"{prefix}.hg.{d}.{j}.{b}", y, False)
        return y

    def rec(n, y):
        up1 = blocks(n - 1, 0, y)
        low1 = blocks(n - 1, 1, _pool(y))
        if n > 1:
            low2 = rec(n - 1, low1)
        else:
            low2 = blocks(0, 3, low1)
        low3 = blocks(n - 1, 2, low2)
        return up1 + _upsample2(low3)

    return rec(depth, x)


def hawp_forward(p: Dict, image: jnp.ndarray):
    """image [B, H, W, 1] (H, W multiples of 64) -> per-field dict at
    1/4 resolution: md [B,h,w,3], dis [B,h,w,1], res [B,h,w,1],
    jloc [B,h,w,1] (prob), joff [B,h,w,2] (offsets in [-0.5, 0.5])."""
    P = "backbone"
    x = conv(p, f"{P}.conv1", image, stride=2)
    x = relu(_bn(p, f"{P}.bn1", x))
    x = _bottleneck(p, f"{P}.layer1.0", x, True)
    x = _pool(x)
    x = _bottleneck(p, f"{P}.layer2.0", x, True)
    x = _bottleneck(p, f"{P}.layer3.0", x, False)

    score_out = None
    for s in range(NUM_STACKS):
        y = _hourglass(p, f"{P}.hg.{s}", DEPTH, x)
        for b in range(NUM_BLOCKS):
            y = _bottleneck(p, f"{P}.res.{s}.{b}", y, False)
        y = relu(_bn(p, f"{P}.fc.{s}.1",
                     conv(p, f"{P}.fc.{s}.0", y, padding="VALID")))
        outs = []
        for m in range(len(sum(HEAD_SIZE, []))):
            h = relu(conv(p, f"{P}.score.{s}.heads.{m}.0", y))
            outs.append(conv(p, f"{P}.score.{s}.heads.{m}.2", h,
                             padding="VALID"))
        score_out = jnp.concatenate(outs, axis=-1)   # [B, h, w, 9]
        if s < NUM_STACKS - 1:
            x = x + conv(p, f"{P}.fc_.{s}", y, padding="VALID") \
                + conv(p, f"{P}.score_.{s}", score_out, padding="VALID")

    md = jax.nn.sigmoid(score_out[..., 0:3])
    dis = jax.nn.sigmoid(score_out[..., 3:4])
    res_f = jax.nn.sigmoid(score_out[..., 4:5])
    jloc = jax.nn.softmax(score_out[..., 5:7], axis=-1)[..., 1:2]
    joff = jax.nn.sigmoid(score_out[..., 7:9]) - 0.5
    return {"md": md, "dis": dis, "res": res_f, "jloc": jloc,
            "joff": joff}


# ----------------------------------------------------------- decoding
def hafm_decoding(md: np.ndarray, dis: np.ndarray, res: np.ndarray,
                  scale: float = 5.0,
                  residual_ts=(-1.0, 0.0, 1.0)) -> np.ndarray:
    """Holistic attraction field -> line segments per pixel (the
    published hafm_decoding formulas, hawp/fsl/model): md encodes the
    rotation + the two endpoint angles, dis the normalized distance;
    each residual offset t yields one candidate per pixel.
    Inputs [h, w, C]; returns [len(ts), h*w, 4] in 1/4-res pixels."""
    h, w = md.shape[:2]
    y0, x0 = np.mgrid[0:h, 0:w].astype(np.float32)
    md_ = (md[..., 0] - 0.5) * np.pi * 2
    st_ = md[..., 1] * np.pi / 2
    ed_ = -md[..., 2] * np.pi / 2
    cs, ss = np.cos(md_), np.sin(md_)
    y_st = np.tan(st_)
    y_ed = np.tan(ed_)
    out = []
    for t in residual_ts:
        d = np.clip(dis[..., 0] + t * res[..., 0], 0, 1) * scale
        x_st = (cs - ss * y_st) * d + x0
        yy_st = (ss + cs * y_st) * d + y0
        x_ed = (cs - ss * y_ed) * d + x0
        yy_ed = (ss + cs * y_ed) * d + y0
        out.append(np.stack([x_st, yy_st, x_ed, yy_ed],
                            axis=-1).reshape(-1, 4))
    return np.stack(out)


def decode_junctions(jloc: np.ndarray, joff: np.ndarray,
                     topk: int = 300, th: float = 0.008):
    """3x3 NMS + top-k + offset refinement (get_junctions)."""
    import scipy.ndimage as ndi
    prob = jloc[..., 0]
    keep = (ndi.maximum_filter(prob, size=3) == prob) & (prob > th)
    ys, xs = np.nonzero(keep)
    if not len(ys):
        return np.zeros((0, 2), np.float32), np.zeros(0, np.float32)
    scores = prob[ys, xs]
    order = np.argsort(-scores)[:topk]
    ys, xs, scores = ys[order], xs[order], scores[order]
    off = joff[ys, xs]
    pts = np.stack([xs + off[:, 0] + 0.5, ys + off[:, 1] + 0.5], 1)
    return pts.astype(np.float32), scores.astype(np.float32)


def match_lines_to_junctions(lines: np.ndarray, juncs: np.ndarray,
                             jscore: np.ndarray, dist_th: float = 10.0
                             ) -> np.ndarray:
    """Snap both endpoints of every candidate to the nearest junction
    (HAWP's proposal step); keep distinct-endpoint matches, dedupe by
    junction pair, score = junction confidence product.  Returns
    [N, 5] (x1, y1, x2, y2, score) in the same pixel units."""
    if not len(juncs) or not len(lines):
        return np.zeros((0, 5), np.float32)
    e1, e2 = lines[:, 0:2], lines[:, 2:4]
    d1 = np.linalg.norm(e1[:, None] - juncs[None], axis=-1)
    d2 = np.linalg.norm(e2[:, None] - juncs[None], axis=-1)
    j1, j2 = d1.argmin(1), d2.argmin(1)
    ok = (d1[np.arange(len(e1)), j1] < dist_th) \
        & (d2[np.arange(len(e2)), j2] < dist_th) & (j1 != j2)
    if not ok.any():
        return np.zeros((0, 5), np.float32)
    j1, j2 = j1[ok], j2[ok]
    lo, hi = np.minimum(j1, j2), np.maximum(j1, j2)
    pair = lo.astype(np.int64) * len(juncs) + hi
    _, first = np.unique(pair, return_index=True)
    lo, hi = lo[first], hi[first]
    segs = np.concatenate([juncs[lo], juncs[hi]], axis=1)
    score = jscore[lo] * jscore[hi]
    return np.concatenate([segs, score[:, None]],
                          axis=1).astype(np.float32)


@register_detector("hawpv3")
class HAWPv3Detector(BaseDetector):
    """Published-architecture HAWPv3 wireframe detector (strict
    checkpoint key spec; see module docstring for the verification-head
    caveat)."""

    def __init__(self, options: Optional[dict] = None):
        super().__init__(options)
        options = options or {}
        self.params = None
        self.detect_thresh = options.get("detect_thresh", 0.008)
        if self.weight_path is not None:
            import os

            ckpt = self.weight_path
            if os.path.isdir(ckpt):
                ckpt = os.path.join(ckpt, "line2d", "HAWPv3",
                                    "weights", "hawpv3_wireframe.pth")
            if os.path.isfile(ckpt):
                import torch

                blob = torch.load(ckpt, map_location="cpu",
                                  weights_only=False)
                sd = blob.get("model", blob)
                self.params = load_torch_state_dict(
                    {k: np.asarray(v) for k, v in sd.items()},
                    key_map=options.get("key_map"), verbose=True)
        if self.params is None:
            import warnings
            warnings.warn(
                "hawpv3 running with RANDOM weights (no weight_path); "
                "detections will be meaningless — pass the published "
                "hawpv3_wireframe.pth", stacklevel=2)
            self.params = init_params(options.get("seed", 0))
        self._forward = jax.jit(hawp_forward)

    def get_module_name(self):
        return "hawpv3"

    def detect(self, camview) -> np.ndarray:
        img = np.asarray(camview.read_image(set_gray=True), np.float32)
        return self.detect_array(img)

    def detect_array(self, img: np.ndarray) -> np.ndarray:
        img = np.asarray(img, np.float32)
        if img.ndim == 3:
            img = img.mean(-1)
        if img.max() > 1.5:
            img = img / 255.0
        H, W = img.shape
        # stem /4 x hourglass 2^DEPTH pooling: sizes must divide 64
        Hp, Wp = -(-H // 64) * 64, -(-W // 64) * 64
        buf = np.zeros((1, Hp, Wp, 1), np.float32)
        buf[0, :H, :W, 0] = img
        out = jax.device_get(self._forward(self.params,
                                           jnp.asarray(buf)))
        md = np.asarray(out["md"])[0]
        dis = np.asarray(out["dis"])[0]
        res = np.asarray(out["res"])[0]
        cand = hafm_decoding(md, dis, res).reshape(-1, 4)
        juncs, jscore = decode_junctions(
            np.asarray(out["jloc"])[0], np.asarray(out["joff"])[0],
            th=self.detect_thresh)
        segs = match_lines_to_junctions(cand, juncs, jscore)
        segs[:, :4] *= 4.0   # 1/4-res -> pixels
        keep = ((segs[:, 0] < W) & (segs[:, 2] < W)
                & (segs[:, 1] < H) & (segs[:, 3] < H))
        return segs[keep]
