"""SOLD2 network ("lcnn_simple": stacked-hourglass backbone + junction /
heatmap / descriptor decoders) as a pure-JAX forward pass.

TPU-native re-implementation of the torch model the reference vendors at
/root/reference/src/limap/line2d/SOLD2/model/model_util.py:62 (SOLD2Net)
with nets/lcnn_hourglass.py (HourglassNet), nets/junction_decoder.py,
nets/heatmap_decoder.py (PixelShuffleDecoder) and
nets/descriptor_decoder.py.  Design decisions:

- **NHWC layout** end-to-end (TPU conv layout), with conv kernels stored
  HWIO.  The torch checkpoint's OIHW kernels are transposed once at load.
- **Torch-keyed parameter dict**: parameters are held in a flat
  ``{torch_state_dict_key: array}`` mapping, so loading the published
  ``sold2_wireframe.tar`` checkpoint is a pure relayout with no name
  translation table to maintain, and the mapping is testable against the
  in-tree torch implementation layer by layer
  (tests/test_sold2.py).
- BatchNorm runs in inference mode from the checkpoint's running stats.

Architecture constants follow the reference's only shipped config
(config/export_line_features.yaml): lcnn backbone, depth 4, 2 stacks,
1 block, 5 classes, grid_size 8.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5

# Conv accumulation precision.  None = backend default (bf16-class
# multiply on TPU MXU and on this CPU build — measured ~1e-2 relative
# per conv).  Parity tests set HIGHEST via set_conv_precision().
_CONV_PRECISION = None


def set_conv_precision(precision) -> None:
    global _CONV_PRECISION
    _CONV_PRECISION = precision


# ------------------------------------------------------------ primitives
def conv(p: Dict, name: str, x: jnp.ndarray, stride: int = 1,
         padding="SAME") -> jnp.ndarray:
    w = p[name + ".weight"]  # HWIO
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_CONV_PRECISION)
    b = p.get(name + ".bias")
    if b is not None:
        out = out + b
    return out


def bn(p: Dict, name: str, x: jnp.ndarray) -> jnp.ndarray:
    mean = p[name + ".running_mean"]
    var = p[name + ".running_var"]
    scale = p[name + ".weight"]
    bias = p[name + ".bias"]
    inv = scale * jax.lax.rsqrt(var + BN_EPS)
    return x * inv + (bias - mean * inv)


def relu(x):
    return jnp.maximum(x, 0.0)


def max_pool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def resize_nearest_torch(x: jnp.ndarray, out_h: int,
                         out_w: int) -> jnp.ndarray:
    """torch F.interpolate(mode="nearest") semantics: index =
    floor(i * in/out).  jax.image.resize centers samples differently
    (half-pixel offsets), which shifts odd-size hourglass upsampling."""
    B, H, W, C = x.shape
    hi = jnp.floor(jnp.arange(out_h) * (H / out_h)).astype(jnp.int32)
    wi = jnp.floor(jnp.arange(out_w) * (W / out_w)).astype(jnp.int32)
    return x[:, hi][:, :, wi]


def pixel_shuffle_nhwc(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch nn.PixelShuffle semantics (channel index = c*r*r + i*r + j)
    in NHWC."""
    B, H, W, C = x.shape
    c = C // (r * r)
    x = x.reshape(B, H, W, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, H * r, W * r, c)


# ----------------------------------------------------------- bottleneck
def bottleneck(p, prefix, x, stride=1, has_downsample=False):
    """Pre-activation Bottleneck2D (lcnn_hourglass.py:34-72),
    expansion 2."""
    out = relu(bn(p, prefix + ".bn1", x))
    out = conv(p, prefix + ".conv1", out, padding="VALID")  # 1x1
    out = relu(bn(p, prefix + ".bn2", out))
    out = conv(p, prefix + ".conv2", out, stride=stride)    # 3x3
    out = relu(bn(p, prefix + ".bn3", out))
    out = conv(p, prefix + ".conv3", out, padding="VALID")  # 1x1
    residual = x
    if has_downsample:
        residual = conv(p, prefix + ".downsample.0", x, stride=stride,
                        padding="VALID")
    return out + residual


def residual_seq(p, prefix, x, n_blocks, first_downsample=False):
    for i in range(n_blocks):
        x = bottleneck(p, f"{prefix}.{i}", x,
                       has_downsample=(i == 0 and first_downsample))
    return x


# ------------------------------------------------------------ hourglass
def hourglass(p, prefix, x, depth, num_blocks):
    """Recursive hourglass (lcnn_hourglass.py:75-116); the reference's
    F.interpolate default is nearest-neighbour."""

    def seq(i, j, y):
        return residual_seq(p, f"{prefix}.hg.{i}.{j}", y, num_blocks)

    def fwd(n, y):
        up1 = seq(n - 1, 0, y)
        low1 = max_pool2(y)
        low1 = seq(n - 1, 1, low1)
        if n > 1:
            low2 = fwd(n - 1, low1)
        else:
            low2 = seq(0, 3, low1)
        low3 = seq(n - 1, 2, low2)
        up2 = resize_nearest_torch(low3, up1.shape[1], up1.shape[2])
        return up1 + up2

    return fwd(depth, x)


def multitask_head(p, prefix, x):
    """MultitaskHead with head_size [[2],[1],[2]]
    (lcnn_hourglass.py:12-31)."""
    outs = []
    for h in range(3):
        y = relu(conv(p, f"{prefix}.heads.{h}.0", x))
        y = conv(p, f"{prefix}.heads.{h}.2", y, padding="VALID")
        outs.append(y)
    return jnp.concatenate(outs, axis=-1)


# ------------------------------------------------------------- backbone
def hourglass_backbone(p, x, depth=4, num_stacks=2, num_blocks=1):
    """HourglassNet forward returning the final 256-ch feature map at
    1/4 resolution (lcnn_hourglass.py:196-227; HourglassBackbone keeps
    only ``net(x)[1]``, backbone.py:32)."""
    pre = "backbone_net.net"
    x = conv(p, pre + ".conv1", x, stride=2,
             padding=((3, 3), (3, 3)))          # 7x7 s2
    x = relu(bn(p, pre + ".bn1", x))
    x = residual_seq(p, pre + ".layer1", x, 1, first_downsample=True)
    x = max_pool2(x)
    x = residual_seq(p, pre + ".layer2", x, 1, first_downsample=True)
    x = residual_seq(p, pre + ".layer3", x, 1)
    y = x
    for i in range(num_stacks):
        y = hourglass(p, f"{pre}.hg.{i}", x, depth, num_blocks)
        y = residual_seq(p, f"{pre}.res.{i}", y, num_blocks)
        y = relu(bn(p, f"{pre}.fc.{i}.1",
                    conv(p, f"{pre}.fc.{i}.0", y, padding="VALID")))
        if i < num_stacks - 1:
            score = multitask_head(p, f"{pre}.score.{i}", y)
            fc_ = conv(p, f"{pre}.fc_.{i}", y, padding="VALID")
            score_ = conv(p, f"{pre}.score_.{i}", score, padding="VALID")
            x = x + fc_ + score_
    return y


# -------------------------------------------------------------- decoders
def junction_decoder(p, feat):
    """SuperpointDecoder for the lcnn backbone: strided convPa -> 65ch
    at 1/8 resolution (junction_decoder.py:8-31).  torch padding=1 with
    stride 2 pads (1, 1); XLA "SAME" would pad (0, 1) and shift every
    window by a pixel, so the padding is explicit."""
    y = relu(conv(p, "junction_decoder.convPa", feat, stride=2,
                  padding=((1, 1), (1, 1))))
    return conv(p, "junction_decoder.convPb", y, padding="VALID")


def heatmap_decoder(p, feat):
    """PixelShuffleDecoder, num_upsample=2, output 2ch at full
    resolution (heatmap_decoder.py)."""
    y = relu(bn(p, "heatmap_decoder.conv_block_lst.0.1",
                conv(p, "heatmap_decoder.conv_block_lst.0.0", feat)))
    y = pixel_shuffle_nhwc(y, 2)
    y = relu(bn(p, "heatmap_decoder.conv_block_lst.1.1",
                conv(p, "heatmap_decoder.conv_block_lst.1.0", y)))
    y = pixel_shuffle_nhwc(y, 2)
    return conv(p, "heatmap_decoder.conv_block_lst.2", y, padding="VALID")


def descriptor_decoder(p, feat):
    """SuperpointDescriptor: 128-d descriptor grid at 1/4 resolution
    (descriptor_decoder.py)."""
    y = relu(conv(p, "descriptor_decoder.convPa", feat))
    return conv(p, "descriptor_decoder.convPb", y, padding="VALID")


def sold2_forward(p: Dict, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Full SOLD2Net forward (model_util.py:96-110).

    image: [B, H, W, 1] grayscale in [0, 1].  H, W must be multiples of
    the grid size (8).  Returns NHWC maps: junctions [B, H/8, W/8, 65],
    heatmap [B, H, W, 2], descriptors [B, H/4, W/4, 128].
    """
    feat = hourglass_backbone(p, image)
    return {
        "junctions": junction_decoder(p, feat),
        "heatmap": heatmap_decoder(p, feat),
        "descriptors": descriptor_decoder(p, feat),
    }


# ------------------------------------------------------------- weights
def _spec():
    """(torch_key, shape) list of the full lcnn_simple state dict
    (conv shapes in torch OIHW)."""
    spec = []

    def add_conv(name, o, i, k, bias=True):
        spec.append((name + ".weight", (o, i, k, k)))
        if bias:
            spec.append((name + ".bias", (o,)))

    def add_bn(name, c):
        for suffix in (".weight", ".bias", ".running_mean", ".running_var"):
            spec.append((name + suffix, (c,)))

    def add_bottleneck(prefix, inplanes, planes, downsample):
        add_bn(prefix + ".bn1", inplanes)
        add_conv(prefix + ".conv1", planes, inplanes, 1)
        add_bn(prefix + ".bn2", planes)
        add_conv(prefix + ".conv2", planes, planes, 3)
        add_bn(prefix + ".bn3", planes)
        add_conv(prefix + ".conv3", planes * 2, planes, 1)
        if downsample:
            add_conv(prefix + ".downsample.0", planes * 2, inplanes, 1)

    pre = "backbone_net.net"
    add_conv(pre + ".conv1", 64, 1, 7)
    add_bn(pre + ".bn1", 64)
    add_bottleneck(pre + ".layer1.0", 64, 64, True)
    add_bottleneck(pre + ".layer2.0", 128, 128, True)
    add_bottleneck(pre + ".layer3.0", 256, 128, False)
    depth, num_stacks = 4, 2
    for s in range(num_stacks):
        for i in range(depth):
            n_seq = 4 if i == 0 else 3
            for j in range(n_seq):
                add_bottleneck(f"{pre}.hg.{s}.hg.{i}.{j}.0", 256, 128,
                               False)
        add_bottleneck(f"{pre}.res.{s}.0", 256, 128, False)
        add_conv(f"{pre}.fc.{s}.0", 256, 256, 1)
        add_bn(f"{pre}.fc.{s}.1", 256)
        for h, oc in enumerate((2, 1, 2)):
            add_conv(f"{pre}.score.{s}.heads.{h}.0", 64, 256, 3)
            add_conv(f"{pre}.score.{s}.heads.{h}.2", oc, 64, 1)
        if s < num_stacks - 1:
            add_conv(f"{pre}.fc_.{s}", 256, 256, 1)
            add_conv(f"{pre}.score_.{s}", 256, 5, 1)
    add_conv("junction_decoder.convPa", 256, 256, 3)
    add_conv("junction_decoder.convPb", 65, 256, 1)
    add_conv("heatmap_decoder.conv_block_lst.0.0", 256, 256, 3)
    add_bn("heatmap_decoder.conv_block_lst.0.1", 256)
    add_conv("heatmap_decoder.conv_block_lst.1.0", 64, 64, 3)
    add_bn("heatmap_decoder.conv_block_lst.1.1", 64)
    add_conv("heatmap_decoder.conv_block_lst.2", 2, 16, 1)
    add_conv("descriptor_decoder.convPa", 256, 256, 3)
    add_conv("descriptor_decoder.convPb", 128, 256, 1)
    return spec


def convert_torch_value(key: str, value: np.ndarray) -> np.ndarray:
    """torch tensor layout -> ours (OIHW conv kernels to HWIO)."""
    v = np.asarray(value, np.float32)
    if key.endswith(".weight") and v.ndim == 4:
        return np.transpose(v, (2, 3, 1, 0))
    return v


def load_torch_state_dict(sd: Dict[str, "np.ndarray"]) -> Dict[str,
                                                               jnp.ndarray]:
    """Convert a torch SOLD2 checkpoint state dict (sold2_wireframe.tar
    stores it under ``model_state_dict``) into our parameter mapping."""
    params = {}
    for key, shape in _spec():
        if key not in sd:
            raise KeyError(f"missing checkpoint entry {key} "
                           f"(expected shape {shape})")
        v = np.asarray(sd[key])
        if tuple(v.shape) != tuple(shape):
            raise ValueError(
                f"{key}: checkpoint shape {tuple(v.shape)} != {shape}")
        params[key] = jnp.asarray(convert_torch_value(key, v))
    return params


def init_params(seed: int = 0) -> Dict[str, jnp.ndarray]:
    """Random parameters with the exact checkpoint key/shape layout
    (for tests and weight-free smoke runs)."""
    rng = np.random.default_rng(seed)
    params = {}
    for key, shape in _spec():
        if key.endswith(".running_var"):
            v = np.ones(shape, np.float32)
        elif key.endswith((".running_mean", ".bias")):
            v = np.zeros(shape, np.float32)
            if key.endswith(".bias") and "bn" not in key:
                v = rng.normal(0, 0.01, shape).astype(np.float32)
        elif key.endswith(".weight") and len(shape) == 1:
            v = np.ones(shape, np.float32)
        else:
            fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else 1
            v = rng.normal(0, (2.0 / fan_in) ** 0.5, shape).astype(
                np.float32)
        params[key] = jnp.asarray(convert_torch_value(key, v))
    return params
