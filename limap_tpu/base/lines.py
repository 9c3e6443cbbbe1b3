"""Batched 2D/3D line segment primitives.

The reference stores segments as ``Line2d`` / ``Line3d`` objects
(/root/reference/src/limap/base/linebase.h:16,37).  Here segments live in
structure-of-arrays form: a :class:`Segments` pytree with ``start`` /
``end`` arrays of shape ``[..., D]`` plus optional per-segment ``score``,
``depths`` (3D only, depth of both endpoints in the source view) and
``uncertainty`` channels.  Every helper broadcasts over leading batch
dimensions and is jit/vmap-safe.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

EPS = 1e-12


class Segments(NamedTuple):
    """A batch of line segments (2D if D==2, 3D if D==3).

    Fields broadcast together; ``score``/``depths``/``uncertainty`` may be
    None.  ``depths`` has shape [..., 2] (start/end depth in the source
    perspective image, cf. linebase.h:46).
    """

    start: jnp.ndarray  # [..., D]
    end: jnp.ndarray    # [..., D]
    score: Optional[jnp.ndarray] = None        # [...]
    depths: Optional[jnp.ndarray] = None       # [..., 2] (3D only)
    uncertainty: Optional[jnp.ndarray] = None  # [...] (3D only)

    @property
    def dim(self) -> int:
        return self.start.shape[-1]

    # ---- geometry (linebase.h:24-31) ----
    def length(self) -> jnp.ndarray:
        return jnp.linalg.norm(self.end - self.start, axis=-1)

    def midpoint(self) -> jnp.ndarray:
        return 0.5 * (self.start + self.end)

    def direction(self) -> jnp.ndarray:
        d = self.end - self.start
        return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + EPS)

    def perp_direction(self) -> jnp.ndarray:
        """2D only: direction rotated by -90 deg (linebase.h:27-30)."""
        d = self.direction()
        return jnp.stack([d[..., 1], -d[..., 0]], axis=-1)

    def coords(self) -> jnp.ndarray:
        """2D only: normalized homogeneous line coordinates [..., 3].

        cross(homogeneous(start), homogeneous(end)), normalized
        (linebase.cc:35-39).
        """
        s = jnp.concatenate(
            [self.start, jnp.ones_like(self.start[..., :1])], axis=-1)
        e = jnp.concatenate(
            [self.end, jnp.ones_like(self.end[..., :1])], axis=-1)
        c = jnp.cross(s, e)
        return c / (jnp.linalg.norm(c, axis=-1, keepdims=True) + EPS)

    def point_projection(self, p: jnp.ndarray) -> jnp.ndarray:
        """Project point(s) onto the segment, clamped to the endpoints."""
        d = self.direction()
        t = jnp.sum((p - self.start) * d, axis=-1)
        t = jnp.clip(t, 0.0, self.length())
        return self.start + t[..., None] * d

    def point_distance(self, p: jnp.ndarray) -> jnp.ndarray:
        return jnp.linalg.norm(p - self.point_projection(p), axis=-1)

    # ---- array conversion ----
    def as_array(self) -> jnp.ndarray:
        """[..., 2, D] endpoint array (linebase as_array layout)."""
        return jnp.stack([self.start, self.end], axis=-2)

    def as_flat(self) -> jnp.ndarray:
        """[..., 2*D] concatenated (x1 y1 [z1] x2 y2 [z2])."""
        return jnp.concatenate([self.start, self.end], axis=-1)

    @classmethod
    def from_flat(cls, arr, score=None, depths=None,
                  uncertainty=None) -> "Segments":
        """Build from [..., 4] (2D) or [..., >=6] (3D) flat arrays.

        A trailing 5th column of a 2D array is interpreted as the score
        (LSD-style N x 5 output, cf. base/functions.py:4-20 in the
        reference).
        """
        arr = jnp.asarray(arr)
        n = arr.shape[-1]
        if n == 4 or n == 5:
            d = 2
        elif n >= 6:
            d = 3
        else:
            raise ValueError(f"bad segment array width {n}")
        if n == 5 and score is None:
            score = arr[..., 4]
        return cls(start=arr[..., :d], end=arr[..., d:2 * d], score=score,
                   depths=depths, uncertainty=uncertainty)

    def select(self, idx) -> "Segments":
        """Gather a subset/reordering along the leading axis."""
        take = lambda x: None if x is None else x[idx]
        return Segments(self.start[idx], self.end[idx], take(self.score),
                        take(self.depths), take(self.uncertainty))


def segments2d_from_numpy(segs: np.ndarray) -> Segments:
    """Host-side constructor from an (N, 4) or (N, 5) detection array."""
    segs = np.asarray(segs, dtype=np.float32)
    if segs.ndim != 2 or segs.shape[-1] not in (4, 5):
        raise ValueError(f"expected (N,4|5) array, got {segs.shape}")
    return Segments.from_flat(segs)


def pad_segments(segs: Segments, n: int, fill: float = 0.0):
    """Pad a batch of segments along the leading axis to length ``n``.

    Returns (padded_segments, mask) where ``mask`` is [n] boolean with
    True on real entries.  Padded entries get zero-length segments.
    """
    cur = segs.start.shape[0]
    if cur > n:
        raise ValueError(f"cannot pad {cur} segments down to {n}")
    pad = n - cur

    def _pad(x, extra_dims):
        if x is None:
            return None
        width = [(0, pad)] + [(0, 0)] * extra_dims
        return jnp.pad(x, width, constant_values=fill)

    out = Segments(
        start=_pad(segs.start, 1),
        end=_pad(segs.end, 1),
        score=_pad(segs.score, 0),
        depths=_pad(segs.depths, 1),
        uncertainty=_pad(segs.uncertainty, 0),
    )
    mask = jnp.arange(n) < cur
    return out, mask
