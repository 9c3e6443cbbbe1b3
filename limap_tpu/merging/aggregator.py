"""Endpoint aggregation: many 3D segments -> one representative segment.

Batched re-design of /root/reference/src/limap/merging/aggregator.cc:
tracks with >= 4 supports get a total-least-squares direction (principal
eigenvector of the endpoint scatter), endpoints from trimmed extreme
projections; smaller tracks take the best-scored support.  All tracks are
processed in a single kernel over ``[T, S]`` padded supports — the 3x3
eigendecomposition is closed-form-friendly and batches on the VPU,
replacing per-track JacobiSVD calls.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from limap_tpu.base.lines import EPS, Segments

_BIG = jnp.float32(1e30)


def principal_direction(points: jnp.ndarray, mask: jnp.ndarray,
                        center: jnp.ndarray = None):
    """Principal axis of masked points [..., P, 3] -> unit [..., 3].

    Uses eigh on the 3x3 scatter matrix (batched, TPU-supported) instead
    of an SVD over the [P, 3] stack (aggregator.cc:70-78).
    """
    m = mask[..., None].astype(points.dtype)
    cnt = jnp.sum(m, axis=-2)
    if center is None:
        center = jnp.sum(points * m, axis=-2) / jnp.maximum(cnt, 1.0)
    centered = (points - center[..., None, :]) * m
    cov = jnp.einsum("...pi,...pj->...ij", centered, centered)
    # eigh returns ascending eigenvalues; principal = last column
    _, vecs = jnp.linalg.eigh(cov)
    direc = vecs[..., :, 2]
    return direc / (jnp.linalg.norm(direc, axis=-1, keepdims=True) + EPS), \
        center


@partial(jax.jit, static_argnums=(3,))
def aggregate_tracks(line3d: Segments, scores: jnp.ndarray,
                     mask: jnp.ndarray, num_outliers: int = 2) -> Segments:
    """Aggregate supports -> representative segments, batched over tracks.

    Args:
      line3d: supports; fields [T, S, 3] (uncertainty optional [T, S]).
      scores: [T, S].
      mask:   [T, S] bool.
      num_outliers: trimmed endpoints per side for the TLS branch; the
        trim count is scaled down for small tracks exactly like the
        reference indexes ``values[num_outliers]`` on 2*n values.

    Returns Segments with fields [T, 3] (+ min-uncertainty if available).
    """
    T, S = mask.shape
    fmask = mask.astype(line3d.start.dtype)
    cnt = jnp.sum(mask, axis=1)  # [T]

    # ---- branch A: take best score (aggregator.cc:8-29) ----
    neg = jnp.where(mask, scores, -_BIG)
    best = jnp.argmax(neg, axis=1)  # [T]
    rows = jnp.arange(T)
    best_start = line3d.start[rows, best]
    best_end = line3d.end[rows, best]

    # ---- branch B: TLS + trimmed extremes (aggregator.cc:53-101) ----
    endpoints = jnp.concatenate([line3d.start, line3d.end], axis=1)  # [T,2S,3]
    ep_mask = jnp.concatenate([mask, mask], axis=1)
    direc, center = principal_direction(endpoints, ep_mask)
    proj = jnp.sum((endpoints - center[:, None]) * direc[:, None], axis=-1)
    lo_sorted = jnp.sort(jnp.where(ep_mask, proj, _BIG), axis=1)
    hi_sorted = jnp.sort(jnp.where(ep_mask, proj, -_BIG), axis=1)
    n_valid = 2 * cnt
    k = jnp.clip(num_outliers, 0, jnp.maximum((n_valid - 1) // 2, 0))
    t_lo = jnp.take_along_axis(lo_sorted, k[:, None], axis=1)[:, 0]
    t_hi = jnp.take_along_axis(hi_sorted, (2 * S - 1 - k)[:, None],
                               axis=1)[:, 0]
    tls_start = center + direc * t_lo[:, None]
    tls_end = center + direc * t_hi[:, None]

    use_tls = (cnt >= 4)[:, None]
    start = jnp.where(use_tls, tls_start, best_start)
    end = jnp.where(use_tls, tls_end, best_end)

    uncertainty = None
    if line3d.uncertainty is not None:
        u = jnp.where(mask, line3d.uncertainty, _BIG)
        uncertainty = jnp.min(u, axis=1)
    return Segments(start=start, end=end, uncertainty=uncertainty)
