"""Mesh evaluator: sample-to-triangle distances
(reference: evaluation/mesh_evaluator.{h,cc} via libigl).

Batched point-to-triangle distance in JAX (chunked over triangles, same
streaming pattern as the point-cloud evaluator) — no libigl needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.base.lines import Segments
from limap_tpu.evaluation.evaluator import sample_points_on_segments


def point_triangle_distance(p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                            c: jnp.ndarray) -> jnp.ndarray:
    """Distance from points [..., 3] to triangles [..., 3] (broadcast).

    Branch-free barycentric clamping (Ericson, Real-Time Collision
    Detection §5.1.5 restructured with where-selects).
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = va + vb + vc

    # interior projection
    v = vb / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    w = vc / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    p_face = a + v[..., None] * ab + w[..., None] * ac

    # edge/vertex projections
    t_ab = jnp.clip(d1 / jnp.where(jnp.abs(d1 - d3) < 1e-12, 1e-12,
                                   d1 - d3), 0, 1)
    p_ab = a + t_ab[..., None] * ab
    t_ac = jnp.clip(d2 / jnp.where(jnp.abs(d2 - d6) < 1e-12, 1e-12,
                                   d2 - d6), 0, 1)
    p_ac = a + t_ac[..., None] * ac
    t_bc = jnp.clip((d4 - d3) / jnp.where(
        jnp.abs((d4 - d3) + (d5 - d6)) < 1e-12, 1e-12,
        (d4 - d3) + (d5 - d6)), 0, 1)
    p_bc = b + t_bc[..., None] * (c - b)

    in_vert_a = (d1 <= 0) & (d2 <= 0)
    in_vert_b = (d3 >= 0) & (d4 <= d3)
    in_vert_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    closest = p_face
    closest = jnp.where(on_bc[..., None], p_bc, closest)
    closest = jnp.where(on_ac[..., None], p_ac, closest)
    closest = jnp.where(on_ab[..., None], p_ab, closest)
    closest = jnp.where(in_vert_c[..., None], c, closest)
    closest = jnp.where(in_vert_b[..., None], b, closest)
    closest = jnp.where(in_vert_a[..., None], a, closest)
    return jnp.linalg.norm(p - closest, axis=-1)


@partial(jax.jit, static_argnums=(2,))
def _min_dist_to_mesh(points: jnp.ndarray, tris: jnp.ndarray,
                      chunk: int = 2048) -> jnp.ndarray:
    """points [P, 3], tris [M, 3, 3] -> min distance [P]."""
    M = tris.shape[0]
    n_chunks = (M + chunk - 1) // chunk
    pad = n_chunks * chunk - M
    tris = jnp.pad(tris, ((0, pad), (0, 0), (0, 0)),
                   constant_values=1e9)
    tris = tris.reshape(n_chunks, chunk, 3, 3)

    def body(carry, block):
        d = point_triangle_distance(points[:, None],
                                    block[None, :, 0],
                                    block[None, :, 1],
                                    block[None, :, 2])
        return jnp.minimum(carry, jnp.min(d, axis=1)), None

    init = jnp.full((points.shape[0],), jnp.inf)
    best, _ = jax.lax.scan(body, init, tris)
    return best


class MeshEvaluator:
    """Line-map evaluation vs a GT triangle mesh."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        v = np.asarray(vertices, np.float32)
        f = np.asarray(faces, np.int64)
        self.tris = jnp.asarray(v[f])  # [M, 3, 3]

    def ComputeDistPoint(self, p) -> float:
        return float(_min_dist_to_mesh(
            jnp.asarray(p, jnp.float32)[None], self.tris)[0])

    def ComputeDistsLine(self, seg: Segments, n_samples: int = 1000):
        samples = sample_points_on_segments(seg, n_samples).reshape(-1, 3)
        d = _min_dist_to_mesh(samples, self.tris)
        return d.reshape(seg.start.shape[0], n_samples)

    def ComputeInlierRatio(self, seg: Segments, threshold: float,
                           n_samples: int = 1000):
        d = self.ComputeDistsLine(seg, n_samples)
        return jnp.mean((d <= threshold).astype(jnp.float32), axis=1)
