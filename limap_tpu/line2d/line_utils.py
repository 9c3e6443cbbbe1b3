"""2D segment merging (reference: line2d/line_utils/merge_lines used via
base_detector.py:177-183, DeepLSD-style).

Merges collinear nearby segments with the same machinery as 3D track
building: a batched 2D linker evaluation proposes merge edges, connected
components group them, and each group is re-fit by principal direction
with extreme projections as endpoints.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from limap_tpu.base.line_linker import LineLinker2dConfig, check_2d
from limap_tpu.base.lines import Segments
from limap_tpu.ops.hostops import group_by_labels, union_find


def merge_lines(segs: np.ndarray,
                th_angle: float = 4.0,
                th_perp: float = 3.0,
                th_gap: float = 20.0) -> np.ndarray:
    """Merge near-collinear 2D segments; segs (N, >=4) -> (M, 4).

    Two segments merge when their directions agree within ``th_angle``
    degrees, mutual perpendicular distance is below ``th_perp`` px, and
    the along-line gap is below ``th_gap`` px.
    """
    segs = np.asarray(segs, np.float64)
    n = len(segs)
    if n <= 1:
        return segs[:, :4]
    seg = Segments(jnp.asarray(segs[:, :2], jnp.float32),
                   jnp.asarray(segs[:, 2:4], jnp.float32))

    from limap_tpu.base import line_dists as ld
    a = Segments(seg.start[:, None], seg.end[:, None])
    b = Segments(seg.start[None, :], seg.end[None, :])
    ang_ok = ld.angle(a, b) <= th_angle
    perp_ok = ld.dist_endpoints_perpendicular_oneway(a, b) <= th_perp
    gap_ok = ld.dist_minpoint(a, b) <= th_gap
    ok = np.array(ang_ok & perp_ok & gap_ok)
    np.fill_diagonal(ok, False)
    edges = np.argwhere(np.triu(ok & ok.T, k=1))

    labels = union_find(n, edges.reshape(-1, 2))
    ids, offsets = group_by_labels(labels, np.ones(n, bool))
    out = []
    endpoints = segs[:, :4].reshape(n, 2, 2)
    for g in range(len(offsets) - 1):
        members = ids[offsets[g]:offsets[g + 1]]
        pts = endpoints[members].reshape(-1, 2)
        if len(members) == 1:
            out.append(segs[members[0], :4])
            continue
        center = pts.mean(0)
        u, _, _ = np.linalg.svd((pts - center).T @ (pts - center))
        d = u[:, 0]
        t = (pts - center) @ d
        out.append(np.concatenate([center + t.min() * d,
                                   center + t.max() * d]))
    return np.stack(out)
