"""Alternative track-label strategies: "exhaustive" and "avg".

The default "greedy" strategy is order-independent (pure connected
components, computed on-device).  These two test candidate merges with
the 3D linker before accepting (merging.cc:105-345), which makes them
order-dependent Kruskal variants — kept host-side over score-sorted
edges for exact reference semantics, with the linker checks evaluated
in batch per union.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from limap_tpu.base.line_linker import LineLinker3dConfig, check_3d
from limap_tpu.base import line_dists as ld
from limap_tpu.base.lines import Segments


def _roots_init(n):
    return list(range(n))


def _find(parent, x):
    while parent[x] != x:
        parent[x] = parent[parent[x]]
        x = parent[x]
    return x


def compute_track_labels_avg(edges: np.ndarray, scores: np.ndarray,
                             node_lines: np.ndarray, image_idx: np.ndarray,
                             linker3d: LineLinker3dConfig) -> np.ndarray:
    """"avg" strategy (merging.cc:228-345): merge only if the running
    average lines of the two unions pass the avgtest linker."""
    cfg = linker3d.to_avgtest_merging()
    n = len(node_lines)
    order = np.argsort(-np.asarray(scores), kind="stable")
    parent = _roots_init(n)
    avg = {i: (node_lines[i].astype(np.float64), 1) for i in range(n)}
    size = {i: 1 for i in range(n)}

    def linker_ok(l1, l2):
        a = Segments(jnp.asarray(l1[0], jnp.float32)[None],
                     jnp.asarray(l1[1], jnp.float32)[None])
        b = Segments(jnp.asarray(l2[0], jnp.float32)[None],
                     jnp.asarray(l2[1], jnp.float32)[None])
        return bool(np.asarray(check_3d(a, b, cfg))[0])

    for e in order:
        a, b = int(edges[e][0]), int(edges[e][1])
        ra, rb = _find(parent, a), _find(parent, b)
        if ra == rb:
            continue
        la, ca = avg[ra]
        lb, cb = avg[rb]
        if not linker_ok(la, lb):
            continue
        if size[ra] < size[rb]:
            ra, rb = rb, ra
            la, ca, lb, cb = lb, cb, la, ca
        parent[rb] = ra
        new = ((la * ca + lb * cb) / (ca + cb), ca + cb)
        avg[ra] = new
        size[ra] += size[rb]

    return _labels_from_parents(parent, edges)


def compute_track_labels_exhaustive(edges: np.ndarray, scores: np.ndarray,
                                    node_lines: np.ndarray,
                                    image_idx: np.ndarray,
                                    linker3d: LineLinker3dConfig
                                    ) -> np.ndarray:
    """"exhaustive" strategy (merging.cc:105-226): all overlapping pairs
    across the two unions must pass the avgtest linker.  The pairwise
    check of each candidate merge runs as one batched linker kernel."""
    cfg = linker3d.to_avgtest_merging()
    n = len(node_lines)
    order = np.argsort(-np.asarray(scores), kind="stable")
    parent = _roots_init(n)
    members = {i: [i] for i in range(n)}

    lines = Segments(jnp.asarray(node_lines[:, 0], jnp.float32),
                     jnp.asarray(node_lines[:, 1], jnp.float32))

    for e in order:
        a, b = int(edges[e][0]), int(edges[e][1])
        ra, rb = _find(parent, a), _find(parent, b)
        if ra == rb:
            continue
        ia = np.asarray(members[ra])
        ib = np.asarray(members[rb])
        la = Segments(lines.start[ia][:, None], lines.end[ia][:, None])
        lb = Segments(lines.start[ib][None, :], lines.end[ib][None, :])
        overlap = np.asarray(ld.compute_overlap(la, lb)) > 0
        ok = np.asarray(check_3d(la, lb, cfg))
        if np.any(overlap & ~ok):
            continue
        if len(members[ra]) < len(members[rb]):
            ra, rb = rb, ra
        parent[rb] = ra
        members[ra] = members[ra] + members[rb]
        del members[rb]

    return _labels_from_parents(parent, edges)


def _labels_from_parents(parent: List[int], edges: np.ndarray) -> np.ndarray:
    n = len(parent)
    roots = np.asarray([_find(parent, i) for i in range(n)])
    # only nodes participating in a merged component (>= 2 nodes) keep
    # labels; singletons get -1 (merging.cc:81-101)
    counts = np.bincount(roots, minlength=n)
    labels = np.full(n, -1, np.int64)
    next_label = 0
    root_map = {}
    for i in range(n):
        r = int(roots[i])
        if counts[r] < 2:
            continue
        if r not in root_map:
            root_map[r] = next_label
            next_label += 1
        labels[i] = root_map[r]
    return labels
