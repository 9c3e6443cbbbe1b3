"""Native host ops with transparent build + NumPy fallback.

See limap_tpu/cpp/hostops.cpp.  Import never fails: if the toolchain is
unavailable the pure-NumPy implementations take over.
"""

from __future__ import annotations

import os
import sys

import numpy as np

_native = None


def _load():
    global _native
    if _native is not None:
        return _native
    try:
        from limap_tpu.cpp.build import build
        build()
        cpp_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "cpp")
        if cpp_dir not in sys.path:
            sys.path.insert(0, cpp_dir)
        import _hostops
        _native = _hostops
    except Exception:
        _native = False
    return _native


def union_find(n: int, edges: np.ndarray) -> np.ndarray:
    """Root labels (min node id per component) for an edge list."""
    edges = np.ascontiguousarray(np.asarray(edges,
                                            np.int64).reshape(-1, 2))
    native = _load()
    if native:
        return native.union_find(int(n), edges)
    from limap_tpu.ops.connected_components import union_find_numpy
    return union_find_numpy(n, edges).astype(np.int64)


def group_by_labels(labels: np.ndarray, valid: np.ndarray):
    """(sorted_node_ids, group_offsets) over valid nodes by label."""
    labels = np.ascontiguousarray(np.asarray(labels, np.int64))
    valid = np.ascontiguousarray(np.asarray(valid, bool))
    native = _load()
    if native:
        return native.group_by_labels(labels, valid)
    ids = np.nonzero(valid)[0]
    lab = labels[ids]
    order = np.argsort(lab, kind="stable")
    ids = ids[order]
    lab = lab[order]
    splits = np.nonzero(np.diff(lab))[0] + 1
    offsets = np.concatenate([[0], splits, [len(ids)]]) if len(ids) else \
        np.asarray([0])
    return ids.astype(np.int64), offsets.astype(np.int64)


def pack_supports(sorted_ids: np.ndarray, offsets: np.ndarray, S: int):
    """Pad per-group ids to [G, S] (TrackBatch layout)."""
    sorted_ids = np.ascontiguousarray(np.asarray(sorted_ids, np.int64))
    offsets = np.ascontiguousarray(np.asarray(offsets, np.int64))
    native = _load()
    if native:
        return native.pack_supports(sorted_ids, offsets, int(S))
    G = len(offsets) - 1
    index = np.zeros((G, S), np.int64)
    mask = np.zeros((G, S), bool)
    for g in range(G):
        sel = sorted_ids[offsets[g]:offsets[g + 1]][:S]
        index[g, :len(sel)] = sel
        mask[g, :len(sel)] = True
    return index, mask


def bucket_scene(key: np.ndarray, vals: np.ndarray, n_rows: int,
                 T: int):
    """Stable bucket fill: (words int32 [n_rows, T] (-1 padded),
    overflow count).  Edge i lands in (key[i], running-count) order."""
    key = np.ascontiguousarray(np.asarray(key, np.int64))
    vals = np.ascontiguousarray(np.asarray(vals, np.int32))
    native = _load()
    if native:
        words, overflow = native.bucket_scene(key, vals, int(n_rows),
                                              int(T))
        return words.reshape(n_rows, T), int(overflow)
    # numpy fallback: stable sort + positional scatter
    order = np.argsort(key, kind="stable")
    ks = key[order]
    starts = np.searchsorted(ks, np.arange(n_rows))
    pos = np.arange(len(ks)) - starts[np.clip(ks, 0, n_rows - 1)]
    keep = (ks >= 0) & (ks < n_rows) & (pos < T)
    words = np.full((n_rows, T), -1, np.int32)
    words[ks[keep], pos[keep]] = vals[order][keep]
    overflow = int((np.bincount(ks[(ks >= 0) & (ks < n_rows)],
                                minlength=n_rows) - T).clip(0).sum())
    return words, overflow
