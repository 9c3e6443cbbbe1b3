"""Connected components / union-find on TPU via label propagation.

The reference builds tracks with a serial union-find over score-sorted
edges (/root/reference/src/limap/base/graph.h:82-96 and
merging/merging.cc:18-104).  Because its default "greedy" strategy merges
across *every* edge unconditionally, the resulting partition is exactly
the connected components of the edge graph — which we compute here with
iterative min-label propagation + pointer jumping, a fully parallel,
fixed-shape algorithm that XLA maps onto the VPU.

All functions are jittable; edge lists are padded with ``mask``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(0,))
def connected_components(n_nodes: int, edges: jnp.ndarray,
                         edge_mask: jnp.ndarray) -> jnp.ndarray:
    """Labels [n_nodes] int32; each component tagged by its min node id.

    Args:
      n_nodes: static number of nodes.
      edges: [E, 2] int32 endpoints (padded entries arbitrary).
      edge_mask: [E] bool, False entries ignored.

    Runs alternating hook (scatter-min across edges) and full pointer
    jumping (log-doubling) inside a ``lax.while_loop`` until fixpoint —
    O(log n) rounds in practice.
    """
    labels0 = jnp.arange(n_nodes, dtype=jnp.int32)
    u = jnp.where(edge_mask, edges[:, 0], 0).astype(jnp.int32)
    v = jnp.where(edge_mask, edges[:, 1], 0).astype(jnp.int32)

    def hook(labels):
        lu = labels[u]
        lv = labels[v]
        lmin = jnp.minimum(lu, lv)
        # parent[max_label] <- min_label over all its edges
        labels = labels.at[lu].min(jnp.where(edge_mask, lmin, lu))
        labels = labels.at[lv].min(jnp.where(edge_mask, lmin, lv))
        return labels

    def shortcut(labels):
        # pointer jumping to full convergence (log-doubling)
        def body(_, lab):
            return lab[lab]

        n_rounds = max(int(n_nodes).bit_length(), 1)
        return jax.lax.fori_loop(0, n_rounds, body, labels)

    def cond(state):
        labels, changed = state
        return changed

    def step(state):
        labels, _ = state
        new = shortcut(hook(labels))
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(
        cond, step, (labels0, jnp.asarray(True)))
    return labels


@jax.jit
def compact_labels(labels: jnp.ndarray, node_mask=None):
    """Relabel component ids to dense [0, n_comp); masked nodes get -1.

    Returns (dense_labels, n_components).  Jittable (fixed shapes).
    """
    n = labels.shape[0]
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    is_root = (labels == jnp.arange(n, dtype=labels.dtype)) & node_mask
    dense_of_root = jnp.cumsum(is_root.astype(jnp.int32)) - 1
    dense = jnp.where(node_mask, dense_of_root[labels], -1)
    return dense, jnp.sum(is_root.astype(jnp.int32))


def count_component_sizes(dense_labels: jnp.ndarray, max_components: int):
    """Histogram of component sizes; label -1 entries ignored."""
    valid = dense_labels >= 0
    lab = jnp.where(valid, dense_labels, 0)
    return jnp.zeros((max_components,), jnp.int32).at[lab].add(
        valid.astype(jnp.int32))


def union_find_numpy(n_nodes, edges):
    """Host-side exact union-find (for tests / tiny inputs)."""
    import numpy as np

    parent = np.arange(n_nodes)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n_nodes)])
