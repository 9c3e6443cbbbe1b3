"""Feature-track graph API (reference: src/limap/base/graph.h:48-96).

The heavy lifting (union-find over scored edges) runs on TPU via
:mod:`limap_tpu.ops.connected_components`; this module provides the
object-level Graph surface for API parity and small host-side uses.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from limap_tpu.ops.hostops import union_find as union_find_numpy


class PatchNode:
    """(image_idx, line_idx) node (graph.h:23-35)."""

    def __init__(self, image_idx: int, line_idx: int, node_idx: int = -1):
        self.image_idx = image_idx
        self.line_idx = line_idx
        self.node_idx = node_idx
        self.out_edges: List[int] = []
        self.in_edges: List[int] = []


class Edge:
    def __init__(self, node_idx1: int, node_idx2: int, sim: float):
        self.node_idx1 = node_idx1
        self.node_idx2 = node_idx2
        self.sim = sim


class Graph:
    """Undirected scored graph with track computation (graph.h:48-80)."""

    def __init__(self):
        self.nodes: List[PatchNode] = []
        self.node_map: Dict[Tuple[int, int], int] = {}
        self.undirected_edges: List[Edge] = []

    def FindOrCreateNode(self, image_idx: int, line_idx: int) -> PatchNode:
        key = (image_idx, line_idx)
        if key not in self.node_map:
            node = PatchNode(image_idx, line_idx, len(self.nodes))
            self.node_map[key] = len(self.nodes)
            self.nodes.append(node)
        return self.nodes[self.node_map[key]]

    def GetNodeID(self, image_idx: int, line_idx: int) -> int:
        return self.node_map.get((image_idx, line_idx), -1)

    def AddEdge(self, node1: PatchNode, node2: PatchNode,
                sim: float = 1.0) -> None:
        e = Edge(node1.node_idx, node2.node_idx, sim)
        node1.out_edges.append(len(self.undirected_edges))
        node2.in_edges.append(len(self.undirected_edges))
        self.undirected_edges.append(e)

    def Clear(self) -> None:
        self.nodes.clear()
        self.node_map.clear()
        self.undirected_edges.clear()


def compute_track_labels(graph: Graph) -> np.ndarray:
    """Union-find track labels, score-descending edge order
    (graph.h:82-87 ComputeTrackLabels; the unconditional merge makes the
    result the connected components).  Tracks need >= 2 nodes; singleton
    nodes get label -1 like the reference."""
    n = len(graph.nodes)
    edges = np.asarray([[e.node_idx1, e.node_idx2]
                        for e in graph.undirected_edges]).reshape(-1, 2)
    roots = union_find_numpy(n, edges)
    labels = np.full(n, -1, np.int64)
    deg = np.zeros(n, np.int64)
    if len(edges):
        np.add.at(deg, edges.reshape(-1), 1)
    next_label = 0
    root_label: Dict[int, int] = {}
    for i in range(n):
        if deg[i] == 0:
            continue
        r = int(roots[i])
        if r not in root_label:
            root_label[r] = next_label
            next_label += 1
        labels[i] = root_label[r]
    return labels


def union_find_get_root(node_idx: int, parent_nodes: List[int]) -> int:
    """(graph.h:89-96)."""
    while parent_nodes[node_idx] != -1:
        node_idx = parent_nodes[node_idx]
    return node_idx
