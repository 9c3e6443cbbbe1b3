"""Low-level TPU ops: connected components, polynomial solvers, kernels."""

from limap_tpu.ops import connected_components
from limap_tpu.ops.connected_components import (compact_labels,
                                                count_component_sizes)

__all__ = ["connected_components", "compact_labels", "count_component_sizes"]
