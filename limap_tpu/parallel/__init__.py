"""Multi-chip sharding: meshes, distributed hybrid BA, multi-host
driver."""

from limap_tpu.parallel import distributed
from limap_tpu.parallel.mesh import (TRACK_AXIS, make_mesh, replicated,
                                     track_sharding)
from limap_tpu.parallel.hybrid_ba_driver import \
    solve_hybrid_bundle_adjustment
from limap_tpu.parallel.sharded_ba import (HybridBAOptions, HybridBAState,
                                           make_hybrid_ba_cost,
                                           make_hybrid_ba_step)

__all__ = ["TRACK_AXIS", "make_mesh", "replicated", "track_sharding",
           "HybridBAOptions", "HybridBAState", "make_hybrid_ba_cost",
           "make_hybrid_ba_step",
           "solve_hybrid_bundle_adjustment", "distributed"]
