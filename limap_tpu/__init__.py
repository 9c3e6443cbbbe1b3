"""limap_tpu — a TPU-native 3D line mapping and visual localization engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of cvg/limap
("3D Line Mapping Revisited", CVPR 2023).  Where the reference runs
per-item C++ loops (OpenMP) over object graphs and solves its nonlinear
problems with Ceres, this engine represents every quantity as fixed-shape
batched arrays (lines as ``[N, 4]`` / ``[N, 6]`` tensors, tracks as padded
index sets), runs all geometry as vectorized jitted kernels, and solves
refinement / bundle adjustment with a batched Levenberg-Marquardt engine
that shards across a ``jax.sharding.Mesh``.

Subpackages mirror the reference's layer map (see SURVEY.md §1):

- :mod:`limap_tpu.base` — core geometry types and batched primitives
  (lines, infinite lines / Plücker, distances, linkers, cameras,
  image collections, tracks, connected components).
- :mod:`limap_tpu.triangulation` — two-view proposal generators and the
  global multi-view triangulator.
- :mod:`limap_tpu.merging` — track building, aggregation, filtering.
- :mod:`limap_tpu.fitting` — depth-based 3D segment fitting (RANSAC).
- :mod:`limap_tpu.optimize` — batched LM bundle adjustment, per-track
  refinement, hybrid (point+line) localization.
- :mod:`limap_tpu.estimators` — PnP(L) absolute pose estimation.
- :mod:`limap_tpu.vplib` — vanishing point detection and tracks.
- :mod:`limap_tpu.structures` — point-line bipartite structures.
- :mod:`limap_tpu.pointsfm` — SfM model readers and visual-neighbor logic.
- :mod:`limap_tpu.line2d` / :mod:`limap_tpu.point2d` — 2D feature front-end.
- :mod:`limap_tpu.runners` — end-to-end pipelines.
- :mod:`limap_tpu.parallel` — multi-chip sharding utilities.
- :mod:`limap_tpu.util` — config / IO / evaluation helpers.
"""

__version__ = "0.1.0"

import os as _os


def _enable_persistent_compilation_cache() -> None:
    """Point XLA at an on-disk compilation cache.

    The fused mapping kernels take minutes to compile on a remote TPU
    backend; the persistent cache cuts warm-process startup to seconds.
    Opt out with ``LIMAP_TPU_COMPILATION_CACHE=0``.  A user-set
    ``JAX_COMPILATION_CACHE_DIR`` always wins.
    """
    if _os.environ.get("LIMAP_TPU_COMPILATION_CACHE", "1") == "0":
        return
    import jax

    # one cache per backend selection: AOT results compiled for another
    # machine's CPU features would otherwise be loaded (and can SIGILL)
    suffix = _os.environ.get("JAX_PLATFORMS", "default").replace(",", "_") \
        or "default"
    path = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache",
                      f"limap_tpu_xla_{suffix}"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # older jax without the option: run uncached
        pass


_enable_persistent_compilation_cache()

from limap_tpu import base  # noqa: F401,E402
