"""Multi-host execution driver.

The reference is strictly single-process (SURVEY §2.3).  Here scaling
across hosts is first-class: one SPMD program over all chips of a pod
slice, initialized with ``jax.distributed`` and laid out on a global
``Mesh`` so collectives ride ICI within a slice and DCN across hosts.

Usage (same script on every host, e.g. via the TPU VM launcher):

    from limap_tpu.parallel import distributed as dist
    dist.maybe_initialize()            # no-op when single-process
    mesh = dist.global_mesh()          # 1-D mesh over ALL devices
    ... run triangulate_all_mesh / make_hybrid_ba_step on it ...

Host-side stages (IO, detection caches) are partitioned with
:func:`shard_image_ids`: every process handles its contiguous slice of
the image list and the device stages exchange nothing until the
psum-reduced BA — replacing the reference's joblib fan-out
(runners/functions.py:113) with process-parallel hosts feeding one
global device program.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from limap_tpu.parallel.mesh import TRACK_AXIS

_initialized = False


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process.

    Resolution order: explicit args -> JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env -> cloud TPU autodetection
    (argument-less initialize) -> single-process no-op.  Returns True
    when a multi-process runtime is active.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
            _initialized = True
        elif os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
                "MEGASCALE_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()  # cloud TPU autodetection
            _initialized = True
    except Exception:  # single-process fallback stays functional
        _initialized = False
    return _initialized and jax.process_count() > 1


def global_mesh(axis: str = TRACK_AXIS) -> Mesh:
    """1-D mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def process_info():
    return {"process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": len(jax.local_devices()),
            "global_devices": len(jax.devices())}


def shard_image_ids(img_ids: Sequence[int]) -> List[int]:
    """The contiguous slice of images THIS process is responsible for
    (host-side stages: image IO, detection, matching caches)."""
    n = len(img_ids)
    p = jax.process_count()
    i = jax.process_index()
    lo = (n * i) // p
    hi = (n * (i + 1)) // p
    return list(img_ids)[lo:hi]


def all_gather_host_dicts(local: dict) -> dict:
    """Merge per-process host dicts (e.g. {img_id: segments}) across
    processes via a device all-gather of a packed payload.

    Single-process: returns ``local`` unchanged.  Multi-process: each
    entry is serialized and exchanged through
    jax.experimental.multihost_utils so every host sees every image's
    host-side artifacts (the stand-in for the reference's shared
    filesystem handoff, runners/functions.py segments/matches caches).
    """
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils
    import pickle

    payload = pickle.dumps(local)
    arr = np.frombuffer(payload, np.uint8)
    # pad to the max payload size across hosts
    sizes = multihost_utils.process_allgather(
        np.asarray([len(arr)], np.int64))
    max_size = int(np.max(sizes))
    padded = np.zeros(max_size, np.uint8)
    padded[:len(arr)] = arr
    gathered = multihost_utils.process_allgather(padded)
    merged = {}
    for row, size in zip(np.asarray(gathered).reshape(
            jax.process_count(), -1), np.asarray(sizes).reshape(-1)):
        merged.update(pickle.loads(row[:int(size)].tobytes()))
    return merged


def run_distributed_mapping(cfg: dict, imagecols, all_2d_segs,
                            matches_by_image, ranges=None, mesh=None):
    """Image-sharded triangulation + scoring over the global mesh, then
    track building on every host (deterministic, so no exchange needed).

    Host pre-stages are expected to be process-partitioned with
    :func:`shard_image_ids` + merged via :func:`all_gather_host_dicts`.
    ``mesh`` defaults to a 1-D mesh over every device of every process.
    """
    from limap_tpu.triangulation.triangulator import (
        GlobalLineTriangulator, TriangulatorConfig)

    tri = GlobalLineTriangulator(
        TriangulatorConfig.from_dict(cfg.get("triangulation")))
    tri.init(all_2d_segs, imagecols)
    if ranges is not None:
        tri.set_ranges(ranges)
    tri.triangulate_all_mesh(matches_by_image,
                             global_mesh() if mesh is None else mesh)
    return tri.compute_line_tracks()
