"""Device mesh helpers for multi-chip execution.

The reference is single-process (SURVEY.md §2.3); here scaling is
first-class: tracks shard over a data axis ("tracks"), poses replicate,
and reduced pose systems ride ICI collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TRACK_AXIS = "tracks"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the track axis (dp-style sharding of independent
    track problems)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (TRACK_AXIS,))


def track_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(TRACK_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
