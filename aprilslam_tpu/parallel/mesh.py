"""Device mesh + sharding helpers.

The reference has no parallel machinery at all (SURVEY §2: one synchronous
Python loop). Here the parallel axes are:

* ``data`` — frames/sequences (detection and PnP are embarrassingly parallel
  over frames; independent trajectories over hosts);
* ``lm``   — landmark blocks for distributed bundle adjustment (the Schur
  elimination is per-landmark; the reduced camera system is psum-reduced).

Collectives ride ICI within a slice via jax.lax.psum/all_gather under
shard_map; nothing NCCL-like is needed (SURVEY §5).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise RuntimeError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_leading(mesh: Mesh, x, axis: str = "data"):
    """Put an array on the mesh sharded over its leading dimension."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicated(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
