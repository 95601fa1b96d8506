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


def make_mesh_2d(
    n_data: int | None = None,
    n_lm: int | None = None,
    data_axis: str = "data",
    lm_axis: str = "lm",
) -> Mesh:
    """2-D (data x lm) mesh: sequences over ``data``, landmark shards over
    ``lm``.

    Device order follows process locality: in a multi-host run all of one
    process's local chips land in the same ``data`` row, so the ``lm``
    collectives (the only per-iteration traffic in distributed BA) ride the
    intra-host ICI while the embarrassingly-parallel ``data`` axis is the
    one that spans hosts/DCN. Defaults: data = #processes, lm = local chips.
    """
    devs = jax.devices()
    if n_data is None:
        n_data = jax.process_count()
    if n_lm is None:
        n_lm = len(devs) // n_data
    if n_data * n_lm > len(devs):
        raise RuntimeError(
            f"mesh {n_data}x{n_lm} needs {n_data * n_lm} devices, have {len(devs)}"
        )
    # jax.devices() sorts by (process_index, local id) — reshaping puts each
    # process's devices contiguously along the lm axis.
    grid = np.asarray(devs[: n_data * n_lm]).reshape(n_data, n_lm)
    return Mesh(grid, (data_axis, lm_axis))


def shard_leading(mesh: Mesh, x, axis: str = "data"):
    """Put an array on the mesh sharded over its leading dimension."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicated(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
