"""Multi-host (multi-process) distribution over DCN.

The reference has no distributed backend at all (SURVEY §2/§5: one
synchronous Python loop, no NCCL/MPI/Gloo anywhere). The TPU-native
equivalent is ``jax.distributed`` + XLA collectives: processes connect to a
coordinator, every process sees the GLOBAL device set, and a 2-D
(data x lm) mesh lays the embarrassingly-parallel sequence axis across
hosts (DCN) while the chatty landmark axis (the per-iteration psums of
distributed BA) stays within a host's chips (ICI). See
``mesh.make_mesh_2d`` for the device-order guarantee.

Tested with 2 local processes x 4 virtual CPU devices each
(tests/test_multihost.py), exactly the strategy SURVEY §4 prescribes for
validating collectives before real pod runs.
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    platform: str | None = None,
) -> None:
    """Connect this process to the JAX distributed runtime.

    On a real TPU pod all three arguments are auto-detected from the TPU
    metadata and may be omitted. For CPU-based multi-process testing (and
    GPU-style clusters) pass them explicitly:

        initialize_distributed("localhost:9876", num_processes=2, process_id=i)

    ``platform`` forces the backend (e.g. "cpu") BEFORE the runtime
    initializes — required on hosts whose sitecustomize force-registers a
    TPU plugin.
    """
    if platform:
        jax.config.update("jax_platforms", platform)
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    logger.info(
        "jax.distributed up: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def make_global(mesh: Mesh, spec: PartitionSpec, value: np.ndarray) -> jax.Array:
    """Create a global array on ``mesh`` from a host-side value every
    process holds in full (each process materializes only its addressable
    shards). This is the multi-process-safe device_put."""
    value = np.asarray(value)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(value.shape, sharding, lambda idx: value[idx])


def all_processes_cost(cost_local: float) -> np.ndarray:
    """Gather a host-side scalar from every process (orders by process id).

    Uses a tiny psum-of-one-hot over the global device set, so it also
    verifies the DCN path end to end.
    """
    n = jax.process_count()
    vec = np.zeros((n,), np.float32)
    vec[jax.process_index()] = cost_local

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs), ("all",))

    from jax import shard_map

    f = jax.jit(
        shard_map(
            lambda x: jax.lax.psum(x, "all") / jax.local_device_count(),
            mesh=mesh,
            in_specs=PartitionSpec("all"),
            out_specs=PartitionSpec(),
            check_vma=False,
        )
    )
    # Each process's make_array callback fills ITS devices' shards with its
    # own vec; the psum then assembles the per-process contributions.
    tiled = np.tile(vec, (len(devs), 1))  # (D, n) sharded over 'all'
    x = make_global(mesh, PartitionSpec("all"), tiled)
    return np.asarray(f(x))[0]
