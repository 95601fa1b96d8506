"""Multi-sequence data parallelism: independent trajectories across devices.

BASELINE config "multi-sequence batch: 8 simulated trajectories processed in
parallel (batched detection + independent BA)". Each device runs the full
SLAM pipeline on its own sequence via shard_map over the 'data' axis; states
are stacked (one graph per sequence) and stay device-local — zero
communication on the steady path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..detect import DetectorParams
from ..families import TagFamily
from ..geometry import PinholeCamera
from ..slam.pipeline import build_slam_step


def build_parallel_slam(
    mesh: Mesh,
    family: str | TagFamily,
    camera: PinholeCamera,
    tag_size: float,
    detector_params: DetectorParams | None = None,
    estimator: str = "joint",
    graph_capacity: int = 64,
    axis: str = "data",
    **step_kwargs,
):
    """Returns (parallel_step, init_states, shard) where

    * ``parallel_step(states, frames) -> (states, outputs)`` with ``frames``
      shaped (S, B, H, W) sharded over sequences S on ``axis``;
    * ``init_states()`` builds the stacked (S, ...) initial states;
    * ``shard(x)`` places an (S, ...) array with the right NamedSharding.

    ``step_kwargs`` forward to :func:`build_slam_step` — the full
    production configuration (``estimator="ba"``, ``ba_schedule="chunk"``,
    ``pgo=True``, ...) runs per-sequence under the mesh; the pgo/taggraph
    state is per-sequence, so data parallelism composes with it directly.
    """
    n_seq = mesh.shape[axis]
    step, init_one = build_slam_step(
        family, camera, tag_size,
        detector_params=detector_params,
        estimator=estimator,
        graph_capacity=graph_capacity,
        **step_kwargs,
    )

    def local(states, frames):
        # shard_map passes the local (1, ...) block; strip/re-add the axis.
        states = jax.tree.map(lambda x: x[0], states)
        new_state, outs = step(states, frames[0])
        add = lambda x: x[None]
        return jax.tree.map(add, new_state), jax.tree.map(add, outs)

    spec = P(axis)
    pstep = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(spec, spec),
            out_specs=(spec, spec),
            check_vma=False,
        )
    )

    def init_states():
        one = init_one()
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_seq,) + x.shape).copy(), one
        )
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, spec)), stacked
        )

    def shard(x):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return pstep, init_states, shard
