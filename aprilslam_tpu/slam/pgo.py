"""Pose-graph optimization: relative SE(3) factors over keyframe poses.

Completes the backend triad (chaining, bundle adjustment, PGO) that the
BASELINE north star requires; the reference has no optimizer at all. Typical
use: consecutive-keyframe odometry edges from the front end + loop-closure
edges minted when a long-unseen landmark is re-observed; optimizing the pose
graph redistributes accumulated drift around the loop.

Residual per edge (i, j): r = log( T_meas^-1 · T_wi^-1 · T_wj ) in the se(3)
tangent, optionally weighted. Gauss-Newton/LM with the first active pose
gauge-fixed, dense over the (small) keyframe set, fixed iteration count —
the same jit-native shape discipline as ba.py.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3_exp, se3_log, se3_inverse


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["i", "j", "T_meas", "weight", "ok"],
    meta_fields=[],
)
@dataclass(frozen=True)
class PoseGraphEdges:
    i: jax.Array  # (E,) int32 source pose index
    j: jax.Array  # (E,) int32 target pose index
    T_meas: jax.Array  # (E, 4, 4) measured relative transform T_i^-1 T_j
    weight: jax.Array  # (E,)
    ok: jax.Array  # (E,) bool

    @property
    def capacity(self) -> int:
        return int(self.i.shape[0])


def edges_init(capacity: int, dtype=jnp.float32) -> PoseGraphEdges:
    return PoseGraphEdges(
        i=jnp.zeros((capacity,), jnp.int32),
        j=jnp.zeros((capacity,), jnp.int32),
        T_meas=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (capacity, 4, 4)),
        weight=jnp.ones((capacity,), dtype),
        ok=jnp.zeros((capacity,), bool),
    )


def add_edge(edges: PoseGraphEdges, slot: jax.Array | int, i, j, T_meas,
             weight=1.0) -> PoseGraphEdges:
    return replace(
        edges,
        i=edges.i.at[slot].set(jnp.asarray(i, jnp.int32)),
        j=edges.j.at[slot].set(jnp.asarray(j, jnp.int32)),
        T_meas=edges.T_meas.at[slot].set(jnp.asarray(T_meas, edges.T_meas.dtype)),
        weight=edges.weight.at[slot].set(jnp.asarray(weight, edges.weight.dtype)),
        ok=edges.ok.at[slot].set(True),
    )


def edges_from_trajectory(poses: jax.Array, noise_free: bool = True) -> PoseGraphEdges:
    """Odometry edges between consecutive poses (N-1 edges)."""
    N = poses.shape[0]
    rel = jax.vmap(lambda a, b: se3_inverse(a) @ b)(poses[:-1], poses[1:])
    return PoseGraphEdges(
        i=jnp.arange(N - 1, dtype=jnp.int32),
        j=jnp.arange(1, N, dtype=jnp.int32),
        T_meas=rel,
        weight=jnp.ones((N - 1,), poses.dtype),
        ok=jnp.ones((N - 1,), bool),
    )


def pgo_residuals(
    poses: jax.Array, edges: PoseGraphEdges, rot_weight: float = 25.0
) -> jax.Array:
    """(E, 6) weighted tangent residuals.

    ``rot_weight`` scales the rotational (omega) components relative to the
    translational ones. The raw se3 tangent mixes radians (~1) with scene
    units (~tens), so unweighted, a 50-degree node rotation costs LESS than
    a 1-unit translation and the optimizer happily twists nodes to satisfy
    translation constraints — which swings every landmark anchored to them
    by (lever arm) x (angle). A weight of the typical node-to-landmark
    lever arm makes 1 rad of rotation cost what (rot_weight) units of
    translation do, matching the metric consequences.
    """

    def one(i, j, Tm, w, ok):
        rel = se3_inverse(poses[i]) @ poses[j]
        r = se3_log(se3_inverse(Tm) @ rel)
        scale = jnp.asarray(
            [rot_weight, rot_weight, rot_weight, 1.0, 1.0, 1.0], poses.dtype
        )
        return r * scale * w * ok.astype(poses.dtype)

    return jax.vmap(one)(edges.i, edges.j, edges.T_meas, edges.weight, edges.ok)


def pgo_cost(
    poses: jax.Array, edges: PoseGraphEdges, rot_weight: float = 25.0
) -> jax.Array:
    r = pgo_residuals(poses, edges, rot_weight)
    return jnp.sum(r * r)


@partial(jax.jit, static_argnames=("iters", "rot_weight"))
def pgo_optimize(
    poses: jax.Array,  # (N, 4, 4)
    edges: PoseGraphEdges,
    active: jax.Array | None = None,  # (N,) bool; pose 0 of actives is gauge
    iters: int = 10,
    damping: float = 1e-4,
    gauge_weight: float = 1e6,
    rot_weight: float = 25.0,
    gauge_index: jax.Array | None = None,  # explicit gauge pose (else first active)
) -> jax.Array:
    """LM over all poses with tangent perturbations; returns refined poses."""
    N = poses.shape[0]
    dtype = poses.dtype
    if active is None:
        active = jnp.ones((N,), bool)
    first_active = jnp.argmax(active) if gauge_index is None else gauge_index

    def residual_flat(xi_all, base):
        perturbed = jax.vmap(lambda x, T: se3_exp(x) @ T)(xi_all.reshape(N, 6), base)
        return pgo_residuals(perturbed, edges, rot_weight).reshape(-1)

    eye = jnp.eye(N * 6, dtype=dtype)
    gauge_mask = (jnp.arange(N) == first_active).astype(dtype)
    prior_diag = jnp.repeat(
        gauge_weight * gauge_mask + 1e4 * (1.0 - active.astype(dtype)), 6
    )

    def step(carry, _):
        poses, lam = carry
        z = jnp.zeros((N * 6,), dtype)
        r = residual_flat(z, poses)
        J = jax.jacfwd(residual_flat)(z, poses)  # (E*6, N*6)
        A = J.T @ J + (lam + 1e-9) * eye + jnp.diag(prior_diag)
        g = J.T @ r
        dx = -jnp.linalg.solve(A, g)
        new_poses = jax.vmap(lambda x, T: se3_exp(x) @ T)(dx.reshape(N, 6), poses)
        new_poses = jnp.where(active[:, None, None], new_poses, poses)
        better = pgo_cost(new_poses, edges, rot_weight) < jnp.sum(r * r)
        poses = jnp.where(better, new_poses, poses)
        lam = jnp.clip(jnp.where(better, lam * 0.5, lam * 4.0), 1e-9, 1e4)
        return (poses, lam), None

    (poses, _), _ = jax.lax.scan(step, (poses, jnp.asarray(damping, dtype)), None, length=iters)
    return poses
