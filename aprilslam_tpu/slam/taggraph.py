"""Landmark (tag-to-tag) pose graph: the map corrector that makes loop
closure's accuracy benefit robust.

Why this exists: the sliding-window BA (slam/ba.py) evicts old
observations, so once the camera moves on, a far tag's world pose is
FROZEN at whatever the chained seeding produced — the anchor-relative map
error never improves, and neither does the pose error whenever those tags
dominate localization. Correcting the map by conjugating landmarks with
camera pose-graph deltas (slam/loop.py) is brittle: the solve distributes
the loop error evenly along the odometry chain while the true error is
concentrated at the few tag-set-transition hops, so the map correction is
weak and noise-sensitive (round-3 verdict: the correction helped on one
host and hurt on another).

The robust estimator is a pose graph over the TAGS themselves:

* every frame in which two tags are co-visible yields a relative-pose
  measurement ``T_ij = inv(T_obs_i) @ T_obs_j`` (T_obs = PnP tag pose in
  the camera frame) that is independent of both the camera pose estimate
  and the current map;
* measurements accumulate per ordered pair (i < j) as a running tangent-
  space mean around the pair's first sighting — hundreds of sightings per
  pair over a trajectory, so the averaged edge noise is tiny;
* a small Levenberg-Marquardt pose-graph solve (slam/pgo.py) over the
  active tags, gauge-fixed at the anchor, replaces the chained one-shot
  seeding error with the averaged-consensus geometry.

The reference chains each tag's world pose ONCE through the min-id visible
tag and never revisits it (/root/reference/src/core/slam_graph.py:29-59,
with `update_world` an unimplemented TODO at 72-76). This module is the
"measure many, solve once per chunk" redesign of that idea: all pair
work is batched (B*D^2 4x4 composites outside the per-frame scan), the
accumulator is a fixed (M, M) grid, and the solve is a fixed-iteration LM
— jit-native throughout.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3_exp, se3_inverse, se3_log
from .pgo import PoseGraphEdges, pgo_optimize


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ref_T", "sum_dev", "count", "rejected"],
    meta_fields=[],
)
@dataclass(frozen=True)
class TagGraphState:
    """Per ordered pair (i < j) of tag slots: running tangent-space mean.

    ``mean_T(i, j) = ref_T[i, j] @ exp(sum_dev[i, j] / count[i, j])``.
    """

    ref_T: jax.Array  # (M, M, 4, 4) first accepted measurement per pair
    sum_dev: jax.Array  # (M, M, 6) sum of se3_log deviations from ref
    count: jax.Array  # (M, M) accepted measurement count
    rejected: jax.Array  # (M, M) rejections since the reference was elected

    @property
    def capacity(self) -> int:
        return int(self.count.shape[0])


def taggraph_init(n_landmarks: int = 64, dtype=jnp.float32) -> TagGraphState:
    M = n_landmarks
    return TagGraphState(
        ref_T=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (M, M, 4, 4)),
        sum_dev=jnp.zeros((M, M, 6), dtype),
        count=jnp.zeros((M, M), dtype),
        rejected=jnp.zeros((M, M), dtype),
    )


def taggraph_accumulate(
    tg: TagGraphState,
    ids: jax.Array,  # (B, D) or (D,) int32 detection tag ids
    T_obs: jax.Array,  # (B, D, 4, 4) or (D, 4, 4) PnP tag-in-camera poses
    reliable: jax.Array,  # (B, D) or (D,) bool — branch-reliable PnP only
    max_dev_t: float = 5.0,
    max_dev_r: float = 0.5,
    compact_budget: int = 512,
) -> TagGraphState:
    """Fold a chunk of detections into the pair accumulator.

    All D^2 ordered pairs per frame are formed batched (this runs OUTSIDE
    the per-frame scan — it needs only detections, not sequential state).
    A measurement deviating from the pair's reference by more than
    ``max_dev_t`` sim-units or ``max_dev_r`` radians is rejected: pair
    noise is sub-unit, so a large deviation is a wrong planar branch that
    slipped the gate, and one such outlier corrupts a linear mean.

    The B*D^2 pair grid is mostly padding (real detections per frame <<
    max_detections), so valid pairs are COMPACTED to ``compact_budget``
    entries before the expensive per-pair math (se3 inverse/log) — probe
    2026-08-21: the accumulate pass was 36% of the pgo-on throughput gap,
    dominated by 2048 mostly-padding matrix logs. Overflow beyond the
    budget drops measurements (harmless for a count-weighted mean; a
    5-tag scene peaks at ~160 real pairs per 8-frame chunk).
    """
    M = tg.capacity
    dtype = tg.sum_dev.dtype
    if ids.ndim == 1:
        ids, T_obs, reliable = ids[None], T_obs[None], reliable[None]
    B, D = ids.shape

    # (B, D, D) pair grid -> flat (B*D*D,) measurement list.
    idp = jnp.broadcast_to(ids[:, :, None], (B, D, D)).reshape(-1)
    idq = jnp.broadcast_to(ids[:, None, :], (B, D, D)).reshape(-1)
    rp = jnp.broadcast_to(reliable[:, :, None], (B, D, D)).reshape(-1)
    rq = jnp.broadcast_to(reliable[:, None, :], (B, D, D)).reshape(-1)
    valid = (
        rp & rq & (idp >= 0) & (idq > idp) & (idq < M)
    )
    if compact_budget and compact_budget < valid.shape[0]:
        # Valid-first gather (cheap int top_k on the mask), then the 4x4
        # math runs on the budget only.
        _, sel = jax.lax.top_k(valid.astype(jnp.int32), compact_budget)
        idp, idq, valid = idp[sel], idq[sel], valid[sel]
        Tp = jnp.broadcast_to(T_obs[:, :, None], (B, D, D, 4, 4)).reshape(-1, 4, 4)[sel]
        Tq = jnp.broadcast_to(T_obs[:, None, :], (B, D, D, 4, 4)).reshape(-1, 4, 4)[sel]
    else:
        Tp = jnp.broadcast_to(T_obs[:, :, None], (B, D, D, 4, 4)).reshape(-1, 4, 4)
        Tq = jnp.broadcast_to(T_obs[:, None, :], (B, D, D, 4, 4)).reshape(-1, 4, 4)
    T_pair = jnp.einsum(
        "kij,kjl->kil", jax.vmap(se3_inverse)(Tp.astype(dtype)), Tq.astype(dtype)
    )

    i = jnp.clip(idp, 0, M - 1)
    j = jnp.clip(idq, 0, M - 1)
    flat = jnp.where(valid, i * M + j, M * M)  # invalid -> dropped

    # Pass 1: elect a reference for pairs seen for the first time.
    # Any writer may win the duplicate-scatter race — deviations are
    # computed against the final elected reference in pass 2, so the
    # result is consistent regardless of the winner.
    cand = (
        jnp.zeros((M * M, 4, 4), dtype).at[flat].set(T_pair, mode="drop")
    )
    touched = jnp.zeros((M * M,), bool).at[flat].set(valid, mode="drop")
    count_flat = tg.count.reshape(-1)
    is_new = touched & (count_flat == 0)
    ref = jnp.where(is_new[:, None, None], cand, tg.ref_T.reshape(-1, 4, 4))

    # Pass 2: tangent deviations vs the (possibly new) reference.
    ref_k = ref[jnp.clip(flat, 0, M * M - 1)]
    dev = jax.vmap(lambda R, T: se3_log(se3_inverse(R) @ T))(ref_k, T_pair)
    ok_dev = (
        (jnp.linalg.norm(dev[:, 3:], axis=-1) < max_dev_t)
        & (jnp.linalg.norm(dev[:, :3], axis=-1) < max_dev_r)
    )
    keep = valid & ok_dev
    flat_k = jnp.where(keep, flat, M * M)
    sum_dev = (
        tg.sum_dev.reshape(-1, 6)
        .at[flat_k]
        .add(dev.astype(dtype), mode="drop")
    )
    count = (
        count_flat.at[flat_k].add(jnp.ones_like(count_flat[:1])[0], mode="drop")
    )
    flat_r = jnp.where(valid & ~ok_dev, flat, M * M)
    rejected = (
        tg.rejected.reshape(-1)
        .at[flat_r]
        .add(jnp.ones_like(count_flat[:1])[0], mode="drop")
    )
    # Self-healing reference election: if the elected reference was itself
    # an outlier (a wrong planar branch that won the first-sighting race),
    # every subsequent GOOD measurement deviates hugely and gets rejected —
    # the pair would be poisoned forever. A pair rejecting more than it
    # accepts (plus slack) resets, and the next chunk elects a new
    # reference; a bad re-election halves in probability each time.
    reset = rejected > (count + 2.0)
    sum_dev = jnp.where(reset[:, None], 0.0, sum_dev)
    count = jnp.where(reset, 0.0, count)
    rejected = jnp.where(reset, 0.0, rejected)
    return TagGraphState(
        ref_T=ref.reshape(M, M, 4, 4),
        sum_dev=sum_dev.reshape(M, M, 6),
        count=count.reshape(M, M),
        rejected=rejected.reshape(M, M),
    )


def taggraph_edges(
    tg: TagGraphState, lm_active: jax.Array, max_edges: int = 128,
    min_count: float = 3.0,
) -> PoseGraphEdges:
    """Top-``max_edges`` pairs by count as pose-graph edges.

    Edge weight sqrt(count): the averaged measurement's standard error
    shrinks as 1/sqrt(count), so its least-squares weight grows as
    sqrt(count). Pairs below ``min_count`` sightings are excluded — a
    single unaveraged measurement is exactly the brittleness this module
    exists to remove.
    """
    M = tg.capacity
    dtype = tg.sum_dev.dtype
    cnt = tg.count * lm_active[:, None] * lm_active[None, :]
    cnt_flat = cnt.reshape(-1)
    top, kidx = jax.lax.top_k(cnt_flat, min(max_edges, M * M))
    i = (kidx // M).astype(jnp.int32)
    j = (kidx % M).astype(jnp.int32)
    ok = top >= min_count
    mean_dev = tg.sum_dev.reshape(-1, 6)[kidx] / jnp.maximum(
        tg.count.reshape(-1)[kidx, None], 1.0
    )
    T_mean = jnp.einsum(
        "kij,kjl->kil",
        tg.ref_T.reshape(-1, 4, 4)[kidx],
        jax.vmap(se3_exp)(mean_dev),
    )
    return PoseGraphEdges(
        i=i, j=j, T_meas=T_mean.astype(dtype),
        weight=jnp.sqrt(jnp.maximum(top, 1.0)).astype(dtype), ok=ok,
    )


def taggraph_support(tg: TagGraphState) -> jax.Array:
    """(M,) total accepted pair sightings incident to each tag."""
    return tg.count.sum(axis=0) + tg.count.sum(axis=1)


def taggraph_solve(
    tg: TagGraphState,
    lm_pose: jax.Array,  # (M, 4, 4) current landmark world poses
    lm_active: jax.Array,  # (M,) bool
    anchor: jax.Array,  # () int32 gauge tag slot (-1 = none yet)
    hold: jax.Array | None = None,  # (M,) bool: tags NOT to move
    iters: int = 6,
    max_edges: int = 128,
    rot_weight: float = 25.0,
) -> tuple[jax.Array, jax.Array]:
    """Refine landmark poses against the averaged co-visibility graph.

    Returns ``(new_lm_pose, moved)``: new (M, 4, 4) poses in the SAME
    floating world gauge, plus a () bool flag saying whether a solve ran
    at all (callers gate keyframe conjugation on it so the no-op path
    applies the EXACT identity — cf. the round-2 lesson on T @ inv(T)
    float residue feedback). The
    anchor tag is pinned where it currently sits, so anchor-relative
    consumers see only the relative-geometry correction. Tags without
    graph support keep their poses (zero gradient + damping = zero step).
    No-op (returns ``lm_pose``) until the anchor exists and at least one
    averaged edge is available.

    ``hold`` marks tags whose poses must not move — the caller passes the
    tags currently in view: while a tag is being observed, the live
    BA/localization estimate is better than an early few-sample graph
    mean (measured: solving in-view tags cost 0.3 su of pose error on
    lap 1 of the config-2 bench), and the held tags double as
    consistency anchors that pull the FROZEN (out-of-view) tags — the
    ones the window can no longer fix — onto the averaged geometry.
    """
    edges = taggraph_edges(tg, lm_active, max_edges=max_edges)
    movable = lm_active if hold is None else (lm_active & ~hold)
    have = jnp.any(edges.ok) & (anchor >= 0) & jnp.any(movable)

    def run(poses):
        return pgo_optimize(
            poses, edges, active=movable, iters=iters,
            rot_weight=rot_weight,
            gauge_index=jnp.clip(anchor, 0, tg.capacity - 1),
        )

    return jax.lax.cond(have, run, lambda p: p, lm_pose), have
