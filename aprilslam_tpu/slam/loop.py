"""Online loop closure: mint pose-graph edges from the live pipeline and
redistribute drift with pgo.pgo_optimize — all inside jit.

This module maintains a bounded camera pose-graph alongside the BA window:

* a **node** per adopted keyframe (ring buffer — arbitrarily long runs
  evict the oldest node instead of silently saturating), storing the
  camera world pose at adoption;
* an **odometry edge** between consecutive nodes, measuring the relative
  pose the front end believed at the time (chained tag localization);
* **loop-closure edges** when a landmark unseen for > ``loop_gap`` frames
  is re-observed on node frames: two PnP observations of the same physical
  tag give the relative node transform T_a_obs @ inv(T_b_obs) independent
  of the (drifted) map — exactly the constraint that contradicts, and
  corrects, the accumulated odometry chain.

Robustness (round-3 verdict: a single-sighting loop edge helped on one
host and hurt on another):

* re-entry opens a **loop window**: the old partner node and its
  observation are frozen, and EVERY node frame inside the window mints
  another edge from a fresh sighting — the solve then averages several
  independent PnP measurements instead of trusting one;
* every qualifying landmark mints (vectorized), not just the first;
* edges between nodes fewer than ``min_node_sep`` adoptions apart are
  suppressed: drift between near-consecutive nodes is negligible, so such
  an edge carries no signal — only PnP noise at loop weight.

The solve can run inline per frame (``solve=True``) or be deferred to the
chunk boundary via :func:`pgo_solve` — the production (chunk-scheduled)
path mints edges inside the scan and solves once per chunk, mirroring how
the LM-BA solve is hoisted (slam/pipeline.py).

Fixed capacities, masked scatters, lax.cond around the solve: the whole
tracker lives inside the jitted slam_step (no host round-trips). The
reference has no optimizer at all (SURVEY §7 capability 3;
/root/reference/src/core/slam_graph.py:72-76 leaves ``update_world`` as a
TODO); this is the north-star addition, done the XLA way.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3_inverse
from .pgo import PoseGraphEdges, edges_init, pgo_optimize


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "node_pose", "node_active", "node_seq", "node_ptr", "edges", "edge_ptr",
        "kf_node", "lm_node", "lm_ref", "lm_obs_T", "lm_frame",
        "lm_loop_node", "lm_loop_T", "lm_loop_until",
        "frame", "n_loops", "n_solved", "last_opt",
    ],
    meta_fields=[],
)
@dataclass(frozen=True)
class PgoState:
    node_pose: jax.Array  # (P, 4, 4) camera world pose per pose-graph node
    node_active: jax.Array  # (P,) bool
    node_seq: jax.Array  # (P,) int32 adoption sequence number of the tenant
    node_ptr: jax.Array  # () int32 total adoptions (slot = ptr % P, ring)
    edges: PoseGraphEdges  # capacity E (ring)
    edge_ptr: jax.Array  # () int32 total edges written (slot = ptr % E)
    kf_node: jax.Array  # (K,) int32 pose-graph node slot per BA keyframe slot
    lm_node: jax.Array  # (M,) int32 node slot of landmark's last node-frame obs
    lm_ref: jax.Array  # (M,) int32 REFERENCE node: first node-frame obs, frozen.
    #   Map corrections conjugate by lm_ref — the epoch the landmark's
    #   geometry was seeded in. Reassigning the conjugation node per
    #   sighting drags landmarks through inconsistent frames on every
    #   later optimization (measured: far-tag map error 3.5 -> 47 su over
    #   3 loop closures).
    lm_obs_T: jax.Array  # (M, 4, 4) PnP T (tag pose in camera frame) at that node
    lm_frame: jax.Array  # (M,) int32 frame index of last sighting (any frame)
    # Loop window: partner node + its observation frozen at re-entry so the
    # following sightings keep minting edges against the SAME old node.
    lm_loop_node: jax.Array  # (M,) int32 frozen partner slot (-1 = closed)
    lm_loop_T: jax.Array  # (M, 4, 4) frozen partner observation
    lm_loop_until: jax.Array  # (M,) int32 window end frame (exclusive)
    frame: jax.Array  # () int32 frames processed
    n_loops: jax.Array  # () int32 loop edges minted
    n_solved: jax.Array  # () int32 loop edges folded into the last solve
    last_opt: jax.Array  # () int32 frame of the last pose-graph solve

    @property
    def n_nodes_capacity(self) -> int:
        return int(self.node_pose.shape[0])


def pgo_init(
    n_nodes: int = 64,
    n_edges: int = 192,
    n_landmarks: int = 64,
    n_keyframes: int = 16,
    dtype=jnp.float32,
) -> PgoState:
    eyeP = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (n_nodes, 4, 4))
    eyeM = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (n_landmarks, 4, 4))
    return PgoState(
        node_pose=eyeP,
        node_active=jnp.zeros((n_nodes,), bool),
        node_seq=jnp.full((n_nodes,), -1, jnp.int32),
        node_ptr=jnp.int32(0),
        edges=edges_init(n_edges, dtype),
        edge_ptr=jnp.int32(0),
        kf_node=jnp.full((n_keyframes,), -1, jnp.int32),
        lm_node=jnp.full((n_landmarks,), -1, jnp.int32),
        lm_ref=jnp.full((n_landmarks,), -1, jnp.int32),
        lm_obs_T=eyeM,
        lm_frame=jnp.zeros((n_landmarks,), jnp.int32),
        lm_loop_node=jnp.full((n_landmarks,), -1, jnp.int32),
        lm_loop_T=eyeM,
        lm_loop_until=jnp.zeros((n_landmarks,), jnp.int32),
        frame=jnp.int32(0),
        n_loops=jnp.int32(0),
        n_solved=jnp.int32(0),
        last_opt=jnp.int32(-(1 << 20)),
    )


def _edge_scatter(edges: PoseGraphEdges, slot, i, j, T, w, do):
    """Write an edge at `slot` iff `do` (out-of-range scatter drops)."""
    E = edges.capacity
    s = jnp.where(do, slot, E)
    return PoseGraphEdges(
        i=edges.i.at[s].set(jnp.asarray(i, jnp.int32), mode="drop"),
        j=edges.j.at[s].set(jnp.asarray(j, jnp.int32), mode="drop"),
        T_meas=edges.T_meas.at[s].set(T.astype(edges.T_meas.dtype), mode="drop"),
        weight=edges.weight.at[s].set(jnp.asarray(w, edges.weight.dtype), mode="drop"),
        ok=edges.ok.at[s].set(True, mode="drop"),
    )


def loop_window_open(pgo: PgoState) -> jax.Array:
    """(M,) bool: landmarks whose loop window is currently open."""
    return (pgo.lm_loop_node >= 0) & (pgo.frame < pgo.lm_loop_until)


def pgo_track_frame(
    pgo: PgoState,
    T_wc: jax.Array,  # (4, 4) current camera pose estimate (world frame)
    pose_valid: jax.Array,  # () bool
    ids: jax.Array,  # (D,) detection tag ids
    T_obs: jax.Array,  # (D, 4, 4) PnP tag-in-camera transforms
    ok: jax.Array,  # (D,) bool
    is_node: jax.Array,  # () bool: adopt this frame as a pose-graph node
    kf_slot: jax.Array,  # () int32 BA keyframe ring slot this node maps to
    loop_gap: int = 24,
    loop_weight: float = 4.0,
    loop_window: int = 8,
    min_node_sep: int = 3,
    opt_iters: int = 10,
    cooldown: int = 8,
    max_loop_residual: float = 15.0,
    solve: bool = True,
) -> tuple[PgoState, jax.Array, jax.Array]:
    """Returns (new_state, delta (P, 4, 4), closed ()).

    ``delta[n] = pose_new[n] @ inv(pose_old[n])`` left-corrects any world
    transform last referenced at node slot n; identity where nothing
    changed. With ``solve=False`` no optimization runs here (delta is the
    exact identity, ``closed`` is False) — call :func:`pgo_solve` at the
    chunk boundary instead.
    """
    P = pgo.n_nodes_capacity
    M = pgo.lm_node.shape[0]
    dtype = pgo.node_pose.dtype
    T_wc = T_wc.astype(dtype)

    # Scatter this frame's observations by landmark slot.
    valid_id = ok & (ids >= 0) & (ids < M)
    slot = jnp.where(valid_id, jnp.clip(ids, 0, M - 1), M)
    T_by = jnp.zeros((M, 4, 4), dtype).at[slot].set(T_obs.astype(dtype), mode="drop")
    seen = jnp.zeros((M,), bool).at[slot].set(True, mode="drop")

    can_add = is_node & pose_valid
    nid = pgo.node_ptr % P  # ring slot for this node
    nslot = jnp.where(can_add, nid, P)

    # Ring eviction: adopting into an occupied slot clears every reference
    # to the previous tenant — its edges, and any landmark/keyframe bound
    # to it (a stale binding would conjugate new state by an unrelated
    # node's future corrections).
    evict = can_add & pgo.node_active[jnp.clip(nid, 0, P - 1)]
    edges = pgo.edges
    edge_hit = (edges.i == nid) | (edges.j == nid)
    edges = replace(edges, ok=edges.ok & ~(edge_hit & evict))
    def _clear(a):
        return jnp.where(evict & (a == nid), jnp.int32(-1), a)
    lm_node0 = _clear(pgo.lm_node)
    lm_ref0 = _clear(pgo.lm_ref)
    lm_loop_node0 = _clear(pgo.lm_loop_node)
    kf_node0 = _clear(pgo.kf_node)

    node_pose = pgo.node_pose.at[nslot].set(T_wc, mode="drop")
    node_active = pgo.node_active.at[nslot].set(True, mode="drop")
    node_seq = pgo.node_seq.at[nslot].set(pgo.node_ptr, mode="drop")

    # Odometry edge from the previous node: the relative transform the
    # front end currently believes. Zero residual today; stiffness tomorrow.
    prev = (pgo.node_ptr - 1) % P
    odo_do = can_add & (pgo.node_ptr >= 1)
    T_odo = se3_inverse(pgo.node_pose[jnp.clip(prev, 0, P - 1)]) @ T_wc
    edges = _edge_scatter(edges, pgo.edge_ptr % edges.capacity,
                          prev, nid, T_odo, 1.0, odo_do)
    eptr = pgo.edge_ptr + jnp.where(odo_do, 1, 0)

    # ---- Loop closure ------------------------------------------------
    # A long-unseen landmark re-observed on a node frame OPENS a loop
    # window: the old node + old observation are frozen as the partner,
    # and every node-frame sighting during the window mints another edge
    # (several independent PnP measurements for the solve to average).
    # ``cooldown`` gates only the OPENING of new windows after a solve.
    gap = pgo.frame - pgo.lm_frame
    partner_seq = pgo.node_seq[jnp.clip(lm_node0, 0, P - 1)]
    sep_ok = (pgo.node_ptr - partner_seq) >= min_node_sep
    open_m = (
        seen & (lm_node0 >= 0) & (gap > loop_gap) & can_add & sep_ok
        & ~loop_window_open(pgo)
        & ((pgo.frame - pgo.last_opt) > cooldown)
    )
    lm_loop_node = jnp.where(open_m, lm_node0, lm_loop_node0)
    lm_loop_T = jnp.where(open_m[:, None, None], pgo.lm_obs_T, pgo.lm_loop_T)
    lm_loop_until = jnp.where(open_m, pgo.frame + loop_window, pgo.lm_loop_until)

    in_window = (lm_loop_node >= 0) & (pgo.frame < lm_loop_until)
    a = jnp.clip(lm_loop_node, 0, P - 1)
    mint = in_window & seen & can_add & (lm_loop_node != nid)
    # T_wl = T_wc_a @ T_a_obs = T_wc_b @ T_b_obs  =>
    # inv(T_wc_a) @ T_wc_b = T_a_obs @ inv(T_b_obs): map-independent.
    T_loop = jnp.einsum("mij,mjk->mik", lm_loop_T, jax.vmap(se3_inverse)(T_by))
    # Sanity-gate each measurement: a loop edge whose implied correction is
    # far larger than any plausible accumulated drift is a bad PnP (e.g. a
    # wrong planar branch on a distant, oblique re-entry sighting), and one
    # such edge wrecks the whole graph (measured: a ~50deg-rotation loop
    # edge twisted a node and swung an 85-unit-lever-arm landmark by 55 su).
    # Translation and rotation of the SE(3) error are gated SEPARATELY —
    # the se3-log v component shrinks under large rotations and would let a
    # flipped measurement through a tangent-norm gate.
    E_m = jnp.einsum(
        "mij,mjk,kl->mil",
        jax.vmap(se3_inverse)(T_loop),
        jax.vmap(se3_inverse)(pgo.node_pose[a]),
        T_wc,
    )
    t_err = jnp.linalg.norm(E_m[:, :3, 3], axis=-1)
    tr = E_m[:, 0, 0] + E_m[:, 1, 1] + E_m[:, 2, 2]
    cos_rot = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    do_m = mint & (t_err < max_loop_residual) & (cos_rot > 0.8776)  # < ~0.5 rad

    # Vectorized edge scatter: consecutive ring slots for this frame's mints.
    E_cap = edges.capacity
    k = jnp.cumsum(do_m.astype(jnp.int32)) - 1
    slot_e = jnp.where(do_m, (eptr + k) % E_cap, E_cap)
    edges = PoseGraphEdges(
        i=edges.i.at[slot_e].set(a.astype(jnp.int32), mode="drop"),
        j=edges.j.at[slot_e].set(jnp.broadcast_to(nid, (M,)).astype(jnp.int32), mode="drop"),
        T_meas=edges.T_meas.at[slot_e].set(T_loop.astype(edges.T_meas.dtype), mode="drop"),
        weight=edges.weight.at[slot_e].set(
            jnp.full((M,), loop_weight, edges.weight.dtype), mode="drop"),
        ok=edges.ok.at[slot_e].set(True, mode="drop"),
    )
    n_mint = jnp.sum(do_m, dtype=jnp.int32)
    eptr = eptr + n_mint

    # Bookkeeping. lm_frame refreshes on EVERY sighting (gap is wall-frame
    # based); lm_node / lm_obs_T only on node frames (edges need a node);
    # lm_ref is set once, at the landmark's first node-frame sighting.
    upd_node = seen & can_add
    lm_node = jnp.where(upd_node, nid, lm_node0)
    lm_ref = jnp.where(upd_node & (lm_ref0 < 0), nid, lm_ref0)
    lm_obs_T = jnp.where(upd_node[:, None, None], T_by, pgo.lm_obs_T)
    lm_frame = jnp.where(seen, pgo.frame, pgo.lm_frame)
    # kf_slot is the ring slot the BA keyframe landed in (callers pass an
    # out-of-range slot when no keyframe was adopted). If the keyframe WAS
    # adopted but did not become a node (invalid pose), the slot's mapping
    # must be CLEARED — leaving the previous tenant's node id behind would
    # conjugate the new keyframe by an unrelated node's delta.
    kf_node = kf_node0.at[kf_slot].set(
        jnp.where(can_add, nid, jnp.int32(-1)), mode="drop"
    )

    new_state = replace(
        pgo,
        node_pose=node_pose,
        node_active=node_active,
        node_seq=node_seq,
        node_ptr=pgo.node_ptr + jnp.where(can_add, 1, 0),
        edges=edges,
        edge_ptr=eptr,
        kf_node=kf_node,
        lm_node=lm_node,
        lm_ref=lm_ref,
        lm_obs_T=lm_obs_T,
        lm_frame=lm_frame,
        lm_loop_node=lm_loop_node,
        lm_loop_T=lm_loop_T,
        lm_loop_until=lm_loop_until,
        frame=pgo.frame + 1,
        n_loops=pgo.n_loops + n_mint,
    )
    if not solve:
        eye = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (P, 4, 4))
        return new_state, eye, jnp.asarray(False)
    return pgo_solve(new_state, opt_iters=opt_iters)


def pgo_solve(pgo: PgoState, opt_iters: int = 10):
    """Optimize the pose graph iff loop edges were minted since the last
    solve. Returns (new_state, delta (P, 4, 4), closed ()).

    Without pending loops no optimization runs, so the correction is the
    EXACT identity — never T @ inv(T), whose float32 residue (~1e-4 su at
    scene scale), applied to the landmark map every frame, feeds back
    through BA/localization with gain > 1 and diverges exponentially
    (x3/frame measured; the round-2 --pgo corruption). I @ T is exact in
    IEEE arithmetic, so the pgo=off and pgo=on paths agree bit-for-bit
    until the first genuine loop closure.
    """
    dtype = pgo.node_pose.dtype
    P = pgo.n_nodes_capacity
    pending = pgo.n_loops > pgo.n_solved

    def run_opt(poses):
        return pgo_optimize(poses, pgo.edges, active=pgo.node_active, iters=opt_iters)

    new_pose = jax.lax.cond(pending, run_opt, lambda p: p, pgo.node_pose)
    delta = jax.vmap(
        lambda nw, od, act: jnp.where(act, nw @ se3_inverse(od), jnp.eye(4, dtype=dtype))
    )(new_pose, pgo.node_pose, pgo.node_active)
    delta = jnp.where(
        pending, delta, jnp.broadcast_to(jnp.eye(4, dtype=dtype), delta.shape)
    )
    new_state = replace(
        pgo,
        node_pose=new_pose,
        n_solved=jnp.where(pending, pgo.n_loops, pgo.n_solved),
        last_opt=jnp.where(pending, pgo.frame, pgo.last_opt),
    )
    return new_state, delta, pending


def apply_node_deltas(delta: jax.Array, node_of: jax.Array, T: jax.Array) -> jax.Array:
    """Left-apply each item's node correction: T'[k] = delta[node_of[k]] @ T[k].

    Items with node_of < 0 (never referenced to a node) are unchanged.
    """
    P = delta.shape[0]
    idx = jnp.clip(node_of, 0, P - 1)
    d = jnp.where((node_of >= 0)[:, None, None], delta[idx], jnp.eye(4, dtype=T.dtype))
    return jnp.einsum("kij,kjl->kil", d, T)
