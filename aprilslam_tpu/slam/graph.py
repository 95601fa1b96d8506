"""Tag-landmark graph: functional, fixed-capacity, jit-native.

Capability parity with the reference SLAMGraph/Node (slam_graph.py:5-90) and
SLAM.my_pose (slam.py:36-63), redesigned for XLA:

* The dict-of-Nodes becomes fixed-capacity padded arrays indexed by tag id
  (slot i <-> tag id i), with masks — static shapes for jit.
* ``add_or_update_node``'s chaining rules (anchor at the lowest id ever seen,
  direct chaining through the minimum-id visible tag, multi-hop through its
  reference with weight += 1, re-observation keeps world) are reproduced as a
  scan over the frame's (id-sorted) detections.
* The reference's ``update_world()`` — an acknowledged unimplemented TODO
  (slam_graph.py:72-76): on re-anchoring it leaves every stored world
  transform in the OLD anchor frame — is implemented properly here: when a
  lower id becomes the anchor, all worlds are conjugated into the new frame.
* ``my_pose``'s naive elementwise SE(3) matrix averaging (slam.py:41-63) is
  available for parity (estimator="reference_chain"), with an SO(3)-projected
  variant as the default and a joint reprojection Gauss-Newton estimator in
  slam/localize.py as the accurate option.

All transforms follow the reference conventions: ``T`` = camera->tag (PnP
output), ``local`` = inv(T) = tag->camera... strictly ``local`` maps camera
frame to tag frame; ``world`` maps tag frame to the anchor ("world") frame;
``world @ local`` is therefore the camera pose in the world frame.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3_inverse, project_to_so3

NO_ANCHOR = jnp.int32(2**30)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "local", "world", "weight", "present", "visible", "updated",
        "reference", "coordinate_id", "estimated_pose", "has_estimate",
    ],
    meta_fields=[],
)
@dataclass(frozen=True)
class GraphState:
    local: jax.Array  # (M, 4, 4) camera->tag at last observation, inverted
    world: jax.Array  # (M, 4, 4) tag->world
    weight: jax.Array  # (M,) chain depth weight (1 = direct)
    present: jax.Array  # (M,) bool: tag has a node
    visible: jax.Array  # (M,) bool: tag seen in the latest frame
    updated: jax.Array  # (M,) bool: world refreshed in the latest update
    reference: jax.Array  # (M,) int32: chaining reference id
    coordinate_id: jax.Array  # () int32: anchor tag id (NO_ANCHOR if none)
    estimated_pose: jax.Array  # (4, 4) last camera pose estimate
    has_estimate: jax.Array  # () bool

    @property
    def capacity(self) -> int:
        return int(self.local.shape[0])


def init_graph(capacity: int = 64, dtype=jnp.float32) -> GraphState:
    eye = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (capacity, 4, 4))
    return GraphState(
        local=eye,
        world=eye,
        weight=jnp.ones((capacity,), dtype),
        present=jnp.zeros((capacity,), bool),
        visible=jnp.zeros((capacity,), bool),
        updated=jnp.zeros((capacity,), bool),
        reference=jnp.full((capacity,), NO_ANCHOR, jnp.int32),
        coordinate_id=NO_ANCHOR,
        estimated_pose=jnp.eye(4, dtype=dtype),
        has_estimate=jnp.asarray(False),
    )


def update_graph(
    state: GraphState,
    ids: jax.Array,  # (D,) int32, sorted ascending, -1/garbage where not ok
    T_cam_tag: jax.Array,  # (D, 4, 4)
    ok: jax.Array,  # (D,) bool
) -> GraphState:
    """Process one frame's detections (slam_graph.py:29-59 semantics)."""
    M = state.capacity
    T_cam_tag = T_cam_tag.astype(state.local.dtype)
    ids = ids.astype(jnp.int32)
    ids = jnp.where(ok, ids, NO_ANCHOR)
    in_range = ok & (ids >= 0) & (ids < M)

    # Visible set for this frame (slam.py:24). Invalid ids scatter out of
    # bounds (dropped) so they cannot clobber a valid detection's slot.
    vis = jnp.zeros((M,), bool)
    vis = vis.at[jnp.where(in_range, jnp.clip(ids, 0, M - 1), M)].set(True, mode="drop")
    min_visible = jnp.min(jnp.where(in_range, ids, NO_ANCHOR))

    # --- anchor update (slam_graph.py:33-39), with PROPER re-anchoring ----
    old_anchor = state.coordinate_id
    new_anchor = jnp.minimum(old_anchor, min_visible)

    def reanchor(state):
        # A strictly lower id was seen. The new anchor tag's world in the OLD
        # frame is computable after it is inserted; but at this point it is
        # new, so we chain it through the min-id *previously known* visible
        # tag r: world_a_old = world_r @ inv(T_r) @ T_a. Then conjugate every
        # stored world into the new frame: world_i' = inv(world_a_old) @ world_i.
        #
        # CRITICAL: T_r must be tag r's detection from THIS frame —
        # state.local[r] is from r's *previous* observation, i.e. a different
        # camera pose. Chaining through the stale local injects the full
        # inter-frame camera motion into the conjugation shift and rigidly
        # corrupts every stored world (catastrophic for teleporting
        # Monte Carlo trajectories, where the motion is the whole scene).
        a = new_anchor
        a_slot = jnp.clip(a, 0, M - 1)
        # position of the anchor detection in this frame's arrays
        d_idx = jnp.argmax(ids == a)
        T_a = T_cam_tag[d_idx]
        known_vis = vis & state.present
        r = jnp.min(jnp.where(known_vis, jnp.arange(M), NO_ANCHOR))
        has_ref = r < NO_ANCHOR
        r_slot = jnp.clip(r, 0, M - 1)
        r_idx = jnp.argmax(ids == r)  # r is visible this frame by construction
        T_r = T_cam_tag[r_idx]
        world_a_old = jnp.where(
            has_ref,
            state.world[r_slot] @ (se3_inverse(T_r) @ T_a),
            jnp.eye(4, dtype=T_a.dtype),
        )
        shift = se3_inverse(world_a_old)
        new_world = jnp.einsum("ij,mjk->mik", shift, state.world)
        new_world = jnp.where(state.present[:, None, None], new_world, state.world)
        return replace(
            state,
            world=new_world,
            coordinate_id=a.astype(jnp.int32),
        )

    need_reanchor = (old_anchor < NO_ANCHOR) & (min_visible < old_anchor)
    # Unconditional compute + select (cheap: one (M,4,4) matmul) — keeps the
    # function shard_map-safe where lax.cond branches would disagree on
    # varying-axis types.
    re_state = reanchor(state)
    state = replace(
        state,
        world=jnp.where(need_reanchor, re_state.world, state.world),
        coordinate_id=jnp.where(need_reanchor, re_state.coordinate_id, state.coordinate_id),
    )
    anchor = jnp.where(old_anchor == NO_ANCHOR, min_visible, jnp.minimum(old_anchor, min_visible))
    state = replace(
        state,
        coordinate_id=jnp.where(min_visible < NO_ANCHOR, anchor, old_anchor).astype(jnp.int32),
    )

    # --- per-detection insert/update, scanned in ascending id order --------
    def step(carry, inp):
        local, world, weight, present, updated, referenc = carry
        tag_id, T, valid = inp
        slot = jnp.clip(tag_id, 0, M - 1)
        anchor_id = state.coordinate_id

        is_anchor = tag_id == anchor_id
        localT = se3_inverse(T)

        # reference = min visible id (slam_graph.py:41)
        ref = min_visible
        ref_slot = jnp.clip(ref, 0, M - 1)
        ref_is_anchor = ref == anchor_id
        already = present[slot]
        ref_known = present[ref_slot] & (ref != tag_id)

        # candidate worlds
        w_anchor = jnp.eye(4, dtype=T.dtype)
        w_direct = local[ref_slot] @ T  # get_world (slam_graph.py:68-70)
        w_hop = world[ref_slot] @ (local[ref_slot] @ T)  # find_world (:61-66)
        keep_w = world[slot]

        case_anchor = is_anchor
        case_direct = (~is_anchor) & ref_is_anchor & ref_known
        case_keep = (~is_anchor) & (~case_direct) & already & (referenc[slot] == anchor_id)
        case_hop = (~is_anchor) & (~case_direct) & (~case_keep) & ref_known
        handled = case_anchor | case_direct | case_keep | case_hop

        new_world = jnp.where(
            case_anchor[..., None, None], w_anchor,
            jnp.where(case_direct[..., None, None], w_direct,
                      jnp.where(case_keep[..., None, None], keep_w, w_hop)))
        new_weight = jnp.where(
            case_anchor | case_direct, 1.0,
            jnp.where(case_keep, weight[slot], weight[ref_slot] + 1.0))
        new_ref = jnp.where(
            case_anchor, tag_id,
            jnp.where(case_direct | case_keep, anchor_id, referenc[ref_slot]))
        new_updated = ~case_keep

        do = valid & (tag_id >= 0) & (tag_id < M) & handled
        local = local.at[slot].set(jnp.where(do[..., None, None], localT, local[slot]))
        world = world.at[slot].set(jnp.where(do[..., None, None], new_world, world[slot]))
        weight = weight.at[slot].set(jnp.where(do, new_weight, weight[slot]))
        present = present.at[slot].set(jnp.where(do, True, present[slot]))
        updated = updated.at[slot].set(jnp.where(do, new_updated, updated[slot]))
        referenc = referenc.at[slot].set(jnp.where(do, new_ref, referenc[slot]))
        return (local, world, weight, present, updated, referenc), None

    carry = (state.local, state.world, state.weight, state.present, state.updated, state.reference)
    carry, _ = jax.lax.scan(step, carry, (ids, T_cam_tag, in_range))
    local, world, weight, present, updated, referenc = carry
    return replace(
        state,
        local=local,
        world=world,
        weight=weight,
        present=present,
        updated=updated,
        reference=referenc,
        visible=vis & present,
    )


def estimate_pose_average(
    state: GraphState, project_rotation: bool = True
) -> tuple[jax.Array, jax.Array, GraphState]:
    """The reference ``my_pose`` weighted average (slam.py:36-63).

    Returns (T_avg (4,4), valid, state with estimated_pose cached). With
    ``project_rotation`` the averaged rotation block is projected back onto
    SO(3) (the reference skips this — its estimate is not a rigid transform).
    """
    w = jnp.where(state.visible, 1.0 / state.weight, 0.0)
    T_cam_world = state.world @ state.local  # (M, 4, 4) camera pose per tag
    T_sum = jnp.einsum("m,mij->ij", w, T_cam_world)
    count = jnp.sum(w)
    valid = count > 0
    T_avg = T_sum / jnp.where(valid, count, 1.0)
    if project_rotation:
        R = project_to_so3(T_avg[:3, :3])
        T_avg = T_avg.at[:3, :3].set(R)
    T_avg = jnp.where(valid, T_avg, jnp.eye(4, dtype=T_avg.dtype))
    state = replace(state, estimated_pose=T_avg, has_estimate=valid | state.has_estimate)
    return T_avg, valid, state


def average_distance_to_nodes(state: GraphState) -> jax.Array:
    """Mean ||translation(local)|| over present nodes (slam.py:65-80)."""
    d = jnp.linalg.norm(state.local[:, :3, 3], axis=-1)
    n = jnp.sum(state.present)
    return jnp.sum(jnp.where(state.present, d, 0.0)) / jnp.maximum(n, 1)
