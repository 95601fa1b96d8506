"""The full SLAM step: frames -> detections -> poses -> graph -> estimate.

TPU-shaped control flow: detection + PnP run BATCHED over the whole frame
chunk (that is where the FLOPs are), then a lax.scan threads the sequential
graph/pose updates over the chunk's frames (tiny per-frame work). This
replaces the reference's per-frame Python loop
(simulation_engine.py:161-238 -> slam.detect / get_pose / my_pose) with one
jitted function per chunk.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp

from ..detect import DetectorParams, detect_fn
from ..families import TagFamily
from ..geometry import PinholeCamera, se3_inverse as _se3_inverse, undistort_pixels as _undistort_pixels
from ..pose import poses_from_detections
from .graph import GraphState, init_graph, update_graph, estimate_pose_average
from .localize import joint_camera_pose, pose_observability
from .ba import BAState, ba_init, ba_add_frame, ba_optimize, latest_pose
from .loop import (
    PgoState, pgo_init, pgo_track_frame, pgo_solve, apply_node_deltas,
    loop_window_open,
)
from .taggraph import (
    taggraph_init, taggraph_accumulate, taggraph_solve, taggraph_support,
)

Estimator = Literal["reference_chain", "chain_avg", "joint", "ba"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "poses", "valid", "reproj_rms", "pose_obs", "loc_used", "n_visible",
        "n_nodes", "avg_node_distance", "coord_id", "loop_closures",
        "node_visible", "node_weight", "node_local", "node_world",
        "det_ids", "det_corners", "det_ok",
    ],
    meta_fields=[],
)
@dataclass(frozen=True)
class SlamOutputs:
    poses: jax.Array  # (B, 4, 4) camera pose in world (anchor tag) frame
    valid: jax.Array  # (B,) bool
    reproj_rms: jax.Array  # (B,) joint-estimator reprojection rms (px); 0 otherwise
    # Pose observability: smallest singular value of the frame's 6-dof
    # localization Jacobian against the final map (px of corner motion per
    # unit tangent step in the least-observable direction). Near zero for a
    # single frontal distant tag, where the reprojection rms stays tiny
    # while the pose is unconstrained along the tilt continuum — gate on
    # this, not on rms (see slam/localize.py:pose_observability). 0 when
    # no mapped landmark was used. Evaluated over loc_used — the landmark
    # set the REPORTED pose was actually solved with — so a tag that was
    # detected but not yet mapped at report time cannot inflate the
    # confidence of a pose that never used it.
    pose_obs: jax.Array  # (B,) float32
    loc_used: jax.Array  # (B, M) bool: landmarks the reported localization used
    n_visible: jax.Array  # (B,) visible mapped tags
    n_nodes: jax.Array  # (B,) graph size after the frame
    avg_node_distance: jax.Array  # (B,) parity with slam.py:65-80
    # The tag frame THIS frame's pose is expressed in. The anchor is the
    # lowest id ever seen (reference slam_graph.py:33-39), so it can change
    # mid-run; evaluating a pose against GT in any other tag's frame injects
    # the full inter-tag offset as phantom error.
    coord_id: jax.Array  # (B,) int32
    loop_closures: jax.Array  # (B,) int32 cumulative loop edges (0 if PGO off)
    # Per-frame node snapshots for error attribution (the reference logs
    # these per visible node every frame, simulation_engine.py:302-356).
    node_visible: jax.Array  # (B, M) bool
    node_weight: jax.Array  # (B, M) chain depth
    node_local: jax.Array  # (B, M, 4, 4) tag->camera at last observation
    node_world: jax.Array  # (B, M, 4, 4) tag->world
    # Raw detections echoed per frame so consumers (CSV logging, offline
    # problem export for aprilslam-refine) need not re-run the detector.
    det_ids: jax.Array  # (B, D) int32, -1 padding
    det_corners: jax.Array  # (B, D, 4, 2) full-res pixels
    det_ok: jax.Array  # (B, D) bool PnP-ok


def build_slam_step(
    family: str | TagFamily,
    camera: PinholeCamera,
    tag_size: float,
    detector_params: DetectorParams | None = None,
    estimator: Estimator = "joint",
    graph_capacity: int = 64,
    pnp_iters: int = 8,
    joint_iters: int = 6,
    ba_keyframes: int = 16,
    ba_obs: int = 512,
    ba_iters_per_frame: int = 3,
    ba_schedule: Literal["frame", "chunk"] = "frame",
    ba_chunk_iters: int | None = None,
    init_joint_iters: int | None = None,
    dist_coeffs: jax.Array | None = None,
    pgo: bool = False,
    pgo_nodes: int = 64,
    pgo_edges: int = 192,
    pgo_loop_gap: int = 24,
    kf_every: int = 0,
    taggraph_every: int = 1,
    pgo_opt_iters: int | None = None,
    taggraph_iters: int | None = None,
):
    """Returns (slam_step, init_state) where
    ``slam_step(state, frames) -> (state, SlamOutputs)`` is jittable and
    processes a (B, H, W) chunk of frames sequentially w.r.t. graph state.

    With estimator="ba" the state is (GraphState, BAState): the chaining
    graph provides bootstrap initialization and the sliding-window LM bundle
    adjustment refines keyframes + landmark poses each frame.

    ``ba_schedule="chunk"`` hoists the LM-BA solve OUT of the per-frame
    scan: keyframe insertion and localization stay per-frame, but the map
    refinement runs once per chunk (after the scan) with the same total
    iteration budget. The per-frame scan is the latency-bound part of the
    step on TPU — hundreds of tiny 6x6 ops per frame that cannot use the
    MXU — so moving the solver out cuts scan work by ~B x while the map
    still converges across chunks (PTAM's tracking/mapping split,
    re-expressed for a jitted chunk pipeline).

    With ``pgo=True`` two pose graphs run alongside BA:

    * the CAMERA pose graph (slam/loop.py): node adoption + loop-edge
      minting stay in the per-frame scan; the solve runs inline per frame
      under ``ba_schedule="frame"`` and is hoisted to the chunk boundary
      under ``"chunk"`` (same hoisting as the LM-BA solve);
    * the LANDMARK pose graph (slam/taggraph.py): tag-to-tag relative
      poses accumulate from every co-visible detection pair (batched,
      outside the scan) and a small LM solve refines the landmark map
      once per chunk — the robust map corrector (hundreds of averaged
      sightings, not one PnP loop edge).

    ``init_joint_iters`` bounds the GN depth of the PRE-BA localization
    whose only job is seeding keyframe insertion (the reported pose comes
    from the post-BA localization at full ``joint_iters``, or — under the
    chunk schedule — from the post-scan batched re-localization).
    """
    detect = detect_fn(family, detector_params)
    K = jnp.asarray(camera.matrix)

    from dataclasses import replace as _replace

    from ..slam.graph import average_distance_to_nodes  # local import for clarity

    use_ba = estimator == "ba"
    use_pgo = pgo and use_ba
    ba_per_frame = ba_schedule == "frame"
    if init_joint_iters is None:
        init_joint_iters = joint_iters
    # Pose-graph LM depths: the chunk schedule re-solves every boundary
    # WARM-STARTED from the previous solution with at most a few new
    # edges, so shallow depths converge identically — measured on the
    # BASELINE config-2 workload (tools/probe_pgo_iters.py, 2026-08-21):
    # 4/3 keeps ATE bit-equal-or-better (0.6307 vs 0.6312) and lifts the
    # pgo-on/off throughput ratio 0.867 -> 0.960. The frame schedule's
    # inline solve keeps the cold-solve depths.
    if pgo_opt_iters is None:
        pgo_opt_iters = 10 if ba_per_frame else 4
    if taggraph_iters is None:
        taggraph_iters = 6 if ba_per_frame else 3

    def scatter_frame(ids, ok, corners, M):
        okm = ok & (ids >= 0) & (ids < M)
        slot = jnp.where(okm, jnp.clip(ids, 0, M - 1), M)
        corn_m = jnp.zeros((M, 4, 2), dtype=corners.dtype)
        corn_m = corn_m.at[slot].set(corners, mode="drop")
        seen = jnp.zeros((M,), bool).at[slot].set(True, mode="drop")
        return corn_m, seen

    dist = None if dist_coeffs is None else jnp.asarray(dist_coeffs)

    def _apply_taggraph(tg, ba, due):
        """Refine the landmark map against the landmark pose graph and
        conjugate each keyframe rigidly by its dominant observed tag's
        correction.

        Moving each keyframe WITH the tags it observes keeps its
        reprojection residuals unchanged, so the next window-BA pass has
        no gradient pulling the corrected tags back to the drifted
        geometry they were seeded in (measured: without keyframe
        co-motion the window acts as a rubber band and cancels the
        correction within one chunk).

        ``due`` (a () bool) gates the WHOLE solve+conjugate under
        lax.cond — the top_k edge extraction, LM solve, and keyframe
        einsums were 28% of the pgo-on throughput gap (probe 2026-08-21)
        and running them every chunk buys nothing: corrections change
        materially only after fresh evidence accumulates, so the caller
        passes (new loop edges) | (every ``taggraph_every``-th chunk).
        The skipped branch is bit-exact (state passthrough)."""
        # A tag becomes movable only once the graph holds enough averaged
        # sightings for its consensus pose to beat the live BA estimate
        # (early few-sample solves measurably HURT: +0.3 su on lap 1 of
        # the config-2 bench). Support-gating replaces a visibility hold,
        # which suppressed refinement exactly when the camera relied on
        # the tags being corrected.
        supp = taggraph_support(tg)
        movable = ba.lm_active & (supp >= 24.0)
        hold = ba.lm_active & ~movable
        do = due & jnp.any(movable) & (ba.anchor >= 0)

        def run(args):
            tg_i, ba_i = args
            Ml = ba_i.n_landmarks
            Kf = ba_i.n_keyframes
            # Edge budget sized to the landmark capacity: top_k keeps the
            # highest-count pairs anyway, so for small scenes (M=16 ->
            # <=120 possible pairs, ~10 real) a 64-edge budget is exact
            # and halves the LM solve's per-iteration edge math.
            new_lm, moved = taggraph_solve(
                tg_i, ba_i.lm_pose, ba_i.lm_active, ba_i.anchor, hold=hold,
                iters=taggraph_iters,
                max_edges=min(128, max(16, (tg_i.capacity * tg_i.capacity) // 4)))
            eye4 = jnp.eye(4, dtype=ba_i.lm_pose.dtype)
            delta_lm = jnp.where(
                (moved & movable)[:, None, None],
                jnp.einsum("mij,mjk->mik", new_lm,
                           jax.vmap(_se3_inverse)(ba_i.lm_pose)),
                eye4,
            )
            # Dominant MOVED tag per keyframe by live observation count.
            counts = jnp.zeros((Kf, Ml), jnp.float32).at[
                ba_i.obs_kf, ba_i.obs_lm
            ].add(ba_i.obs_ok.astype(jnp.float32), mode="drop")
            cm = counts * movable[None, :].astype(jnp.float32)
            m_star = jnp.argmax(cm, axis=1)
            has = (jnp.max(cm, axis=1) > 0) & ba_i.kf_active & moved
            kf_delta = jnp.where(has[:, None, None], delta_lm[m_star], eye4)
            return _replace(
                ba_i,
                lm_pose=new_lm,
                kf_pose=jnp.einsum("kij,kjl->kil", kf_delta, ba_i.kf_pose),
            )

        return jax.lax.cond(do, run, lambda args: args[1], (tg, ba))

    def slam_step(state, frames: jax.Array):
        det = detect(frames)
        if dist is not None:
            # Compensate lens distortion ONCE at the detect->geometry
            # boundary; every downstream consumer (PnP, graph, joint
            # localizer, BA) then sees pinhole-consistent corners — the
            # counterpart of the reference feeding dist_coeffs to
            # cv2.solvePnP (tag_detector.py:41).
            det = _replace(det, corners=_undistort_pixels(det.corners, K, dist))
        T_all, ok_all, _rms_all, seed_all, T_alt_all = poses_from_detections(
            det, K, tag_size, iters=pnp_iters
        )
        # Parity estimators replicate the reference's behaviour of trusting
        # every PnP pose; the accurate estimators refuse to SEED the map from
        # a planar-ambiguous pose (localization still uses all corners).
        gate_seeding = estimator in ("joint", "ba")

        def per_frame(scan_state, inp):
            if use_pgo:
                graph, ba, pgo_s = scan_state
            elif use_ba:
                graph, ba = scan_state
                pgo_s = None
            else:
                graph, ba, pgo_s = scan_state, None, None
            M = graph.capacity
            if use_ba and not ba_per_frame:
                ids, T, T_alt, ok, seed, corners, T_pre, r_pre, use_pre = inp
            else:
                ids, T, T_alt, ok, seed, corners = inp
            graph = update_graph(graph, ids, T, ok & seed if gate_seeding else ok)
            avg_T, avg_valid, graph = estimate_pose_average(
                graph, project_rotation=(estimator != "reference_chain")
            )
            # rms is ALWAYS float32: casting to frames.dtype truncated it to
            # 0-255 integers for uint8 camera frames (the serve/bench path).
            rms = jnp.zeros((), jnp.float32)
            pose = avg_T
            # Landmarks the REPORTED pose is solved with (the pose_obs
            # evaluation set): chain estimators average over the visible
            # nodes; the joint/BA branches overwrite with their GN mask.
            loc_used = graph.visible
            if estimator == "joint":
                corn_m, seen = scatter_frame(ids, ok, corners, M)
                use = seen & graph.present
                loc_used = use
                T_wc, rms = joint_camera_pose(
                    graph.world, use, corn_m, K, tag_size, avg_T, iters=joint_iters
                )
                pose = jnp.where(avg_valid, T_wc, avg_T)
                graph = _replace(graph, estimated_pose=pose)
            elif use_ba:
                # PTAM-style split: BA is the MAPPING backend over selected
                # keyframes; every frame's pose comes from joint localization
                # against the refined landmark map. Making every frame a
                # keyframe would evict old observations from the fixed-lag
                # window and leave each pose constrained by only its own
                # 1-2 tags.
                #
                # The camera pose used for keyframe insertion and landmark
                # seeding is NEVER the chain average: it is derived from a
                # branch-reliable (seed-ok) detection of an active landmark —
                # or the anchor itself on the first frame — then jointly
                # refined. A single planar-ambiguous link here poisons every
                # landmark seeded downstream of it.
                Ml = ba.n_landmarks
                eye4 = jnp.eye(4, dtype=ba.lm_pose.dtype)
                corn_m, seen = scatter_frame(ids, ok, corners, Ml)
                use = seen & ba.lm_active
                idsc = jnp.clip(ids, 0, Ml - 1)
                valid_id = (ids >= 0) & (ids < Ml)
                BIG = jnp.int32(2**30)
                anchor_eff = jnp.where(
                    ba.anchor >= 0,
                    ba.anchor,
                    jnp.min(jnp.where(ok & seed & valid_id, ids, BIG)),
                )
                mappable = ba.lm_active[idsc] | (ids == anchor_eff)
                cand = ok & seed & valid_id & mappable
                cand_loc = ok & valid_id & mappable
                has_cand = jnp.any(cand)
                # Prefer a branch-reliable candidate; fall back to any ok one.
                c_idx = jnp.argmin(
                    jnp.where(cand, ids, jnp.where(cand_loc, ids + Ml, BIG))
                )
                T_lm = jnp.where(
                    ba.lm_active[idsc[c_idx]], ba.lm_pose[idsc[c_idx]], eye4
                )

                # Dual-init localization: with a single visible tag the joint
                # GN inherits the planar branch of its init, so try BOTH
                # PnP branches and keep the better fit (with >=2 tags the
                # joint corner set disambiguates on its own).
                def localize(lm_pose, umask, T_init_a, T_init_b, iters):
                    T_a, r_a = joint_camera_pose(
                        lm_pose, umask, corn_m, K, tag_size, T_init_a,
                        iters=iters,
                    )
                    T_b, r_b = joint_camera_pose(
                        lm_pose, umask, corn_m, K, tag_size, T_init_b,
                        iters=iters,
                    )
                    pick = r_a <= r_b
                    return (
                        jnp.where(pick, T_a, T_b),
                        jnp.where(pick, r_a, r_b),
                    )

                T_wc0 = T_lm @ _se3_inverse(T[c_idx])
                T_wc0b = T_lm @ _se3_inverse(T_alt[c_idx])
                if ba_per_frame:
                    T_loc, r_loc = localize(
                        ba.lm_pose, use, T_wc0, T_wc0b, init_joint_iters)
                    T_init = jnp.where(jnp.any(use), T_loc, T_wc0)
                else:
                    # Chunk schedule: the dual-GN seeding localization ran
                    # OUTSIDE the scan, vmapped over the whole chunk against
                    # the previous chunk's map (frames are independent given
                    # the map, and the map only changes at chunk boundaries)
                    # — the scan keeps only masked bookkeeping. Frames whose
                    # visible tags were all seeded THIS chunk fall back to
                    # the PnP chain through the in-scan candidate (T_wc0),
                    # exactly the bootstrap path.
                    T_init = jnp.where(use_pre, T_pre, T_wc0)
                    r_loc = jnp.where(use_pre, r_pre, jnp.zeros((), jnp.float32))

                # Keyframe policy: adopt the frame while the window has free
                # slots, or when it can seed a tag the map lacks — but only
                # if its own pose is reliably anchored (has_cand).
                seed_new = ok & seed & valid_id & ~ba.lm_active[idsc]
                window_free = jnp.sum(ba.kf_active) < ba.n_keyframes
                # Cadence-driven turnover makes the window genuinely
                # FIXED-LAG: without it, adoption stops once the ring
                # fills and the whole run's observations stay live
                # forever — the window then acts as a rubber band pulling
                # every landmark back to the drifted geometry it was
                # seeded in (measured: it cancelled the landmark
                # pose-graph correction exactly).
                # Cadence phase comes from the PERSISTENT frame counter —
                # a chunk-local index would reset at every chunk boundary
                # and degenerate kf_every > B to one adoption per chunk.
                cadence = (ba.frame_count % kf_every == 0) if kf_every > 0 else False
                is_kf = has_cand & (jnp.any(seed_new) | window_free | cadence)

                kf_slot = ba.kf_ptr % ba.n_keyframes  # slot the keyframe lands in
                ba_kf = ba_add_frame(ba, ids, corners, ok, T_init, T, seed_ok=ok & seed)
                if ba_per_frame:
                    ba_kf = ba_optimize(ba_kf, K, tag_size, iters=ba_iters_per_frame)
                ba = jax.tree.map(
                    lambda a, b: jnp.where(is_kf, a, b), ba_kf, ba
                )
                ba = _replace(ba, frame_count=ba.frame_count + 1)

                # Re-localize against the (possibly refreshed) map, and
                # report in the GRAPH's coordinate frame (lowest id ever
                # seen — the frame coordinate_id advertises and the frame
                # every app/bench compares GT in). ba.anchor is only the BA
                # world GAUGE (first seeded tag) and can differ from the
                # coordinate tag when ids arrive out of order; reporting
                # relative to it shifts every pose by the inter-tag offset.
                use = seen & ba.lm_active
                loc_used = use
                if ba_per_frame:
                    pose_w, rms = localize(ba.lm_pose, use, T_init, T_wc0b, joint_iters)
                else:
                    # Chunk schedule: the reported pose comes from the
                    # post-scan batched re-localization against the FINAL
                    # map, so a second in-scan dual-GN solve here would be
                    # pure scan latency — reuse the seeding localization.
                    pose_w, rms = T_init, r_loc

                if use_pgo:
                    # Camera pose-graph backend: adopt keyframes as nodes,
                    # mint odometry + loop-closure edges (slam/loop.py).
                    # Under the frame schedule the solve runs inline and
                    # the per-node corrections fold into the landmark map,
                    # the BA window, and this frame's pose; under the chunk
                    # schedule minting stays here and the solve is hoisted
                    # to the chunk boundary.
                    #
                    # A re-observation of a long-unseen landmark must become
                    # a node even when the keyframe policy would skip it
                    # (full window, nothing new to seed) — otherwise the
                    # loop edge has no node to attach to. Landmarks inside
                    # an open loop window keep forcing adoption so several
                    # sightings accumulate.
                    maybe_loop = jnp.any(
                        seen & (
                            ((pgo_s.lm_node >= 0)
                             & ((pgo_s.frame - pgo_s.lm_frame) > pgo_loop_gap))
                            | loop_window_open(pgo_s)
                        )
                    )
                    is_node = is_kf | (maybe_loop & jnp.any(use))
                    # Loop/odometry measurements only from branch-reliable
                    # PnP (ok & seed): a planar-ambiguous single-tag pose fed
                    # into a loop edge claims tens of units of phantom drift.
                    pgo_s, delta, closed = pgo_track_frame(
                        pgo_s, pose_w, jnp.any(use), ids, T, ok & seed, is_node,
                        jnp.where(is_kf, kf_slot, ba.n_keyframes),
                        loop_gap=pgo_loop_gap,
                        solve=ba_per_frame,
                        opt_iters=pgo_opt_iters,
                    )
                    if ba_per_frame:
                        ba = _replace(
                            ba,
                            lm_pose=apply_node_deltas(delta, pgo_s.lm_ref, ba.lm_pose),
                            kf_pose=apply_node_deltas(delta, pgo_s.kf_node, ba.kf_pose),
                        )
                        last_node = (pgo_s.node_ptr - 1) % pgo_nodes
                        pose_w = jnp.where(
                            closed, delta[last_node] @ pose_w, pose_w
                        )

                coord = graph.coordinate_id
                c_slot = jnp.clip(coord, 0, Ml - 1)
                frame_ok = (coord >= 0) & (coord < Ml) & ba.lm_active[c_slot]
                T_wa = jnp.where(frame_ok, ba.lm_pose[c_slot], eye4)
                pose = _se3_inverse(T_wa) @ pose_w
                # Until the coordinate tag itself is an active landmark the
                # BA pose cannot be expressed in the advertised frame — fall
                # back to the chain average, which always lives there.
                ba_valid = jnp.any(use) & (jnp.any(cand_loc) | avg_valid) & frame_ok
                pose = jnp.where(ba_valid, pose, avg_T)
                graph = _replace(graph, estimated_pose=pose)

            out = SlamOutputs(
                poses=pose,
                valid=avg_valid,
                reproj_rms=rms,
                # Filled in by the post-scan batched observability pass
                # (one vmapped jacfwd against the FINAL map — not scan work).
                pose_obs=jnp.zeros((), jnp.float32),
                loc_used=loc_used,
                n_visible=jnp.sum(graph.visible),
                n_nodes=jnp.sum(graph.present),
                avg_node_distance=average_distance_to_nodes(graph),
                coord_id=graph.coordinate_id,
                loop_closures=(pgo_s.n_loops if use_pgo else jnp.int32(0)),
                node_visible=graph.visible,
                node_weight=graph.weight,
                node_local=graph.local,
                node_world=graph.world,
                det_ids=ids,
                det_corners=corners,
                det_ok=ok,
            )
            if use_pgo:
                return (graph, ba, pgo_s), out
            return ((graph, ba) if use_ba else graph), out

        if use_pgo:
            _g0, _ba0, _pgo0, tg = state
            scan_state = (_g0, _ba0, _pgo0)
        else:
            scan_state = state

        xs = (det.ids, T_all, T_alt_all, ok_all, seed_all, det.corners)
        if use_ba and not ba_per_frame:
            # Batched pre-localization against the previous chunk's map:
            # one vmapped dual-init GN pass (MXU-parallel over frames)
            # replaces B sequential in-scan solves.
            _ba_in = scan_state[1]
            lm_pose0, lm_active0 = _ba_in.lm_pose, _ba_in.lm_active
            Ml0 = _ba_in.n_landmarks
            eye40 = jnp.eye(4, dtype=lm_pose0.dtype)
            BIG0 = jnp.int32(2**30)

            def pre_localize(ids_b, ok_b, seed_b, corners_b, T_b, T_alt_b):
                corn_m, seen = scatter_frame(ids_b, ok_b, corners_b, Ml0)
                use = seen & lm_active0
                idsc = jnp.clip(ids_b, 0, Ml0 - 1)
                valid_id = (ids_b >= 0) & (ids_b < Ml0)
                mappable = lm_active0[idsc]
                cand = ok_b & seed_b & valid_id & mappable
                cand_loc = ok_b & valid_id & mappable
                c_idx = jnp.argmin(
                    jnp.where(cand, ids_b,
                              jnp.where(cand_loc, ids_b + Ml0, BIG0))
                )
                T_lm = jnp.where(
                    lm_active0[idsc[c_idx]], lm_pose0[idsc[c_idx]], eye40
                )
                T0a = T_lm @ _se3_inverse(T_b[c_idx])
                T0b = T_lm @ _se3_inverse(T_alt_b[c_idx])
                T_a, r_a = joint_camera_pose(
                    lm_pose0, use, corn_m, K, tag_size, T0a,
                    iters=init_joint_iters)
                T_bb, r_b = joint_camera_pose(
                    lm_pose0, use, corn_m, K, tag_size, T0b,
                    iters=init_joint_iters)
                pick = r_a <= r_b
                return (
                    jnp.where(pick, T_a, T_bb),
                    jnp.where(pick, r_a, r_b).astype(jnp.float32),
                    jnp.any(use),
                )

            T_pre_all, r_pre_all, use_pre_all = jax.vmap(pre_localize)(
                det.ids, ok_all, seed_all, det.corners, T_all, T_alt_all)
            xs = xs + (T_pre_all, r_pre_all, use_pre_all)

        scan_state, outs = jax.lax.scan(per_frame, scan_state, xs)

        if use_ba and not ba_per_frame:
            # Chunk-level mapping pass: one LM-BA solve refines the map for
            # the NEXT chunk's localizations. Budget matches the per-frame
            # schedule's total (B * ba_iters_per_frame), so accuracy-per-
            # compute is traded for scan latency, not dropped.
            B = frames.shape[0]
            if use_pgo:
                graph, ba, pgo_s = scan_state
            else:
                graph, ba = scan_state
            chunk_iters = (
                ba_chunk_iters if ba_chunk_iters is not None
                else min(B * ba_iters_per_frame, 16)
            )
            if chunk_iters > 0:
                ba = ba_optimize(ba, K, tag_size, iters=chunk_iters)

            if use_pgo:
                # Hoisted camera pose-graph solve (mirrors the LM-BA
                # hoisting): fold every loop edge minted during the chunk
                # into ONE optimization, then conjugate the keyframe
                # window by the per-node corrections. The landmark map is
                # corrected by the landmark pose graph below, not by node
                # conjugation — node deltas distribute the loop error
                # evenly along the odometry chain, which is exactly the
                # noise-sensitive correction round 3 shipped.
                #
                # Idle gating (probe 2026-08-21: chunk-boundary work was
                # 93% of the 21% pgo-on throughput cost): the solve AND
                # the delta/conjugation einsums run only when loop edges
                # are actually pending — with an identity delta the
                # application is a bit-exact no-op, so skipping it is
                # free accuracy-wise.
                pending = pgo_s.n_loops > pgo_s.n_solved

                def _do_pgo(args):
                    ba_i, pgo_i = args
                    pgo_o, delta, _closed = pgo_solve(pgo_i, opt_iters=pgo_opt_iters)
                    return _replace(
                        ba_i,
                        kf_pose=apply_node_deltas(delta, pgo_o.kf_node, ba_i.kf_pose),
                    ), pgo_o

                ba, pgo_s = jax.lax.cond(
                    pending, _do_pgo, lambda args: args, (ba, pgo_s))
                # Landmark pose graph: accumulate this chunk's co-visible
                # detection pairs (batched — outside the scan) and refine
                # the landmark map against the averaged relative-pose
                # graph, gauge-fixed at the anchor. Tags with fewer than
                # 24 accumulated pair sightings are HELD (support gate in
                # _apply_taggraph) — the live BA/localization estimate
                # beats an early few-sample graph mean, and held tags
                # double as consistency anchors pulling the rest. The
                # solve runs on new loop edges or every taggraph_every-th
                # chunk; accumulation is unconditional (it IS the
                # evidence).
                tg = taggraph_accumulate(tg, det.ids, T_all, ok_all & seed_all)
                chunk_idx = ba.frame_count // frames.shape[0]
                cadence = (
                    (chunk_idx % taggraph_every) == 0
                    if taggraph_every > 1 else jnp.asarray(True)
                )
                ba = _apply_taggraph(tg, ba, due=pending | cadence)
                state = (graph, ba, pgo_s, tg)
            else:
                state = (graph, ba)

            # Batched re-localization: every frame of the chunk is refined
            # against the FINAL map in ONE vmapped GN pass (parallel over
            # frames — MXU work, not scan latency). This recovers — and
            # typically beats — the per-frame schedule's accuracy, whose
            # early frames only ever saw an early map.
            Ml = ba.n_landmarks
            eye4 = jnp.eye(4, dtype=ba.lm_pose.dtype)

            def reloc(ids_b, ok_b, corners_b, pose_b, coord_b, valid_b, rms_b):
                corn_m, seen = scatter_frame(ids_b, ok_b, corners_b, Ml)
                use = seen & ba.lm_active
                c_slot = jnp.clip(coord_b, 0, Ml - 1)
                frame_ok = (coord_b >= 0) & (coord_b < Ml) & ba.lm_active[c_slot]
                T_wa = jnp.where(frame_ok, ba.lm_pose[c_slot], eye4)
                pose_w0 = T_wa @ pose_b  # anchor-relative -> BA world
                T_w, _rms = joint_camera_pose(
                    ba.lm_pose, use, corn_m, K, tag_size, pose_w0,
                    iters=joint_iters,
                )
                refined = _se3_inverse(T_wa) @ T_w
                keep = valid_b & frame_ok & jnp.any(use)
                # Report the rms of the pose actually returned, so quality
                # metrics correspond to the reported poses.
                return (
                    jnp.where(keep, refined, pose_b),
                    jnp.where(keep, _rms.astype(rms_b.dtype), rms_b),
                )

            poses_r, rms_r = jax.vmap(reloc)(
                det.ids, ok_all, det.corners, outs.poses, outs.coord_id,
                outs.valid, outs.reproj_rms,
            )
            outs = _replace(outs, poses=poses_r, reproj_rms=rms_r)
        elif use_pgo:
            # Frame schedule: the camera pose-graph solve already ran
            # inline; fold the chunk's detections into the landmark pose
            # graph and refine the map on the taggraph_every cadence
            # (low-support tags held, as in the chunk schedule).
            graph, ba, pgo_s = scan_state
            tg = taggraph_accumulate(tg, det.ids, T_all, ok_all & seed_all)
            chunk_idx = ba.frame_count // frames.shape[0]
            cadence = (
                (chunk_idx % taggraph_every) == 0
                if taggraph_every > 1 else jnp.asarray(True)
            )
            ba = _apply_taggraph(tg, ba, due=cadence)
            state = (graph, ba, pgo_s, tg)
        else:
            state = scan_state

        # Per-frame pose observability against the FINAL map, batched over
        # the chunk (one vmapped jacfwd — MXU work, not scan latency).
        # Uses whichever map the estimator maintains: BA landmarks, else
        # the chaining graph (whose world frame IS the coordinate frame,
        # making T_wa the identity there).
        if use_ba:
            _ba_f = state[1]
            world_f, active_f = _ba_f.lm_pose, _ba_f.lm_active
        else:
            world_f, active_f = state.world, state.present
        Mf = world_f.shape[0]
        eye4f = jnp.eye(4, dtype=world_f.dtype)

        def frame_obs(ids_b, ok_b, corners_b, pose_b, coord_b, valid_b, used_b):
            c_slot = jnp.clip(coord_b, 0, Mf - 1)
            frame_ok = (coord_b >= 0) & (coord_b < Mf) & active_f[c_slot]
            if use_ba and not ba_per_frame:
                # The chunk schedule's reloc pass re-solved the reported
                # pose against the FINAL map; mirror its keep-mask so the
                # evaluation set matches the pose actually returned (and
                # falls back to the in-scan set exactly when reloc did).
                _, seen = scatter_frame(ids_b, ok_b, corners_b, Mf)
                use_full = seen & active_f
                keep = valid_b & frame_ok & jnp.any(use_full)
                use_b = jnp.where(keep, use_full, used_b)
            else:
                use_b = used_b
            T_wa = jnp.where(frame_ok, world_f[c_slot], eye4f)
            s = pose_observability(world_f, use_b, K, tag_size, T_wa @ pose_b)
            return jnp.where(valid_b & frame_ok & jnp.any(use_b), s, 0.0)

        obs = jax.vmap(frame_obs)(
            det.ids, ok_all, det.corners, outs.poses, outs.coord_id,
            outs.valid, outs.loc_used,
        )
        outs = _replace(outs, pose_obs=obs)
        return state, outs

    def init():
        g = init_graph(graph_capacity)
        if use_pgo:
            return (
                g,
                ba_init(ba_keyframes, graph_capacity, ba_obs),
                pgo_init(pgo_nodes, pgo_edges, graph_capacity, ba_keyframes),
                taggraph_init(graph_capacity),
            )
        if use_ba:
            return (g, ba_init(ba_keyframes, graph_capacity, ba_obs))
        return g

    return slam_step, init


class SlamSystem:
    """Stateful convenience wrapper (host-side loop driver).

    Parity with the reference SLAM facade (slam.py:9-97): detect + per-tag
    pose + graph maintenance + pose estimate, but consuming whole frame
    chunks per call.
    """

    def __init__(
        self,
        camera: PinholeCamera,
        family: str | TagFamily = "tagStandard41h12",
        tag_size: float = 10.0,
        estimator: Estimator = "joint",
        detector_params: DetectorParams | None = None,
        graph_capacity: int = 64,
        dist_coeffs=None,
        pgo: bool = False,
        pgo_nodes: int = 64,
        pgo_edges: int = 192,
        pgo_loop_gap: int = 24,
        ba_schedule: Literal["frame", "chunk"] = "frame",
        ba_chunk_iters: int | None = None,
        init_joint_iters: int | None = None,
        kf_every: int = 0,
        taggraph_every: int = 1,
        pgo_opt_iters: int | None = None,
        taggraph_iters: int | None = None,
    ):
        self._step, self._init = build_slam_step(
            family, camera, tag_size,
            detector_params=detector_params,
            estimator=estimator,
            graph_capacity=graph_capacity,
            dist_coeffs=dist_coeffs,
            pgo=pgo,
            pgo_nodes=pgo_nodes,
            pgo_edges=pgo_edges,
            pgo_loop_gap=pgo_loop_gap,
            ba_schedule=ba_schedule,
            ba_chunk_iters=ba_chunk_iters,
            init_joint_iters=init_joint_iters,
            kf_every=kf_every,
            taggraph_every=taggraph_every,
            pgo_opt_iters=pgo_opt_iters,
            taggraph_iters=taggraph_iters,
        )
        self._step = jax.jit(self._step)
        self.state = self._init()

    def process(self, frames) -> SlamOutputs:
        self.state, outs = self._step(self.state, frames)
        return outs

    @property
    def graph_state(self) -> GraphState:
        return self.state[0] if isinstance(self.state, tuple) else self.state

    @property
    def ba_state(self):
        return self.state[1] if isinstance(self.state, tuple) else None

    @property
    def pgo_state(self):
        return self.state[2] if isinstance(self.state, tuple) and len(self.state) > 2 else None

    @property
    def coordinate_id(self) -> int:
        return int(self.graph_state.coordinate_id)

    def reset(self):
        self.state = self._init()
