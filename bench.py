#!/usr/bin/env python3
"""Benchmark: full SLAM pipeline throughput + accuracy + per-stage breakdown.

Prints ONE JSON line:
  {"metric": "frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 2.69, "stage_ms_per_frame": {...},
   "batch_sweep_fps": {...}, ...extras}

Baseline: the reference's measured 2.69 FPS end-to-end loop on CPU
(BASELINE.md; 570 frames / 211.8 s). Extras report the ATE RMSE in sim units
against the analytic ground truth (reference bar: 1.797), the valid-pose
rate, a batch sweep {8, 16, 32}, and a per-stage ms/frame breakdown
(threshold / CCL / quads / decode+refine / PnP / graph+BA) so the next
optimization target is visible. Frames are reference-resolution 1000x1000,
Monte-Carlo camera poses (the --no-movement benchmark mode,
simulation_engine.py:92). >=512 frames are timed by cycling pre-rendered
chunks through the jitted step in steady state.

Env knobs: BENCH_BATCH (headline batch), BENCH_RES, BENCH_CHUNKS,
BENCH_PASSES, BENCH_SWEEP=0 to skip the sweep, BENCH_STAGES=0 to skip the
breakdown, BENCH_ESTIMATOR.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_bench")

import numpy as np


def _time_fn(fn, args, reps, warmup=2):
    """Median wall time of fn(*args) with block_until_ready, in seconds."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def stage_breakdown(cfg, cam, frames, params, reps=8):
    """Per-stage ms/frame on one frame chunk, each stage jitted separately
    and fed the previous stage's materialized output."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from aprilslam_tpu.detect.threshold import to_grayscale, decimate, adaptive_threshold_with_levels
    from aprilslam_tpu.detect.segment import connected_components_auto
    from aprilslam_tpu.detect.quads import quad_candidates
    from aprilslam_tpu.detect.decode import decode_quads, FamilyTensors
    from aprilslam_tpu.detect.refine import refine_corners
    from aprilslam_tpu.families import get_family
    from aprilslam_tpu.pose import poses_from_detections

    p = params
    fam = get_family(cfg.family)
    ft = FamilyTensors(fam)
    B = frames.shape[0]
    K = jnp.asarray(cam.matrix)

    thresh = jax.jit(lambda f: adaptive_threshold_with_levels(
        decimate(to_grayscale(f), p.quad_decimate), tile=p.tile, min_contrast=p.min_contrast))
    gray = to_grayscale(frames)
    trinary, level = thresh(frames)

    ccl = jax.jit(lambda t: connected_components_auto(t, p.scan_iters, p.jump_iters))
    labels = ccl(trinary)

    quads_fn = jax.jit(lambda t, l, g, lv: quad_candidates(
        t, l, g, p.quad_decimate, lv,
        max_clusters=p.max_clusters, max_quads=p.max_quads,
        pts_per_quad=p.pts_per_quad, min_cluster_pts=p.min_cluster_pts,
        min_side=p.min_side, refine_iters=p.refine_iters,
        max_fit_err=p.max_fit_err, max_boundary=p.max_boundary))
    dec = decimate(gray, p.quad_decimate)
    quads = quads_fn(trinary, labels, dec, level)

    decode = jax.jit(lambda g, q: decode_quads(
        g, q, ft, max_hamming=p.max_hamming,
        min_level_contrast=p.min_level_contrast, max_detections=p.max_detections))
    det = decode(gray, quads)

    refine = jax.jit(lambda g, c, v: refine_corners(
        g, c, v, ns=p.refine_samples, half_range=p.refine_range))
    _ = refine(gray, det.corners, det.valid)

    pnp = jax.jit(lambda d: poses_from_detections(d, K, cfg.tag_size_inner))
    _ = pnp(det)

    ms = {}
    ms["threshold"] = _time_fn(thresh, (frames,), reps) / B * 1e3
    ms["ccl"] = _time_fn(ccl, (trinary,), reps) / B * 1e3
    ms["quads"] = _time_fn(quads_fn, (trinary, labels, dec, level), reps) / B * 1e3
    ms["decode"] = _time_fn(decode, (gray, quads), reps) / B * 1e3
    ms["refine"] = _time_fn(refine, (gray, det.corners, det.valid), reps) / B * 1e3
    ms["pnp"] = _time_fn(pnp, (det,), reps) / B * 1e3
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from aprilslam_tpu.geometry import PinholeCamera
    from aprilslam_tpu.sim import SceneConfig, scene_tensors, render_frames, camera_in_tag_frames
    from aprilslam_tpu.sim import trajectory
    from aprilslam_tpu.detect import DetectorParams
    from aprilslam_tpu.slam import build_slam_step

    B = int(os.environ.get("BENCH_BATCH", "8"))
    H = W = int(os.environ.get("BENCH_RES", "1000"))
    n_chunks = int(os.environ.get("BENCH_CHUNKS", "6"))
    passes = int(os.environ.get("BENCH_PASSES", "11"))  # 11*6*8 = 528 frames
    do_sweep = os.environ.get("BENCH_SWEEP", "1") != "0"
    do_stages = os.environ.get("BENCH_STAGES", "1") != "0"

    cfg = SceneConfig.from_file()
    cam = PinholeCamera.from_fov(W, H, cfg.fov_y)
    scene = scene_tensors(cfg)
    params = DetectorParams(quad_decimate=2, min_cluster_pts=12)

    traj = trajectory.monte_carlo(B * n_chunks, seed=3)
    pos = jnp.asarray(traj.positions)
    rot = jnp.asarray(traj.rotations)
    K_inv = jnp.asarray(cam.inv_matrix)

    step, init = build_slam_step(
        cfg.family,
        cam,
        cfg.tag_size_inner,
        detector_params=params,
        estimator=os.environ.get("BENCH_ESTIMATOR", "ba"),
    )
    # NOTE: no donate_argnums — buffer donation trips an INVALID_ARGUMENT in
    # the axon TPU backend (verified empirically; works fine without).
    step = jax.jit(step)

    # Pre-render all frame chunks on device (the harness, not the benchmark).
    chunks = [
        render_frames(scene, pos[i * B : (i + 1) * B], rot[i * B : (i + 1) * B], K_inv, H, W, 2)
        for i in range(n_chunks)
    ]
    jax.block_until_ready(chunks)

    # Warmup / compile.
    state = init()
    state, outs = step(state, chunks[0])
    jax.block_until_ready(outs)

    # Accuracy pass: one sweep over the distinct chunks from a fresh state.
    state = init()
    all_outs = []
    for c in chunks:
        state, outs = step(state, c)
        all_outs.append(outs)
    jax.block_until_ready(all_outs)

    # Timed: steady state, >=512 frames by cycling the pre-rendered chunks.
    t0 = time.perf_counter()
    for _ in range(passes):
        for c in chunks:
            state, outs = step(state, c)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    frames_timed = passes * n_chunks * B
    fps = frames_timed / dt

    # Accuracy: ATE vs analytic GT, each frame in ITS OWN coordinate frame
    # (the anchor is the lowest id seen so far and can change mid-run).
    import numpy as _np

    ids = cfg.tag_ids()
    gt_all = _np.asarray(
        camera_in_tag_frames(
            jnp.asarray(cfg.tag_positions()), jnp.asarray(cfg.tag_rotations()), pos, rot
        )
    )  # (N, T, 4, 4)
    est = _np.concatenate([_np.asarray(o.poses) for o in all_outs])
    valid = _np.concatenate([_np.asarray(o.valid) for o in all_outs])
    coord = _np.concatenate([_np.asarray(o.coord_id) for o in all_outs])
    id_to_idx = {int(t): i for i, t in enumerate(ids)}
    t_idx = _np.array([id_to_idx.get(int(c), -1) for c in coord])
    valid = valid & (t_idx >= 0)
    gt = gt_all[_np.arange(len(est)), _np.clip(t_idx, 0, len(ids) - 1)]
    errs = _np.linalg.norm(est[valid, :3, 3] - gt[valid, :3, 3], axis=-1)
    ate_rmse = float(_np.sqrt(_np.mean(errs**2))) if len(errs) else float("nan")

    result = {
        "metric": "frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 2.69, 2),
        "ate_rmse_sim_units": round(ate_rmse, 4),
        "ate_rmse_baseline": 1.797,
        "valid_pose_rate": round(float(valid.mean()), 3),
        "batch": B,
        "resolution": f"{W}x{H}",
        "frames_timed": frames_timed,
        "device": str(jax.devices()[0]),
    }

    if do_sweep:
        sweep = {str(B): round(fps, 2)}
        for Bs in (16, 32):
            if Bs == B:
                continue
            trj = trajectory.monte_carlo(Bs, seed=5)
            ch = render_frames(
                scene, jnp.asarray(trj.positions), jnp.asarray(trj.rotations),
                K_inv, H, W, 2,
            )
            jax.block_until_ready(ch)
            step_s, init_s = build_slam_step(
                cfg.family, cam, cfg.tag_size_inner,
                detector_params=params, estimator="ba",
            )
            step_s = jax.jit(step_s)
            st = init_s()
            st, o = step_s(st, ch)
            jax.block_until_ready(o)
            n_pass = max(1, 128 // Bs)
            t0 = time.perf_counter()
            for _ in range(n_pass):
                st, o = step_s(st, ch)
            jax.block_until_ready(o)
            sweep[str(Bs)] = round(n_pass * Bs / (time.perf_counter() - t0), 2)
        result["batch_sweep_fps"] = sweep

    if do_stages:
        ms = stage_breakdown(cfg, cam, chunks[0], params)
        full_ms = 1e3 / fps
        ms["slam_scan"] = round(max(0.0, full_ms - sum(ms.values())), 3)
        result["stage_ms_per_frame"] = {k: round(v, 3) for k, v in ms.items()}

    print(json.dumps(result))


if __name__ == "__main__":
    main()
