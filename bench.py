#!/usr/bin/env python3
"""Benchmark: full SLAM pipeline throughput + accuracy on the default scene.

Prints ONE JSON line:
  {"metric": "frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 2.69, ...extras}

Baseline: the reference's measured 2.69 FPS end-to-end loop on CPU
(BASELINE.md; 570 frames / 211.8 s). Extras report the ATE RMSE in sim units
against the analytic ground truth (reference bar: 1.797) and the detection
rate. Frames are reference-resolution 1000x1000, Monte-Carlo camera poses
(the --no-movement benchmark mode, simulation_engine.py:92).
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_bench")

import numpy as np


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

    cfg = SceneConfig.from_file()
    cam = PinholeCamera.from_fov(W, H, cfg.fov_y)
    scene = scene_tensors(cfg)

    traj = trajectory.monte_carlo(B * n_chunks, seed=3)
    pos = jnp.asarray(traj.positions)
    rot = jnp.asarray(traj.rotations)
    K_inv = jnp.asarray(cam.inv_matrix)

    step, init = build_slam_step(
        cfg.family,
        cam,
        cfg.tag_size_inner,
        detector_params=DetectorParams(quad_decimate=2, min_cluster_pts=12),
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

    # Timed: steady-state SLAM over all chunks.
    state = init()
    t0 = time.perf_counter()
    all_outs = []
    for c in chunks:
        state, outs = step(state, c)
        all_outs.append(outs)
    jax.block_until_ready(all_outs)
    dt = time.perf_counter() - t0
    fps = B * n_chunks / dt

    # Accuracy: ATE vs analytic GT in the anchor tag frame.
    import numpy as _np

    ids = cfg.tag_ids()
    gt_all = _np.asarray(
        camera_in_tag_frames(
            jnp.asarray(cfg.tag_positions()), jnp.asarray(cfg.tag_rotations()), pos, rot
        )
    )  # (N, T, 4, 4)
    est = _np.concatenate([_np.asarray(o.poses) for o in all_outs])
    valid = _np.concatenate([_np.asarray(o.valid) for o in all_outs])
    # Each frame's pose is expressed in that frame's coordinate-tag frame
    # (the anchor is the lowest id seen SO FAR and can change mid-run).
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
        "frames_timed": B * n_chunks,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
