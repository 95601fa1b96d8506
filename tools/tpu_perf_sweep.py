"""One-window TPU performance sweep.

The tunnelled TPU flaps; when a window opens, this script captures every
number needed to steer the perf work in one go:

  1. detect-only throughput (batched pipeline, no scan),
  2. full SLAM step with ba_schedule='frame' (the default),
  3. full SLAM step with ba_schedule='chunk' (scan-latency variant),
  4. accuracy (ATE over the distinct chunks) for both schedules,
  5. batch sweep 8/16/32 on the best schedule.

Prints one JSON line per result as it lands (print-first discipline), so a
mid-run tunnel death keeps everything measured so far.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from aprilslam_tpu.utils import configure_runtime

dev = configure_runtime(os.environ.get("SWEEP_DEVICE", "auto"))

import numpy as np
import jax
import jax.numpy as jnp

from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.sim import SceneConfig, scene_tensors, render_frames, camera_in_tag_frames, trajectory
from aprilslam_tpu.detect import DetectorParams, detect_fn
from aprilslam_tpu.slam import build_slam_step

B = int(os.environ.get("B", "8"))
H = W = int(os.environ.get("RES", "1000"))
N_CHUNKS = int(os.environ.get("CHUNKS", "6"))
PASSES = int(os.environ.get("PASSES", "8"))

print(json.dumps({"device": str(jax.devices()[0])}), flush=True)

cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(W, H, cfg.fov_y)
scene = scene_tensors(cfg)
params = DetectorParams(quad_decimate=2, min_cluster_pts=12)
traj = trajectory.monte_carlo(B * N_CHUNKS, seed=3)
pos, rot = jnp.asarray(traj.positions), jnp.asarray(traj.rotations)
chunks = [
    render_frames(scene, pos[i * B : (i + 1) * B], rot[i * B : (i + 1) * B],
                  jnp.asarray(cam.inv_matrix), H, W, 2)
    for i in range(N_CHUNKS)
]
jax.block_until_ready(chunks)


def timed_loop(fn, state=None, reps=PASSES):
    """fps over reps passes of all chunks."""
    if state is None:
        jax.block_until_ready(fn(chunks[0]))
        t0 = time.perf_counter()
        for _ in range(reps):
            for c in chunks:
                out = fn(c)
        jax.block_until_ready(out)
    else:
        s = state
        s, out = fn(s, chunks[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            for c in chunks:
                s, out = fn(s, c)
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return reps * N_CHUNKS * B / dt


def ate_of(step, init):
    state = init()
    outs_all = []
    for c in chunks:
        state, o = step(state, c)
        outs_all.append(o)
    jax.block_until_ready(outs_all)
    ids = cfg.tag_ids()
    gt_all = np.asarray(camera_in_tag_frames(
        jnp.asarray(cfg.tag_positions()), jnp.asarray(cfg.tag_rotations()), pos, rot))
    est = np.concatenate([np.asarray(o.poses) for o in outs_all])
    valid = np.concatenate([np.asarray(o.valid) for o in outs_all])
    coord = np.concatenate([np.asarray(o.coord_id) for o in outs_all])
    id_to_idx = {int(t): i for i, t in enumerate(ids)}
    t_idx = np.array([id_to_idx.get(int(c), -1) for c in coord])
    valid = valid & (t_idx >= 0)
    gt = gt_all[np.arange(len(est)), np.clip(t_idx, 0, len(ids) - 1)]
    errs = np.linalg.norm(est[valid, :3, 3] - gt[valid, :3, 3], axis=-1)
    return float(np.sqrt(np.mean(errs**2))), float(valid.mean())


# 1. detect only
det = jax.jit(detect_fn(cfg.family, params))
fps_det = timed_loop(det)
print(json.dumps({"detect_only_fps": round(fps_det, 2),
                  "detect_only_ms_per_frame": round(1e3 / fps_det, 3)}), flush=True)

# 2./3./4. full step, both schedules
for sched in ("frame", "chunk"):
    step, init = build_slam_step(
        cfg.family, cam, cfg.tag_size_inner, detector_params=params,
        estimator="ba", ba_schedule=sched,
    )
    step = jax.jit(step)
    ate, vrate = ate_of(step, init)
    fps = timed_loop(step, state=init())
    print(json.dumps({
        "schedule": sched, "fps": round(fps, 2),
        "ms_per_frame": round(1e3 / fps, 3),
        "scan_ms_per_frame": round(1e3 / fps - 1e3 / fps_det, 3),
        "ate_rmse_su": round(ate, 4), "valid_pose_rate": round(vrate, 4),
    }), flush=True)

# 5. batch sweep on the frame schedule
for Bs in (16, 32):
    trj = trajectory.monte_carlo(Bs, seed=5)
    ch = render_frames(scene, jnp.asarray(trj.positions), jnp.asarray(trj.rotations),
                       jnp.asarray(cam.inv_matrix), H, W, 2)
    jax.block_until_ready(ch)
    step, init = build_slam_step(
        cfg.family, cam, cfg.tag_size_inner, detector_params=params, estimator="ba",
    )
    step = jax.jit(step)
    s = init()
    s, o = step(s, ch)
    jax.block_until_ready(o)
    n_pass = max(1, 256 // Bs)
    t0 = time.perf_counter()
    for _ in range(n_pass):
        s, o = step(s, ch)
    jax.block_until_ready(o)
    print(json.dumps({"batch": Bs,
                      "fps": round(n_pass * Bs / (time.perf_counter() - t0), 2)}),
          flush=True)
