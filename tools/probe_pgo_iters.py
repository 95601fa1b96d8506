"""TPU probe: LM-iteration depth of the chunk-boundary solves vs the
pgo-on throughput ratio and config-2 accuracy.

The chunk schedule re-solves the camera pose graph and the landmark pose
graph every chunk WARM-STARTED from the previous solution with at most a
couple of new edges — the full 10/6 LM depths are sized for a cold solve.
This measures fps_on, the on/off ratio, and the ATE for several depth
combos on the BASELINE config-2 workload (randomized scene, two-lap loop)
to pick production defaults.

Run: python tools/probe_pgo_iters.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from aprilslam_tpu.utils import configure_runtime, enable_compilation_cache

enable_compilation_cache()
configure_runtime(os.environ.get("DEVICE", "auto"))

import numpy as np
import jax
import jax.numpy as jnp

from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.sim import (
    SceneConfig, scene_tensors, render_frames, trajectory, randomize_scene,
    DEFAULT_SCENE,
)
from aprilslam_tpu.detect import DetectorParams
from aprilslam_tpu.slam import build_slam_step
from aprilslam_tpu.sim import camera_in_tag_frames

print("device:", jax.devices()[0])
res, batch = 1000, 8
params = DetectorParams(quad_decimate=2, min_cluster_pts=12,
                        max_detections=16, max_boundary=8192)
import json
base_raw = json.load(open(DEFAULT_SCENE))
cfg = SceneConfig.from_dict(randomize_scene(base_raw, 0.1, seed=7))
cam = PinholeCamera.from_fov(res, res, cfg.fov_y)
scene = scene_tensors(cfg)
way = np.array([
    [0.0, 0.0, 10.0], [60.0, 0.0, 10.0], [60.0, 2.0, 12.0],
    [0.0, 0.0, 10.0], [2.0, 1.0, 11.0], [60.0, 0.0, 10.0],
    [60.0, 2.0, 12.0], [0.0, 0.0, 10.0],
])
n_frames = 96
traj = trajectory.scripted_waypoints(n_frames, way)
pos = jnp.asarray(traj.positions)
rot = jnp.asarray(traj.rotations)
K_inv = jnp.asarray(cam.inv_matrix)

cache = f"/tmp/aprilslam_bench_pgo_{res}_n{n_frames}_B{batch}_s7.npy"
if os.path.exists(cache):
    arr = np.load(cache)
else:
    cs = [jnp.clip(render_frames(scene, pos[i:i + batch], rot[i:i + batch],
                                 K_inv, res, res, 2) * 255.0, 0, 255
                   ).astype(jnp.uint8) for i in range(0, n_frames, batch)]
    jax.block_until_ready(cs)
    arr = np.stack([np.asarray(c) for c in cs])
    np.save(cache, arr)
chunks = [jax.device_put(arr[i]) for i in range(arr.shape[0])]
jax.block_until_ready(chunks)

ids = cfg.tag_ids()
gt_all = np.asarray(camera_in_tag_frames(
    jnp.asarray(cfg.tag_positions()), jnp.asarray(cfg.tag_rotations()), pos, rot))
id_to_idx = {int(t): i for i, t in enumerate(ids)}


def ate_of(all_outs):
    est = np.concatenate([np.asarray(o.poses) for o in all_outs])
    valid = np.concatenate([np.asarray(o.valid) for o in all_outs])
    coord = np.concatenate([np.asarray(o.coord_id) for o in all_outs])
    t_idx = np.array([id_to_idx.get(int(c), -1) for c in coord])
    valid = valid & (t_idx >= 0)
    gt = gt_all[np.arange(len(est)), np.clip(t_idx, 0, len(ids) - 1)]
    errs = np.linalg.norm(est[valid, :3, 3] - gt[valid, :3, 3], axis=-1)
    return float(np.sqrt(np.mean(errs ** 2)))


def run(pgo, oi=10, ti=6):
    step, init = build_slam_step(
        cfg.family, cam, cfg.tag_size_inner, detector_params=params,
        estimator="ba", ba_schedule="chunk", init_joint_iters=3,
        ba_chunk_iters=4, pnp_iters=3, pgo=pgo, graph_capacity=16,
        pgo_opt_iters=oi, taggraph_iters=ti,
    )
    step = jax.jit(step)
    state = init()
    all_outs = []
    for c in chunks:
        state, o = step(state, c)
        all_outs.append(o)
    jax.block_until_ready(all_outs)
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for c in chunks:
            state, o = step(state, c)
        jax.block_until_ready(o)
        dt = min(dt, time.perf_counter() - t0)
    loops = int(np.asarray(all_outs[-1].loop_closures)[-1]) if pgo else 0
    return n_frames / dt, ate_of(all_outs), loops


fps_off, ate_off, _ = run(False)
print(f"off            {fps_off:6.1f} fps  ate {ate_off:.4f}")
for oi, ti in ((10, 6), (6, 4), (4, 3), (3, 2)):
    fps, ate, loops = run(True, oi, ti)
    print(f"on oi={oi:2d} ti={ti}  {fps:6.1f} fps  ate {ate:.4f}  "
          f"ratio {fps / fps_off:.3f}  loops {loops}")
