"""TPU probe: headline ATE error distribution.

Runs the headline accuracy pass (512 distinct Monte-Carlo frames, batch 8)
and prints the per-frame translation error distribution, split by the
number of visible mapped tags — is the 0.39 RMSE a body or a tail?
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from aprilslam_tpu.utils import configure_runtime, enable_compilation_cache

enable_compilation_cache()
configure_runtime(os.environ.get("DEVICE", "auto"))

import numpy as np
import jax
import jax.numpy as jnp

from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.sim import (
    SceneConfig, scene_tensors, trajectory, camera_in_tag_frames,
)
from aprilslam_tpu.detect import DetectorParams
from aprilslam_tpu.slam import build_slam_step

print("device:", jax.devices()[0])
B, N = 8, 512
H = W = 1000
cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(W, H, cfg.fov_y)
params = DetectorParams(quad_decimate=2, min_cluster_pts=12,
                        max_detections=16, max_boundary=8192)
traj = trajectory.monte_carlo(N, seed=3)
pos, rot = jnp.asarray(traj.positions), jnp.asarray(traj.rotations)

pool = np.load(f"/tmp/aprilslam_bench_frames_v2_{W}x{H}_n{N}_s3.npy")
pool = jax.device_put(pool)

step, init = build_slam_step(
    cfg.family, cam, cfg.tag_size_inner, detector_params=params,
    estimator="ba", ba_schedule="chunk", init_joint_iters=3,
    ba_chunk_iters=4, pnp_iters=3, graph_capacity=16,
)
step = jax.jit(step)
state = init()
outs = []
chunks = pool.reshape(N // B, B, H, W)
for i in range(N // B):
    state, o = step(state, chunks[i])
    outs.append(o)
jax.block_until_ready(outs)

ids = cfg.tag_ids()
gt_all = np.asarray(camera_in_tag_frames(
    jnp.asarray(cfg.tag_positions()), jnp.asarray(cfg.tag_rotations()), pos, rot))
est = np.concatenate([np.asarray(o.poses) for o in outs])
valid = np.concatenate([np.asarray(o.valid) for o in outs])
coord = np.concatenate([np.asarray(o.coord_id) for o in outs])
nvis = np.concatenate([np.asarray(o.n_visible) for o in outs])
rms = np.concatenate([np.asarray(o.reproj_rms) for o in outs])
id_to_idx = {int(t): i for i, t in enumerate(ids)}
t_idx = np.array([id_to_idx.get(int(c), -1) for c in coord])
valid = valid & (t_idx >= 0)
gt = gt_all[np.arange(len(est)), np.clip(t_idx, 0, len(ids) - 1)]
err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=-1)
e = err[valid]
print(f"n={len(e)} rmse={np.sqrt(np.mean(e**2)):.4f} mean={e.mean():.4f} "
      f"median={np.median(e):.4f} p90={np.percentile(e,90):.4f} "
      f"p99={np.percentile(e,99):.4f} max={e.max():.4f}")
for v in range(0, 6):
    m = valid & (nvis == v)
    if m.sum():
        ev = err[m]
        print(f"  nvis={v}: n={m.sum():4d} rmse={np.sqrt(np.mean(ev**2)):.4f} "
              f"median={np.median(ev):.4f} max={ev.max():.4f}")
# contribution of the worst frames to the RMSE
s = np.sort(e)[::-1]
for k in (5, 10, 20, 50):
    rest = np.sqrt(np.mean(s[k:] ** 2))
    print(f"rmse excluding top {k}: {rest:.4f}")
worst = np.argsort(err * valid)[::-1][:10]
print("worst frames:", [(int(i), round(float(err[i]), 3), int(nvis[i]),
                         round(float(rms[i]), 2)) for i in worst])
