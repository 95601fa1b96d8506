"""TPU probe: split the headline ATE tail into map error vs observation
physics.

For every frame, localize with the joint GN against
  (a) the pipeline's FINAL estimated landmark map,
  (b) the GROUND-TRUTH landmark map (GT tag poses in the coordinate frame),
and for each also report the 6-dof GN information matrix's smallest
singular value (weak-direction observability). If (b) still carries the
tail, the error is observation physics (frontal-distant single tag) and
the production answer is a covariance/confidence output, not a better map.
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

from aprilslam_tpu.geometry import PinholeCamera, se3_inverse
from aprilslam_tpu.sim import (
    SceneConfig, trajectory, camera_in_tag_frames,
)
from aprilslam_tpu.sim.ground_truth import tag_world_rotations
from aprilslam_tpu.detect import DetectorParams
from aprilslam_tpu.slam import build_slam_step
from aprilslam_tpu.slam.localize import joint_camera_pose

print("device:", jax.devices()[0])
B, N = 8, 512
H = W = 1000
cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(W, H, cfg.fov_y)
K = jnp.asarray(cam.matrix)
tag_size = cfg.tag_size_inner
params = DetectorParams(quad_decimate=2, min_cluster_pts=12,
                        max_detections=16, max_boundary=8192)
traj = trajectory.monte_carlo(N, seed=3)
pos, rot = jnp.asarray(traj.positions), jnp.asarray(traj.rotations)

pool = np.load(f"/tmp/aprilslam_bench_frames_v2_{W}x{H}_n{N}_s3.npy")
pool_d = jax.device_put(pool)

step, init = build_slam_step(
    cfg.family, cam, cfg.tag_size_inner, detector_params=params,
    estimator="ba", ba_schedule="chunk", init_joint_iters=3,
    ba_chunk_iters=4, pnp_iters=3, graph_capacity=16,
)
step = jax.jit(step)
state = init()
outs = []
chunks = pool_d.reshape(N // B, B, H, W)
for i in range(N // B):
    state, o = step(state, chunks[i])
    outs.append(o)
jax.block_until_ready(outs)

graph, ba = state
lm_pose = ba.lm_pose
lm_active = ba.lm_active
Ml = int(ba.n_landmarks)

ids_all = np.concatenate([np.asarray(o.det_ids) for o in outs])
corners_all = np.concatenate([np.asarray(o.det_corners) for o in outs])
ok_all = np.concatenate([np.asarray(o.det_ok) for o in outs])
coord_all = np.concatenate([np.asarray(o.coord_id) for o in outs])
valid_all = np.concatenate([np.asarray(o.valid) for o in outs])
nvis_all = np.concatenate([np.asarray(o.n_visible) for o in outs])
pose_rep = np.concatenate([np.asarray(o.poses) for o in outs])

ids_gt = cfg.tag_ids()
gt_all = np.asarray(camera_in_tag_frames(
    jnp.asarray(cfg.tag_positions()), jnp.asarray(cfg.tag_rotations()), pos, rot))

# ---- GT landmark map in the coordinate-tag frame (GL->CV matches the
# pipeline's landmark convention: world = coordinate tag's frame). ----
# Tag world poses (GL), then express every tag in tag-(coord_id)'s frame
# using the same camera_in_tag_frames convention chain: T_tagA_tagB =
# inv(T_w_tagA) @ T_w_tagB in the CV-flipped frame. The pipeline's
# landmark world frame equals the coordinate tag's frame by construction
# (anchor = lowest id, identity pose).
# GT relative tag poses, derived from camera_in_tag_frames by composing
# through a virtual camera: with c[t] = camera pose in tag t's frame,
# T_tag0_tagt = c[0] @ inv(c[t]) places tag t in tag 0's frame (verified:
# a tag at GL x=+10 lands at +10 in tag0's frame — an earlier version of
# this probe had a spurious extra inverse here, which mirrored the map
# and invalidated the whole GT arm).
cam1 = camera_in_tag_frames(
    jnp.asarray(cfg.tag_positions()), jnp.asarray(cfg.tag_rotations()),
    pos[:1], rot[:1])  # (1, T, 4, 4) camera pose in each tag frame
c = np.asarray(cam1)[0]
T_rel = np.einsum("ij,tjk->tik", c[0], np.linalg.inv(c))

gt_map = np.tile(np.eye(4, dtype=np.float32), (Ml, 1, 1))
gt_slot_ok = np.zeros(Ml, bool)
for i, t in enumerate(ids_gt):
    if int(t) < Ml:
        gt_map[int(t)] = T_rel[i]
        gt_slot_ok[int(t)] = True
gt_map = jnp.asarray(gt_map)
gt_slot_ok = jnp.asarray(gt_slot_ok)


def scatter_frame(ids, ok, corners, M):
    okm = ok & (ids >= 0) & (ids < M)
    slot = jnp.where(okm, jnp.clip(ids, 0, M - 1), M)
    corn_m = jnp.zeros((M, 4, 2), dtype=corners.dtype)
    corn_m = corn_m.at[slot].set(corners, mode="drop")
    seen = jnp.zeros((M,), bool).at[slot].set(True, mode="drop")
    return corn_m, seen


from aprilslam_tpu.slam.localize import pose_observability  # noqa: E402


def info_sigma_min(world, use, T_wc):
    """Smallest singular value of the 6-dof GN Jacobian at the solution
    (the production pose_obs signal — call the shared implementation so
    the probe validates exactly what the pipeline ships)."""
    return pose_observability(world, use, K, tag_size, T_wc)


@jax.jit
def eval_frame(ids_b, ok_b, corners_b, pose_b, coord_b):
    corn_m, seen = scatter_frame(ids_b, ok_b, corners_b, Ml)
    c_slot = jnp.clip(coord_b, 0, Ml - 1)
    # (a) estimated map
    use_e = seen & lm_active
    T_wa = lm_pose[c_slot]
    T0 = T_wa @ pose_b  # reported pose (coord frame) -> BA world
    T_e, r_e = joint_camera_pose(lm_pose, use_e, corn_m, K, tag_size, T0, iters=8)
    smin_e = info_sigma_min(lm_pose, use_e, T_e)
    T_e_coord = se3_inverse(T_wa) @ T_e
    # (b) GT map, whose world frame is tag ids_gt[0]'s frame: init from
    # the reported pose converted coord->tag0, and convert the solution
    # back to the per-frame coordinate frame for the GT comparison.
    use_g = seen & gt_slot_ok
    T0_g = gt_map[c_slot] @ pose_b
    T_g, r_g = joint_camera_pose(gt_map, use_g, corn_m, K, tag_size, T0_g, iters=8)
    smin_g = info_sigma_min(gt_map, use_g, T_g)
    T_g_coord = se3_inverse(gt_map[c_slot]) @ T_g
    return T_e_coord, r_e, smin_e, T_g_coord, r_g, smin_g


id_to_idx = {int(t): i for i, t in enumerate(ids_gt)}
t_idx = np.array([id_to_idx.get(int(c), -1) for c in coord_all])
gt = gt_all[np.arange(N), np.clip(t_idx, 0, len(ids_gt) - 1)]

err_e = np.zeros(N)
err_g = np.zeros(N)
smin_e_a = np.zeros(N)
smin_g_a = np.zeros(N)
for i in range(N):
    T_e, r_e, smin_e, T_g, r_g, smin_g = eval_frame(
        jnp.asarray(ids_all[i]), jnp.asarray(ok_all[i]),
        jnp.asarray(corners_all[i]), jnp.asarray(pose_rep[i]),
        jnp.asarray(coord_all[i]))
    err_e[i] = np.linalg.norm(np.asarray(T_e)[:3, 3] - gt[i, :3, 3])
    err_g[i] = np.linalg.norm(np.asarray(T_g)[:3, 3] - gt[i, :3, 3])
    smin_e_a[i] = float(smin_e)
    smin_g_a[i] = float(smin_g)

v = valid_all & (t_idx >= 0)


def rmse(e, m):
    return float(np.sqrt(np.mean(e[m] ** 2)))


e_rep = np.linalg.norm(pose_rep[:, :3, 3] - gt[:, :3, 3], axis=-1)
print(f"reported    rmse={rmse(e_rep, v):.4f}")
print(f"est-map GN  rmse={rmse(err_e, v):.4f}")
print(f"GT-map GN   rmse={rmse(err_g, v):.4f}")

for nv in (1, 2, 3, 4, 5):
    m = v & (nvis_all == nv)
    if m.sum():
        print(f"  nvis={nv}: n={m.sum():4d} est {rmse(err_e, m):.4f} "
              f"gt {rmse(err_g, m):.4f}")

# observability vs error: bucket by smin (GT map)
print("\nsigma_min (GT map) vs error:")
qs = np.quantile(smin_g_a[v], [0, 0.1, 0.25, 0.5, 1.0])
for lo, hi in zip(qs[:-1], qs[1:]):
    m = v & (smin_g_a >= lo) & (smin_g_a <= hi)
    print(f"  smin [{lo:8.3f},{hi:8.3f}]: n={m.sum():4d} "
          f"gt-rmse {rmse(err_g, m):.4f} est-rmse {rmse(err_e, m):.4f}")

# what ATE would a smin-gate leave (drop the weakest 2/5/10%)?
print("\nconfidence gating (est map, drop weakest by smin):")
for frac in (0.0, 0.02, 0.05, 0.10):
    thr = np.quantile(smin_e_a[v], frac)
    m = v & (smin_e_a >= thr)
    print(f"  drop {frac*100:4.1f}%: n={m.sum():4d} est-rmse {rmse(err_e, m):.4f}")

worst = np.argsort(err_e * v)[::-1][:10]
print("\nworst frames (est map):")
for i in worst:
    print(f"  f{i:3d} nvis={int(nvis_all[i])} err est/gt "
          f"{err_e[i]:6.3f}/{err_g[i]:6.3f} smin est/gt "
          f"{smin_e_a[i]:7.3f}/{smin_g_a[i]:7.3f}")
