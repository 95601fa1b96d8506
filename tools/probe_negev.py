"""TPU/CPU probe: can NEGATIVE visibility evidence disambiguate the
single-tag planar-PnP branch on the headline's worst frames?

The round-4/5 ATE probe (probe_ate_dist.py) showed the 512-frame RMSE is
tail-dominated by ~10 frames with exactly one visible mapped tag, where
both IPPE branches fit the 4 observed corners near-equally.  The branches
still differ in what they IMPLY: the camera pose of the wrong branch often
places OTHER mapped landmarks squarely inside the frustum — landmarks that
were NOT detected.  This probe quantifies whether a conservative
"expected-but-unseen" count separates the branches before we wire it into
the pipeline's pre-localization pick.

For every frame it recomputes both branch hypotheses against the FINAL
map, refines each with the joint GN localizer, and reports:
  rms_a/rms_b, contradiction counts c_a/c_b, which branch the current
  rms-pick chooses, which the negev-pick would choose, and the GT error of
  both choices.
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
    SceneConfig, scene_tensors, trajectory, camera_in_tag_frames,
)
from aprilslam_tpu.detect import DetectorParams
from aprilslam_tpu.pose.pnp import solve_planar_pnp_dual
from aprilslam_tpu.slam import build_slam_step
from aprilslam_tpu.slam.localize import joint_camera_pose


def scatter_frame(ids, ok, corners, M):
    okm = ok & (ids >= 0) & (ids < M)
    slot = jnp.where(okm, jnp.clip(ids, 0, M - 1), M)
    corn_m = jnp.zeros((M, 4, 2), dtype=corners.dtype)
    corn_m = corn_m.at[slot].set(corners, mode="drop")
    seen = jnp.zeros((M,), bool).at[slot].set(True, mode="drop")
    return corn_m, seen

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


def contradiction(T_wc, seen, min_side_px=22.0, margin=0.10, z_min=1.0,
                  facing_min=0.35):
    """Count active landmarks this camera pose implies should have been
    clearly detected but were not."""
    T_cw = se3_inverse(T_wc)
    ctr = lm_pose[:, :3, 3]
    Xc = ctr @ T_cw[:3, :3].T + T_cw[:3, 3]
    z = Xc[:, 2]
    f = K[0, 0]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = f * Xc[:, 0] / zs + K[0, 2]
    v = K[1, 1] * Xc[:, 1] / zs + K[1, 2]
    side = f * tag_size / jnp.maximum(zs, 1e-6)
    mx, my = margin * W, margin * H
    inside = (u > mx) & (u < W - mx) & (v > my) & (v < H - my)
    n_c = lm_pose[:, :3, 2] @ T_cw[:3, :3].T
    ray = Xc / jnp.maximum(jnp.linalg.norm(Xc, axis=-1, keepdims=True), 1e-9)
    facing = jnp.abs(jnp.sum(n_c * ray, axis=-1))
    expected = (lm_active & (z > z_min) & inside & (side > min_side_px)
                & (facing > facing_min))
    return jnp.sum(expected & ~seen)


@jax.jit
def eval_frame(ids_b, ok_b, corners_b):
    res = solve_planar_pnp_dual(corners_b, K, tag_size, iters=3)
    corn_m, seen = scatter_frame(ids_b, ok_b, corners_b, Ml)
    use = seen & lm_active
    idsc = jnp.clip(ids_b, 0, Ml - 1)
    valid_id = (ids_b >= 0) & (ids_b < Ml)
    cand = ok_b & valid_id & lm_active[idsc]
    c_idx = jnp.argmin(jnp.where(cand, ids_b, 2**30))
    T_lm = jnp.where(lm_active[idsc[c_idx]], lm_pose[idsc[c_idx]],
                     jnp.eye(4, dtype=lm_pose.dtype))
    T0a = T_lm @ se3_inverse(res.T[c_idx])
    T0b = T_lm @ se3_inverse(res.T_alt[c_idx])
    T_a, r_a = joint_camera_pose(lm_pose, use, corn_m, K, tag_size, T0a, iters=6)
    T_b, r_b = joint_camera_pose(lm_pose, use, corn_m, K, tag_size, T0b, iters=6)
    c_a = contradiction(T_a, seen)
    c_b = contradiction(T_b, seen)
    return T_a, r_a, c_a, T_b, r_b, c_b


id_to_idx = {int(t): i for i, t in enumerate(ids_gt)}
t_idx = np.array([id_to_idx.get(int(c), -1) for c in coord_all])
gt = gt_all[np.arange(N), np.clip(t_idx, 0, len(ids_gt) - 1)]

# Coordinate-tag world pose (BA world) for converting hypotheses to the
# reported frame.
lm_pose_np = np.asarray(lm_pose)
lm_active_np = np.asarray(lm_active)

rows = []
err_rms_pick = np.zeros(N)
err_neg_pick = np.zeros(N)
for i in range(N):
    T_a, r_a, c_a, T_b, r_b, c_b = eval_frame(
        jnp.asarray(ids_all[i]), jnp.asarray(ok_all[i]),
        jnp.asarray(corners_all[i]))
    T_a, r_a, c_a, T_b, r_b, c_b = (np.asarray(T_a), float(r_a), int(c_a),
                                    np.asarray(T_b), float(r_b), int(c_b))
    c_slot = int(np.clip(coord_all[i], 0, Ml - 1))
    T_wco = lm_pose_np[c_slot]
    A = np.linalg.inv(T_wco) @ T_a
    Bb = np.linalg.inv(T_wco) @ T_b
    e_a = np.linalg.norm(A[:3, 3] - gt[i, :3, 3])
    e_b = np.linalg.norm(Bb[:3, 3] - gt[i, :3, 3])
    pick_rms = r_a <= r_b
    rms_close = abs(r_a - r_b) < 0.5 * max(r_a, r_b)
    if rms_close and c_a != c_b:
        pick_neg = c_a < c_b
    else:
        pick_neg = pick_rms
    err_rms_pick[i] = e_a if pick_rms else e_b
    err_neg_pick[i] = e_a if pick_neg else e_b
    if valid_all[i] and t_idx[i] >= 0:
        rows.append((i, int(nvis_all[i]), r_a, r_b, c_a, c_b, e_a, e_b,
                     pick_rms, pick_neg))

v = valid_all & (t_idx >= 0)
e_rep = np.linalg.norm(pose_rep[:, :3, 3] - gt[:, :3, 3], axis=-1)


def rmse(e, m):
    return float(np.sqrt(np.mean(e[m] ** 2)))


print(f"reported-pipeline  rmse={rmse(e_rep, v):.4f}")
print(f"rms-pick (probe)   rmse={rmse(err_rms_pick, v):.4f}")
print(f"negev-pick (probe) rmse={rmse(err_neg_pick, v):.4f}")

# Where do the picks differ, and was negev right?
diff = [r for r in rows if r[8] != r[9]]
print(f"\npick changed on {len(diff)} frames:")
for (i, nv, r_a, r_b, c_a, c_b, e_a, e_b, pr, pn) in diff:
    right = (e_a < e_b) == (pn)
    print(f"  f{i:3d} nvis={nv} rms a/b={r_a:6.2f}/{r_b:6.2f} "
          f"c a/b={c_a}/{c_b} err a/b={e_a:6.3f}/{e_b:6.3f} "
          f"negev-{'RIGHT' if right else 'WRONG'}")

# sanity: how often does the CORRECT branch carry contradictions (false
# positives of the predicate)?
fp = sum(1 for (i, nv, r_a, r_b, c_a, c_b, e_a, e_b, pr, pn) in rows
         if (e_a < e_b and c_a > 0) or (e_b < e_a and c_b > 0))
print(f"\ncorrect-branch-with-contradictions frames: {fp}/{len(rows)}")

worst = np.argsort(err_rms_pick * v)[::-1][:12]
print("\nworst frames under rms-pick:")
for i in worst:
    r = next((r for r in rows if r[0] == i), None)
    if r:
        (_, nv, r_a, r_b, c_a, c_b, e_a, e_b, pr, pn) = r
        print(f"  f{i:3d} nvis={nv} rms a/b={r_a:6.2f}/{r_b:6.2f} "
              f"c a/b={c_a}/{c_b} err a/b={e_a:6.3f}/{e_b:6.3f}")
