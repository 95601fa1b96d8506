"""Probe: engineer a trajectory where a loop actually closes.

Camera pans from tag 0 out to x=60 (losing sight of tag 0 for > loop_gap
frames, chaining through tags 2/3/4), then returns. Reports loop count and
ATE with pgo on/off under sensor noise (which creates the drift PGO should
remove).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.sim import (
    SceneConfig, scene_tensors, render_frames, trajectory, degrade,
    camera_in_tag_frames,
)
from aprilslam_tpu.detect import DetectorParams
from aprilslam_tpu.slam.pipeline import SlamSystem

RES = 384
B = 8
cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(RES, RES, cfg.fov_y)
scene = scene_tensors(cfg)

# Out-and-back pan: 0 -> 60 -> 0 at z=10, y=0.
way = np.array([[0.0, 0.0, 10.0], [60.0, 0.0, 10.0], [60.0, 2.0, 12.0], [0.0, 0.0, 10.0]])
traj = trajectory.scripted_waypoints(48, way)
pos = jnp.asarray(traj.positions)
rot = jnp.asarray(traj.rotations)
frames = render_frames(scene, pos, rot, jnp.asarray(cam.inv_matrix), RES, RES, 2)
frames = degrade.gaussian_noise(frames, 0.04, jax.random.PRNGKey(3))

# analytic GT in each frame's coordinate tag frame
ids = cfg.tag_ids()
gt_all = np.asarray(camera_in_tag_frames(
    jnp.asarray(cfg.tag_positions()), jnp.asarray(cfg.tag_rotations()), pos, rot))
id_to_idx = {int(t): i for i, t in enumerate(ids)}

for pgo in (False, True):
    sys_ = SlamSystem(
        cam, cfg.family, cfg.tag_size_inner,
        estimator="ba",
        detector_params=DetectorParams(quad_decimate=2, min_cluster_pts=12),
        pgo=pgo, pgo_nodes=32, pgo_edges=96, pgo_loop_gap=12,
    )
    est, valid, coord, loops = [], [], [], []
    for i in range(0, len(pos), B):
        outs = sys_.process(frames[i : i + B])
        est.append(np.asarray(outs.poses))
        valid.append(np.asarray(outs.valid))
        coord.append(np.asarray(outs.coord_id))
        loops.append(np.asarray(outs.loop_closures))
    est = np.concatenate(est); valid = np.concatenate(valid)
    coord = np.concatenate(coord); loops = np.concatenate(loops)
    t_idx = np.array([id_to_idx.get(int(c), -1) for c in coord])
    ok = valid & (t_idx >= 0) & np.isfinite(est).all(axis=(1, 2))
    gt = gt_all[np.arange(len(est)), np.clip(t_idx, 0, len(ids) - 1)]
    errs = np.linalg.norm(est[ok, :3, 3] - gt[ok, :3, 3], axis=-1)
    # error on the last 12 frames (post-return) is where the loop matters
    late = ok & (np.arange(len(est)) >= 36)
    errs_late = np.linalg.norm(est[late, :3, 3] - gt[late, :3, 3], axis=-1)
    print(f"pgo={pgo}: loops={int(loops[-1])} valid={ok.sum()}/{len(est)} "
          f"ate={np.sqrt(np.mean(errs**2)):.4f} late_ate={np.sqrt(np.mean(errs_late**2)):.4f} "
          f"finite={np.isfinite(est).all()}")

# --- post-hoc: inspect the final pose graph -------------------------------
from aprilslam_tpu.slam.pgo import pgo_residuals, pgo_optimize, pgo_cost

g, ba, pg = sys_.state
E_ok = np.asarray(pg.edges.ok)
r = np.asarray(pgo_residuals(pg.node_pose, pg.edges))
rn = np.linalg.norm(r, axis=-1)
print("edges:", int(E_ok.sum()), "active nodes:", int(np.asarray(pg.node_active).sum()))
w = np.asarray(pg.edges.weight)
for e in range(len(E_ok)):
    if E_ok[e] and rn[e] > 1e-6:
        print(f"  edge {e}: i={int(np.asarray(pg.edges.i)[e])} j={int(np.asarray(pg.edges.j)[e])} w={w[e]:.1f} |r|={rn[e]:.4f}")
new = pgo_optimize(pg.node_pose, pg.edges, active=pg.node_active, iters=10)
d = np.linalg.norm(np.asarray(new)[:, :3, 3] - np.asarray(pg.node_pose)[:, :3, 3], axis=-1)
print("cost before/after:", float(pgo_cost(pg.node_pose, pg.edges)), float(pgo_cost(new, pg.edges)))
print("node translation deltas:", np.round(d[np.asarray(pg.node_active)], 4))

np.savez("/tmp/pgo_state.npz",
         node_pose=np.asarray(pg.node_pose), node_active=np.asarray(pg.node_active),
         ei=np.asarray(pg.edges.i), ej=np.asarray(pg.edges.j),
         eT=np.asarray(pg.edges.T_meas), ew=np.asarray(pg.edges.weight),
         eok=np.asarray(pg.edges.ok))
print("saved /tmp/pgo_state.npz")
