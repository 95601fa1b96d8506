"""Probe: replicate tests/test_pgo.py e2e fixture with instrumentation.

Dumps per-frame pose error (pgo on/off), when loop edges mint, edge
residuals, and node deltas — to root-cause why the post-closure window
(frames 82:90) does not improve on this codegen variant.
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
from aprilslam_tpu.sim.ground_truth import tag_world_rotations
from aprilslam_tpu.detect import DetectorParams
from aprilslam_tpu.slam.pipeline import SlamSystem

RES, B = 384, 8
cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(RES, RES, cfg.fov_y)
scene = scene_tensors(cfg)
way = np.array([
    [0.0, 0.0, 10.0], [60.0, 0.0, 10.0], [60.0, 2.0, 12.0],
    [0.0, 0.0, 10.0], [2.0, 1.0, 11.0], [60.0, 0.0, 10.0],
    [60.0, 2.0, 12.0], [0.0, 0.0, 10.0],
])
traj = trajectory.scripted_waypoints(96, way)
pos = jnp.asarray(traj.positions)
rot = jnp.asarray(traj.rotations)
frames = render_frames(scene, pos, rot, jnp.asarray(cam.inv_matrix), RES, RES, 2)
frames = degrade.gaussian_noise(frames, 0.04, jax.random.PRNGKey(3))

ids = cfg.tag_ids()
Rw = np.asarray(tag_world_rotations(jnp.asarray(cfg.tag_rotations())))
Tw = np.tile(np.eye(4), (len(ids), 1, 1))
Tw[:, :3, :3] = Rw
Tw[:, :3, 3] = np.asarray(cfg.tag_positions())
Tw0 = np.einsum("ij,tjk->tik", np.linalg.inv(Tw[0]), Tw)
gt_all = np.asarray(camera_in_tag_frames(
    jnp.asarray(cfg.tag_positions()), jnp.asarray(cfg.tag_rotations()), pos, rot))

import sys

SCHEDULE = sys.argv[1] if len(sys.argv) > 1 else "frame"

results = {}
for pgo in (False, True):
    s = SlamSystem(
        cam, cfg.family, cfg.tag_size_inner, estimator="ba",
        detector_params=DetectorParams(quad_decimate=2, min_cluster_pts=12),
        pgo=pgo, pgo_nodes=32, pgo_edges=96, pgo_loop_gap=12,
        ba_schedule=SCHEDULE,
    )
    est, loops = [], []
    for i in range(0, len(pos), B):
        o = s.process(frames[i : i + B])
        est.append(np.asarray(o.poses))
        loops.append(np.asarray(o.loop_closures))
    est = np.concatenate(est)
    loops = np.concatenate(loops)
    ba = s.state[1]
    lm = np.asarray(ba.lm_pose)
    act = np.asarray(ba.lm_active)
    # Anchor-relative map error: the BA world gauge floats, so raw world
    # positions mix gauge drift into the comparison.
    rel = np.einsum("ij,tjk->tik", np.linalg.inv(lm[int(ids[0])]),
                    lm[[int(t) for t in ids]])
    lm_err = np.array([
        np.linalg.norm(rel[i, :3, 3] - Tw0[i, :3, 3])
        for i, t in enumerate(ids) if act[int(t)]
    ])
    print("gauge offset (lm[anchor] vs identity):",
          np.linalg.norm(lm[int(ids[0]), :3, 3]))
    err = np.linalg.norm(est[:, :3, 3] - gt_all[np.arange(len(est)), 0, :3, 3], axis=-1)
    results[pgo] = (est, loops, lm_err, err, s.state)

est_b, loops_b, lm_b, err_b, _ = results[False]
est_p, loops_p, lm_p, err_p, state_p = results[True]

print("loops cumulative:", loops_p.tolist())
print("lm_err ba :", np.round(lm_b, 3), "mean", lm_b.mean())
print("lm_err pgo:", np.round(lm_p, 3), "mean", lm_p.mean())
np.set_printoptions(linewidth=200, precision=3, suppress=True)
print("per-frame err (ba ):")
print(err_b)
print("per-frame err (pgo):")
print(err_p)
win_b = np.sqrt(np.mean(err_b[82:90] ** 2))
win_p = np.sqrt(np.mean(err_p[82:90] ** 2))
print(f"win_b={win_b:.4f} win_p={win_p:.4f} ratio={win_p/win_b:.3f}")
print(f"ate_b={np.sqrt(np.mean(err_b**2)):.4f} ate_p={np.sqrt(np.mean(err_p**2)):.4f}")

# Pose graph dump
g, ba, pg = state_p[0], state_p[1], state_p[2]
E_ok = np.asarray(pg.edges.ok)
ei = np.asarray(pg.edges.i); ej = np.asarray(pg.edges.j)
ew = np.asarray(pg.edges.weight)
from aprilslam_tpu.slam.pgo import pgo_residuals, pgo_cost
r = np.asarray(pgo_residuals(pg.node_pose, pg.edges))
rn = np.linalg.norm(r, axis=-1)
print("nodes:", int(np.asarray(pg.node_active).sum()), "edges:", int(E_ok.sum()),
      "n_loops:", int(np.asarray(pg.n_loops)))
for e in range(len(E_ok)):
    if E_ok[e] and (ew[e] > 1.5 or rn[e] > 1e-4):
        print(f"  edge {e}: {ei[e]}->{ej[e]} w={ew[e]:.1f} |r|={rn[e]:.4f}")
np.savez("/tmp/pgo_e2e.npz", err_b=err_b, err_p=err_p, loops=loops_p,
         node_pose=np.asarray(pg.node_pose), node_active=np.asarray(pg.node_active),
         ei=ei, ej=ej, eT=np.asarray(pg.edges.T_meas), ew=ew, eok=E_ok)
print("saved /tmp/pgo_e2e.npz")
