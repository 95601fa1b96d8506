"""Probe: why does pgo=True corrupt poses on the CLI's walk trajectory?

Mirrors the CLI exactly (walk trajectory, batch 8, decimate 2, 512 res) and
prints per-frame translation difference between pgo on/off plus internal
state finiteness.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.sim import SceneConfig, scene_tensors, render_frames, trajectory
from aprilslam_tpu.detect import DetectorParams
from aprilslam_tpu.slam.pipeline import SlamSystem

RES = 512
N = 24
B = 8

cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(RES, RES, cfg.fov_y)
scene = scene_tensors(cfg)
traj = trajectory.smooth_random_walk(N, seed=0)
pos = jnp.asarray(traj.positions)
rot = jnp.asarray(traj.rotations)
K_inv = jnp.asarray(cam.inv_matrix)
frames = render_frames(scene, pos, rot, K_inv, RES, RES, 2)

results = {}
for pgo in (False, True):
    sys_ = SlamSystem(
        cam, cfg.family, cfg.tag_size_inner,
        estimator="ba",
        detector_params=DetectorParams(quad_decimate=2, min_cluster_pts=12),
        pgo=pgo,
    )
    poses, valids, coords = [], [], []
    for i in range(0, N, B):
        outs = sys_.process(frames[i : i + B])
        poses.append(np.asarray(outs.poses))
        valids.append(np.asarray(outs.valid))
        coords.append(np.asarray(outs.coord_id))
    results[pgo] = (np.concatenate(poses), np.concatenate(valids), np.concatenate(coords), sys_.state)

p0, v0, c0, _ = results[False]
p1, v1, c1, st = results[True]
g, ba, pg = st
print(f"pgo state: nodes={int(pg.node_ptr)} loops={int(pg.n_loops)} edges={int(np.asarray(pg.edges.ok).sum())}")
print(f"lm_pose finite: {np.isfinite(np.asarray(ba.lm_pose)).all()}")
for i in range(N):
    d = np.linalg.norm(p1[i, :3, 3] - p0[i, :3, 3])
    fin = np.isfinite(p1[i]).all()
    print(f"frame {i:2d} |t_pgo - t_ba|={d:10.4f} finite={fin} valid={v0[i]}/{v1[i]} coord={c0[i]}/{c1[i]}")
