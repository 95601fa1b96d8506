"""Probe: config-2 (randomized scene, two-lap loop) pgo on/off at full
resolution — where does pgo=True lose accuracy vs pgo=False?

BENCH r4 first cut measured ate_on 0.863 vs ate_off 0.746 at 1000x1000
while the 384-res CPU smoke showed the opposite (1.12 vs 1.56). Dumps
per-frame error, anchor-relative map error, loops, and gauge drift.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from aprilslam_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.sim import (
    SceneConfig, scene_tensors, render_frames, trajectory,
    camera_in_tag_frames, randomize_scene, DEFAULT_SCENE,
)
from aprilslam_tpu.sim.ground_truth import tag_world_rotations
from aprilslam_tpu.detect import DetectorParams
from aprilslam_tpu.slam.pipeline import SlamSystem

import json

RES = int(os.environ.get("RES", "1000"))
B = 8

with open(DEFAULT_SCENE) as f:
    raw = json.load(f)
cfg = SceneConfig.from_dict(randomize_scene(raw, 0.1, seed=7))
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
print("device:", jax.devices()[0], file=sys.stderr)
chunks = [render_frames(scene, pos[i:i+B], rot[i:i+B], jnp.asarray(cam.inv_matrix), RES, RES, 2)
          for i in range(0, 96, B)]
jax.block_until_ready(chunks)

ids = cfg.tag_ids()
Rw = np.asarray(tag_world_rotations(jnp.asarray(cfg.tag_rotations())))
Tw = np.tile(np.eye(4), (len(ids), 1, 1))
Tw[:, :3, :3] = Rw
Tw[:, :3, 3] = np.asarray(cfg.tag_positions())
Tw0 = np.einsum("ij,tjk->tik", np.linalg.inv(Tw[0]), Tw)
gt_all = np.asarray(camera_in_tag_frames(
    jnp.asarray(cfg.tag_positions()), jnp.asarray(cfg.tag_rotations()), pos, rot))

params = DetectorParams(quad_decimate=2, min_cluster_pts=12, max_detections=16)
np.set_printoptions(linewidth=200, precision=3, suppress=True)
for pgo in (False, True):
    s = SlamSystem(
        cam, cfg.family, cfg.tag_size_inner, estimator="ba",
        detector_params=params, ba_schedule="chunk",
        init_joint_iters=3, ba_chunk_iters=8,
        pgo=pgo,
    )
    est, loops, coords = [], [], []
    for c in chunks:
        o = s.process(c)
        est.append(np.asarray(o.poses))
        loops.append(np.asarray(o.loop_closures))
        coords.append(np.asarray(o.coord_id))
    est = np.concatenate(est)
    loops = np.concatenate(loops)
    coords = np.concatenate(coords)
    ba = s.state[1]
    lm = np.asarray(ba.lm_pose)
    act = np.asarray(ba.lm_active)
    rel = np.einsum("ij,tjk->tik", np.linalg.inv(lm[int(ids[0])]),
                    lm[[int(t) for t in ids]])
    lm_err = np.array([
        np.linalg.norm(rel[i, :3, 3] - Tw0[i, :3, 3]) if act[int(t)] else np.nan
        for i, t in enumerate(ids)
    ])
    id_to_idx = {int(t): i for i, t in enumerate(ids)}
    t_idx = np.array([id_to_idx.get(int(c), -1) for c in coords])
    gt = gt_all[np.arange(len(est)), np.clip(t_idx, 0, len(ids) - 1)]
    err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=-1)
    print(f"=== pgo={pgo}: loops={int(loops[-1])} ate={np.sqrt(np.mean(err**2)):.4f} "
          f"lm_relerr={np.round(lm_err, 3)} gauge={np.linalg.norm(lm[int(ids[0]), :3, 3]):.2f}")
    print(err)
