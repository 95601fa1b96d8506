"""TPU probe: where the pgo=True throughput cost lives.

Times the config-2 chunk step under ablations (monkeypatching the
pipeline's module-global references):

  off            pgo=False
  on             full production path
  no_tgsolve     taggraph_solve stubbed to identity
  no_tgacc       taggraph_accumulate stubbed (state passthrough)
  no_chunk_end   both taggraph fns + pgo_solve stubbed (scan cost only)

Run ON the TPU: python tools/probe_pgo_cost.py
"""

import json
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
import aprilslam_tpu.slam.pipeline as pipemod
from aprilslam_tpu.slam import build_slam_step

print("device:", jax.devices()[0])
B = int(os.environ.get("B", "8"))
H = W = int(os.environ.get("RES", "1000"))

with open(DEFAULT_SCENE) as f:
    raw = json.load(f)
cfg = SceneConfig.from_dict(randomize_scene(raw, 0.1, seed=7))
cam = PinholeCamera.from_fov(W, H, cfg.fov_y)
scene = scene_tensors(cfg)
params = DetectorParams(quad_decimate=2, min_cluster_pts=12,
                        max_detections=16, max_boundary=8192)
way = np.array([
    [0.0, 0.0, 10.0], [60.0, 0.0, 10.0], [60.0, 2.0, 12.0],
    [0.0, 0.0, 10.0], [2.0, 1.0, 11.0], [60.0, 0.0, 10.0],
    [60.0, 2.0, 12.0], [0.0, 0.0, 10.0],
])
n_frames = (96 // B) * B
traj = trajectory.scripted_waypoints(n_frames, way)
pos, rot = jnp.asarray(traj.positions), jnp.asarray(traj.rotations)
K_inv = jnp.asarray(cam.inv_matrix)
chunks = [render_frames(scene, pos[i:i + B], rot[i:i + B], K_inv, H, W, 2)
          for i in range(0, n_frames, B)]
jax.block_until_ready(chunks)

ORIG = dict(
    taggraph_solve=pipemod.taggraph_solve,
    taggraph_accumulate=pipemod.taggraph_accumulate,
    pgo_solve=pipemod.pgo_solve,
)


def stub_tgsolve(tg, lm_pose, lm_active, anchor, hold=None, **kw):
    return lm_pose, jnp.asarray(False)


def stub_tgacc(tg, ids, T_obs, reliable, **kw):
    return tg


def stub_pgosolve(pgo, opt_iters=10):
    P = pgo.n_nodes_capacity
    eye = jnp.broadcast_to(jnp.eye(4, dtype=pgo.node_pose.dtype), (P, 4, 4))
    return pgo, eye, jnp.asarray(False)


VARIANTS = {
    "off": (False, {}),
    "on": (True, {}),
    "no_tgsolve": (True, {"taggraph_solve": stub_tgsolve}),
    "no_tgacc": (True, {"taggraph_accumulate": stub_tgacc}),
    "no_chunk_end": (True, {"taggraph_solve": stub_tgsolve,
                            "taggraph_accumulate": stub_tgacc,
                            "pgo_solve": stub_pgosolve}),
}

results = {}
for name, (pgo_on, patches) in VARIANTS.items():
    for k, v in patches.items():
        setattr(pipemod, k, v)
    try:
        step, init = build_slam_step(
            cfg.family, cam, cfg.tag_size_inner, detector_params=params,
            estimator="ba", ba_schedule="chunk", init_joint_iters=3,
            ba_chunk_iters=4, pnp_iters=3, pgo=pgo_on,
        )
        step = jax.jit(step)
        state = init()
        for c in chunks:
            state, o = step(state, c)
        jax.block_until_ready(o)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for c in chunks:
                state, o = step(state, c)
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        fps = n_frames / best
        results[name] = fps
        print(f"{name:14s} {fps:7.1f} fps   {1e3 * best / n_frames:6.3f} ms/frame")
    finally:
        for k in patches:
            setattr(pipemod, k, ORIG[k])

off, on = results["off"], results["on"]
print(f"\npgo_on/pgo_off = {on / off:.3f}")
for name in ("no_tgsolve", "no_tgacc", "no_chunk_end"):
    print(f"{name}: recovers {(results[name] - on) / max(off - on, 1e-9) * 100:.0f}% of the gap")


# ---- capacity sized to the scene (5 tags; ids 0-4) ----------------------
for name, cap in (("on_cap16", 16), ("off_cap16", 16)):
    pgo_on = name.startswith("on")
    step, init = build_slam_step(
        cfg.family, cam, cfg.tag_size_inner, detector_params=params,
        estimator="ba", ba_schedule="chunk", init_joint_iters=3,
        ba_chunk_iters=4, pnp_iters=3, pgo=pgo_on, graph_capacity=cap,
    )
    step = jax.jit(step)
    state = init()
    for c in chunks:
        state, o = step(state, c)
    jax.block_until_ready(o)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for c in chunks:
            state, o = step(state, c)
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    fps = n_frames / best
    print(f"{name:14s} {fps:7.1f} fps   {1e3 * best / n_frames:6.3f} ms/frame")


# ---- ATE-checked variants: cap16, solve iters ---------------------------
from functools import partial as _partial
from aprilslam_tpu.sim import camera_in_tag_frames

gt_all = np.asarray(camera_in_tag_frames(
    jnp.asarray(cfg.tag_positions()), jnp.asarray(cfg.tag_rotations()), pos, rot))
ids_scene = cfg.tag_ids()
id_to_idx = {int(t): i for i, t in enumerate(ids_scene)}


def ate_of(all_outs):
    est = np.concatenate([np.asarray(o.poses) for o in all_outs])
    valid = np.concatenate([np.asarray(o.valid) for o in all_outs])
    coord = np.concatenate([np.asarray(o.coord_id) for o in all_outs])
    t_idx = np.array([id_to_idx.get(int(c), -1) for c in coord])
    valid = valid & (t_idx >= 0)
    gt = gt_all[np.arange(len(est)), np.clip(t_idx, 0, len(ids_scene) - 1)]
    errs = np.linalg.norm(est[valid, :3, 3] - gt[valid, :3, 3], axis=-1)
    return float(np.sqrt(np.mean(errs ** 2)))


for name, cap, it, pgo_on in (
    ("off_cap16", 16, 6, False),
    ("on_cap16_it6", 16, 6, True),
    ("on_cap16_it4", 16, 4, True),
):
    pipemod.taggraph_solve = _partial(ORIG["taggraph_solve"], iters=it)
    try:
        step, init = build_slam_step(
            cfg.family, cam, cfg.tag_size_inner, detector_params=params,
            estimator="ba", ba_schedule="chunk", init_joint_iters=3,
            ba_chunk_iters=4, pnp_iters=3, pgo=pgo_on, graph_capacity=cap,
        )
        step = jax.jit(step)
        state = init()
        all_outs = []
        for c in chunks:
            state, o = step(state, c)
            all_outs.append(o)
        jax.block_until_ready(o)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for c in chunks:
                state, o = step(state, c)
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        fps = n_frames / best
        print(f"{name:14s} {fps:7.1f} fps   {1e3 * best / n_frames:6.3f} ms/frame"
              f"   ate {ate_of(all_outs):.4f}")
    finally:
        pipemod.taggraph_solve = ORIG["taggraph_solve"]
