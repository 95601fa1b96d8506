"""TPU probe: CCL relaxation schedules — timing + detection parity.

Compares the round-4 production kernel config (8 full-depth rounds, reach
mask rolled alongside) against the round-5 schedule (static run-extent
planes + full/cheap alternation) on:

* kernel-only wall time (pipelined: enqueue all reps, block once),
* full-detector output parity (ids + corners) on the Monte-Carlo pool AND
  the config-2 loop trajectory (the pool that exposed the rounds=6 recall
  loss).

Run ON the TPU: python tools/probe_ccl_schedule.py
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
)
from aprilslam_tpu.detect import DetectorParams, detect_fn
from aprilslam_tpu.detect.threshold import (
    to_grayscale, decimate, adaptive_threshold_with_levels,
)
from aprilslam_tpu.ops import connected_components_pallas

print("device:", jax.devices()[0])

B = int(os.environ.get("B", "8"))
H = W = int(os.environ.get("RES", "1000"))
cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(W, H, cfg.fov_y)
scene = scene_tensors(cfg)
p = DetectorParams(quad_decimate=2, min_cluster_pts=12,
                   max_detections=16, max_boundary=8192)

traj = trajectory.monte_carlo(B, seed=3)
frames = render_frames(scene, jnp.asarray(traj.positions),
                       jnp.asarray(traj.rotations),
                       jnp.asarray(cam.inv_matrix), H, W, 2)
gray = to_grayscale(frames)
dec = decimate(gray, p.quad_decimate)
trinary, level = adaptive_threshold_with_levels(dec, tile=p.tile,
                                                min_contrast=p.min_contrast)
jax.block_until_ready(trinary)
print("trinary:", trinary.shape)


def timed(name, fn, *a, reps=20):
    f = jax.jit(fn)
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:34s} {ms:8.2f} ms/call  {ms / B:6.3f} ms/frame")
    return ms


SCHEDULES = {
    "r4_full8_cap7": (7,) * 8,
    "r5_alt_7_3": (7, 3, 7, 3, 7, 3, 7, 3),
    "r5_alt_7_2": (7, 2, 7, 2, 7, 2, 7, 2),
    "r5_73_x3_full_tail": (7, 3, 7, 3, 7, 3, 7, 7),
    "r5_alt10_7_2": (7, 2, 7, 2, 7, 2, 7, 2, 7, 2),
}

for name, sched in SCHEDULES.items():
    timed(name, lambda t, s=sched: connected_components_pallas(t, schedule=s),
          trinary)

# ---- detection parity on two pools --------------------------------------
det = jax.jit(detect_fn(cfg.family, p))


def pool_frames(kind):
    if kind == "mc":
        for k in range(8):
            tr = trajectory.monte_carlo(B, seed=100 + k)
            yield render_frames(scene, jnp.asarray(tr.positions),
                                jnp.asarray(tr.rotations),
                                jnp.asarray(cam.inv_matrix), H, W, 2)
    else:
        import json
        from aprilslam_tpu.sim import DEFAULT_SCENE
        with open(DEFAULT_SCENE) as f:
            raw = json.load(f)
        c2 = SceneConfig.from_dict(randomize_scene(raw, 0.1, seed=7))
        sc2 = scene_tensors(c2)
        way = np.array([
            [0.0, 0.0, 10.0], [60.0, 0.0, 10.0], [60.0, 2.0, 12.0],
            [0.0, 0.0, 10.0], [2.0, 1.0, 11.0], [60.0, 0.0, 10.0],
            [60.0, 2.0, 12.0], [0.0, 0.0, 10.0],
        ])
        tr = trajectory.scripted_waypoints(96, way)
        pos, rot = jnp.asarray(tr.positions), jnp.asarray(tr.rotations)
        for i in range(0, 96, B):
            yield render_frames(sc2, pos[i:i + B], rot[i:i + B],
                                jnp.asarray(cam.inv_matrix), H, W, 2)


import aprilslam_tpu.detect.segment as seg
import aprilslam_tpu.detect.detector as detmod

orig_auto = seg.connected_components_auto


def run_pool(kind, sched):
    def patched(trin, scan_iters, jump_iters):
        return connected_components_pallas(trin, schedule=sched)
    # detector.py binds the name at import; patch BOTH modules, then rebuild.
    seg.connected_components_auto = patched
    detmod.connected_components_auto = patched
    d = jax.jit(detect_fn(cfg.family, p))
    ids_all, corners_all = [], []
    for fr in pool_frames(kind):
        out = d(fr)
        ids_all.append(np.asarray(out.ids))
        corners_all.append(np.asarray(out.corners))
    seg.connected_components_auto = orig_auto
    detmod.connected_components_auto = orig_auto
    return np.concatenate(ids_all), np.concatenate(corners_all)


for kind in ("mc", "loop"):
    base_ids, base_c = run_pool(kind, SCHEDULES["r4_full8_cap7"])
    n_det = int((base_ids >= 0).sum())
    for name in ("r5_alt_7_3", "r5_alt_7_2"):
        ids, c = run_pool(kind, SCHEDULES[name])
        same_ids = bool((ids == base_ids).all())
        ok = (base_ids >= 0) & (ids == base_ids)
        dc = np.abs(c[ok] - base_c[ok]).max() if ok.any() else 0.0
        print(f"pool={kind:4s} {name}: ids_equal={same_ids} "
              f"n_det={n_det} max_corner_delta={float(dc):.4f}")
