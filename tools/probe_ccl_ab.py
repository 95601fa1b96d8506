"""TPU A/B probe: old reach-based CCL kernel vs new run-extent kernel.

Interleaved timing (A,B,A,B,... median of per-burst means) to defeat the
tunnel's minutes-scale throughput drift, plus exact label parity on the
real thresholded pool.

Usage: OLD=/tmp/ccl_old_kernel.py python tools/probe_ccl_ab.py
"""

import importlib.util
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
from aprilslam_tpu.sim import SceneConfig, scene_tensors, render_frames, trajectory
from aprilslam_tpu.detect import DetectorParams
from aprilslam_tpu.detect.threshold import (
    to_grayscale, decimate, adaptive_threshold_with_levels,
)
from aprilslam_tpu.ops import connected_components_pallas as ccl_new

spec = importlib.util.spec_from_file_location(
    "ccl_old", os.environ.get("OLD", "/tmp/ccl_old_kernel.py"))
ccl_old_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ccl_old_mod)
ccl_old = ccl_old_mod.connected_components_pallas

print("device:", jax.devices()[0])

B = int(os.environ.get("B", "8"))
H = W = int(os.environ.get("RES", "1000"))
cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(W, H, cfg.fov_y)
scene = scene_tensors(cfg)
p = DetectorParams(quad_decimate=2, min_cluster_pts=12)
traj = trajectory.monte_carlo(B, seed=3)
frames = render_frames(scene, jnp.asarray(traj.positions),
                       jnp.asarray(traj.rotations),
                       jnp.asarray(cam.inv_matrix), H, W, 2)
gray = to_grayscale(frames)
dec = decimate(gray, p.quad_decimate)
trinary, _ = adaptive_threshold_with_levels(dec, tile=p.tile,
                                            min_contrast=p.min_contrast)
jax.block_until_ready(trinary)

CANDS = {
    "old_full8_cap7": jax.jit(lambda t: ccl_old(t, rounds=8, step_cap=7)),
    "new_full8_cap7": jax.jit(lambda t: ccl_new(t, schedule=(7,) * 8)),
    "new_alt_7_3": jax.jit(lambda t: ccl_new(t, schedule=(7, 3, 7, 3, 7, 3, 7, 3))),
    "new_full6_cap7": jax.jit(lambda t: ccl_new(t, schedule=(7,) * 6)),
    "new_9_734": jax.jit(lambda t: ccl_new(t, schedule=(7, 3, 4, 7, 3, 4, 7, 3, 4))),
}

# parity first (also warms up the compiles)
outs = {k: np.asarray(f(trinary)) for k, f in CANDS.items()}
base = outs["old_full8_cap7"]
for k, o in outs.items():
    ndiff = int((o != base).sum())
    print(f"{k:18s} label_diff_px={ndiff}")

# interleaved timing: R bursts of N calls each, rotate candidates per burst
R, N = 6, 10
ms = {k: [] for k in CANDS}
for r in range(R):
    for k, f in CANDS.items():
        t0 = time.perf_counter()
        for _ in range(N):
            out = f(trinary)
        jax.block_until_ready(out)
        ms[k].append((time.perf_counter() - t0) / N * 1e3)
for k in CANDS:
    med = float(np.median(ms[k]))
    mn = float(np.min(ms[k]))
    print(f"{k:18s} median {med:7.2f} ms/call ({med / B:6.3f} ms/frame)  "
          f"min {mn:7.2f} ({mn / B:6.3f})")
