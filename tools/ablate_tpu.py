"""Wall-clock ablation of the bench pipeline on the real chip.

MEASUREMENT HAZARD (discovered 2026-08-21, see docs/PERFORMANCE.md):
the tunnelled backend serves repeated executions with identical
(program, input contents) from a result cache, so the fixed-input STAGE
rows below can under-report arbitrarily. The `step` row is trustworthy
(its state threads through every call, so input contents always
change); for stage attribution use the chained-token/never-reused-input
recipe documented in docs/PERFORMANCE.md instead.

The tunnel's xplane trace appears to carry cost-model (deterministic)
op times, so this measures REAL steady-state wall clock for nested
prefixes of the pipeline, each in its own jit, averaged over enough reps
to amortize the ~25 ms tunnel dispatch floor:

  front    = threshold + ccl + quads            (quad candidates)
  detect   = front + decode + refine            (full detector)
  step     = detect + pnp + scan + chunk BA + reloc  (bench pipeline)

Differences between consecutive rows give honest stage-group costs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from aprilslam_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.sim import SceneConfig, scene_tensors, render_frames, trajectory
from aprilslam_tpu.detect import DetectorParams, detect_fn
from aprilslam_tpu.detect.threshold import to_grayscale, decimate, adaptive_threshold_with_levels
from aprilslam_tpu.detect.segment import connected_components_auto
from aprilslam_tpu.detect.quads import quad_candidates
from aprilslam_tpu.slam import build_slam_step

B = int(os.environ.get("B", "8"))
H = W = int(os.environ.get("RES", "1000"))
REPS = int(os.environ.get("REPS", "30"))

print("device:", jax.devices()[0], file=sys.stderr)
cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(W, H, cfg.fov_y)
scene = scene_tensors(cfg)
p = DetectorParams(quad_decimate=2, min_cluster_pts=12, max_detections=16)
traj = trajectory.monte_carlo(B, seed=3)
frames = render_frames(scene, jnp.asarray(traj.positions), jnp.asarray(traj.rotations),
                       jnp.asarray(cam.inv_matrix), H, W, 2)
jax.block_until_ready(frames)


def timed(name, fn, *a):
    f = jax.jit(fn)
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*a)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:10s} {ms:8.2f} ms/call  {ms / B:6.2f} ms/frame  {B / ms * 1e3:7.1f} fps")
    return ms


def front(fr):
    gray = to_grayscale(fr)
    dec = decimate(gray, p.quad_decimate)
    trinary, level = adaptive_threshold_with_levels(dec, tile=p.tile, min_contrast=p.min_contrast)
    labels = connected_components_auto(trinary, p.scan_iters, p.jump_iters)
    q = quad_candidates(
        trinary, labels, dec, p.quad_decimate, level,
        max_clusters=p.max_clusters, max_quads=p.max_quads,
        pts_per_quad=p.pts_per_quad, min_cluster_pts=p.min_cluster_pts,
        min_side=p.min_side, refine_iters=p.refine_iters,
        max_fit_err=p.max_fit_err, max_boundary=p.max_boundary,
    )
    return q.corners, q.valid


def thrccl(fr):
    gray = to_grayscale(fr)
    dec = decimate(gray, p.quad_decimate)
    trinary, level = adaptive_threshold_with_levels(dec, tile=p.tile, min_contrast=p.min_contrast)
    labels = connected_components_auto(trinary, p.scan_iters, p.jump_iters)
    return labels, level


t_thrccl = timed("thr+ccl", thrccl, frames)
t_front = timed("front", front, frames)
det = detect_fn(cfg.family, p)
t_det = timed("detect", lambda fr: det(fr).corners, frames)

step, init = build_slam_step(
    cfg.family, cam, cfg.tag_size_inner, detector_params=p,
    estimator="ba", ba_schedule="chunk", init_joint_iters=3, ba_chunk_iters=8,
)
stepj = jax.jit(step)
s0 = init()
s1, o = stepj(s0, frames)
jax.block_until_ready(o)
t0 = time.perf_counter()
s = s0
for _ in range(REPS):
    s, o = stepj(s, frames)
jax.block_until_ready(o)
ms = (time.perf_counter() - t0) / REPS * 1e3
print(f"{'step':10s} {ms:8.2f} ms/call  {ms / B:6.2f} ms/frame  {B / ms * 1e3:7.1f} fps")

print(f"\ndeltas: quads = {(t_front - t_thrccl) / B:.2f}; "
      f"decode+refine = {(t_det - t_front) / B:.2f}; "
      f"backend (pnp+scan+ba+reloc) = {(ms - t_det) / B:.2f} ms/frame")
