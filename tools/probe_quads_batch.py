"""Probe: which quads sub-stage scales badly with batch on TPU?

quads per-frame cost grows 1.70 -> 2.50 ms from B=8 to B=32 although every
sub-stage is vmapped per-frame. Times nested prefixes of quad_candidates
at two batches to find the superlinear op.
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
from aprilslam_tpu.detect import DetectorParams
from aprilslam_tpu.detect.threshold import to_grayscale, decimate, adaptive_threshold_with_levels
from aprilslam_tpu.detect.segment import connected_components_auto
from aprilslam_tpu.detect import quads as Q

H = W = int(os.environ.get("RES", "1000"))
REPS = int(os.environ.get("REPS", "20"))
p = DetectorParams(quad_decimate=2, min_cluster_pts=12, max_detections=16)

print("device:", jax.devices()[0], file=sys.stderr)
cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(W, H, cfg.fov_y)
scene = scene_tensors(cfg)


def timed(name, fn, *a, B=1):
    f = jax.jit(fn)
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*a)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  {name:14s} {ms:8.2f} ms/call  {ms / B:6.3f} ms/frame")
    return ms


for B in (8, 32):
    traj = trajectory.monte_carlo(B, seed=3)
    frames = render_frames(scene, jnp.asarray(traj.positions), jnp.asarray(traj.rotations),
                           jnp.asarray(cam.inv_matrix), H, W, 2)
    gray = to_grayscale(frames)
    dec = decimate(gray, p.quad_decimate)
    trinary, level = adaptive_threshold_with_levels(dec, tile=p.tile, min_contrast=p.min_contrast)
    labels = connected_components_auto(trinary, p.scan_iters, p.jump_iters)
    jax.block_until_ready((trinary, level, labels, dec))
    print(f"B={B}:")

    def emit(t, l, g, lv):
        return Q._emit_boundaries(t, l, g, lv)

    def emit_compact(t, l, g, lv):
        ka, kb, x, y, w = Q._emit_boundaries(t, l, g, lv)
        return jax.vmap(lambda *a: Q._compact(*a, p.max_boundary))(ka, kb, x, y, w)

    def emit_compact_cluster(t, l, g, lv):
        ka, kb, x, y, w = Q._emit_boundaries(t, l, g, lv)
        ka, kb, x, y, w = jax.vmap(lambda *a: Q._compact(*a, p.max_boundary))(ka, kb, x, y, w)
        return jax.vmap(lambda *a: Q._cluster(*a, p.max_clusters, p.min_cluster_pts))(ka, kb, x, y, w)

    def full(t, l, g, lv):
        q = Q.quad_candidates(
            t, l, g, p.quad_decimate, lv,
            max_clusters=p.max_clusters, max_quads=p.max_quads,
            pts_per_quad=p.pts_per_quad, min_cluster_pts=p.min_cluster_pts,
            min_side=p.min_side, refine_iters=p.refine_iters,
            max_fit_err=p.max_fit_err, max_boundary=p.max_boundary)
        return q.corners

    timed("emit", emit, trinary, labels, dec, level, B=B)
    timed("emit+compact", emit_compact, trinary, labels, dec, level, B=B)
    timed("+cluster", emit_compact_cluster, trinary, labels, dec, level, B=B)
    timed("full quads", full, trinary, labels, dec, level, B=B)
