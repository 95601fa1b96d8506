"""TPU sub-stage probe for the quads stage (the dominant detect cost).

Each sub-piece is jitted separately; a no-op jit call is timed first to
estimate the per-call dispatch floor of the tunnelled backend, which is
subtracted from every reading. Run ON the TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from aprilslam_tpu.utils import configure_runtime

configure_runtime("auto")

import numpy as np
import jax
import jax.numpy as jnp

from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.sim import SceneConfig, scene_tensors, render_frames, trajectory
from aprilslam_tpu.detect import DetectorParams
from aprilslam_tpu.detect.threshold import to_grayscale, decimate, adaptive_threshold_with_levels
from aprilslam_tpu.detect.segment import connected_components_auto
from aprilslam_tpu.detect.quads import (
    _emit_boundaries, _compact, _cluster, _fit_quad, quad_candidates,
)

B = int(os.environ.get("B", "8"))
H = W = int(os.environ.get("RES", "1000"))

cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(W, H, cfg.fov_y)
scene = scene_tensors(cfg)
p = DetectorParams(quad_decimate=2, min_cluster_pts=12)
traj = trajectory.monte_carlo(B, seed=3)
frames = render_frames(scene, jnp.asarray(traj.positions), jnp.asarray(traj.rotations),
                       jnp.asarray(cam.inv_matrix), H, W, 2)
jax.block_until_ready(frames)

gray = to_grayscale(frames)
dec = decimate(gray, p.quad_decimate)
trinary, level = adaptive_threshold_with_levels(dec, tile=p.tile, min_contrast=p.min_contrast)
labels = connected_components_auto(trinary, p.scan_iters, p.jump_iters)
jax.block_until_ready((dec, trinary, level, labels))


def timed(name, fn, *a, reps=10):
    f = jax.jit(fn)
    jax.block_until_ready(f(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    print(f"{name:28s} {ms:8.2f} ms/call  {ms / B:6.2f} ms/frame")
    return ms


print("device:", jax.devices()[0], "(CPU numbers are NOT the TPU story — "
      "the tunnel flaps; re-run when the probe reports the TPU)")
noop = timed("dispatch floor (noop)", lambda x: x + 1.0, jnp.ones((8, 128)))

# 1. boundary emission (elementwise over 2HW)
emit = timed("emit_boundaries", lambda t, l, g, lv: _emit_boundaries(t, l, g, lv),
             trinary, labels, dec, level)
ka, kb, x, y, w = _emit_boundaries(trinary, labels, dec, level)
jax.block_until_ready(ka)

# 2. compact (nonzero + gathers), vmapped per frame
mb = p.max_boundary
comp = timed("compact", jax.vmap(lambda a, b, c, d, e: _compact(a, b, c, d, e, mb)),
             ka, kb, x, y, w)
ka_c, kb_c, x_c, y_c, w_c = jax.vmap(lambda a, b, c, d, e: _compact(a, b, c, d, e, mb))(ka, kb, x, y, w)
jax.block_until_ready(ka_c)

# 3. cluster (sort + segment stats)
clus = timed("cluster (sort+segstats)",
             jax.vmap(lambda a, b, c, d, e: _cluster(a, b, c, d, e, p.max_clusters, p.min_cluster_pts)[1]["count"]),
             ka_c, kb_c, x_c, y_c, w_c)

# 3b. the sort alone
srt = timed("  sort alone",
            jax.vmap(lambda a, b, c, d, e: jax.lax.sort((a, b, c, d, e), num_keys=2, is_stable=False)[0]),
            ka_c, kb_c, x_c, y_c, w_c)

# 4. full quads for reference
full = timed("quad_candidates (full)",
             lambda t, l, g, lv: quad_candidates(
                 t, l, g, p.quad_decimate, lv,
                 max_clusters=p.max_clusters, max_quads=p.max_quads,
                 pts_per_quad=p.pts_per_quad, min_cluster_pts=p.min_cluster_pts,
                 min_side=p.min_side, refine_iters=p.refine_iters,
                 max_fit_err=p.max_fit_err, max_boundary=p.max_boundary),
             trinary, labels, dec, level)

print(f"\nnet (minus dispatch {noop:.1f} ms): emit {emit-noop:.1f}, compact {comp-noop:.1f}, "
      f"cluster {clus-noop:.1f} (sort {srt-noop:.1f}), full {full-noop:.1f} ms/call")
