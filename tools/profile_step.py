"""Op-level attribution of the fused SLAM step via an xprof trace.

Captures a jax.profiler trace of a few step calls, then parses the XPlane
protobuf for per-op device time and groups it by pipeline stage (the HLO
metadata op_name carries the jax name stack, which includes the source
function names: threshold/segment/quads/decode/refine/pnp/scan/...).

This sees INSIDE the fused program — unlike per-stage jits, which pay the
tunnel dispatch floor per call and can't see XLA's cross-stage fusion.

Usage:  python tools/profile_step.py            (device per configure_runtime)
        SWEEP_DEVICE=cpu python tools/profile_step.py
"""

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from aprilslam_tpu.utils import configure_runtime

configure_runtime(os.environ.get("SWEEP_DEVICE", "auto"))

import numpy as np
import jax
import jax.numpy as jnp

from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.sim import SceneConfig, scene_tensors, render_frames, trajectory
from aprilslam_tpu.detect import DetectorParams
from aprilslam_tpu.slam import build_slam_step

B = int(os.environ.get("B", "8"))
H = W = int(os.environ.get("RES", "1000"))
LOGDIR = os.environ.get("TRACE_DIR", "/tmp/aprilslam_xprof")

print("device:", jax.devices()[0], file=sys.stderr)

cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(W, H, cfg.fov_y)
scene = scene_tensors(cfg)
params = DetectorParams(quad_decimate=2, min_cluster_pts=12)
traj = trajectory.monte_carlo(B, seed=3)
frames = render_frames(scene, jnp.asarray(traj.positions), jnp.asarray(traj.rotations),
                       jnp.asarray(cam.inv_matrix), H, W, 2)
jax.block_until_ready(frames)

step, init = build_slam_step(
    cfg.family, cam, cfg.tag_size_inner, detector_params=params,
    estimator="ba", ba_schedule=os.environ.get("SCHED", "chunk"),
)
step = jax.jit(step)
state = init()
compiled = step.lower(state, frames).compile()
state, outs = step(state, frames)
jax.block_until_ready(outs)
print("compiled; tracing", file=sys.stderr)

# HLO instruction name -> jax op_name (carries the source name stack).
import re

_OPNAME_RE = re.compile(r"%?([\w.\-]+) = .*metadata={[^}]*op_name=\"([^\"]+)\"")
hlo_scope: dict[str, str] = {}
for mod_text in [compiled.as_text()]:
    for m in _OPNAME_RE.finditer(mod_text):
        hlo_scope[m.group(1)] = m.group(2)
print(f"hlo scope map: {len(hlo_scope)} instructions", file=sys.stderr)

os.system(f"rm -rf {LOGDIR}")
with jax.profiler.trace(LOGDIR):
    for _ in range(3):
        state, outs = step(state, frames)
    jax.block_until_ready(outs)

paths = glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True)
print("xplane files:", paths, file=sys.stderr)
assert paths, "no trace captured"

# ---- parse the XPlane proto directly --------------------------------------
try:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
except ImportError:  # layout varies by TF version
    from tensorboard_plugin_profile.protobuf import xplane_pb2

def classify(op_name: str) -> str:
    """Bucket a jax op_name scope. Detector stages carry explicit
    named_scopes (stage_threshold/ccl/quads/decode/refine, detector.py);
    the backend pieces are identified by their inner-jit names."""
    for stage in ("threshold", "ccl", "quads", "decode", "refine"):
        if f"stage_{stage}" in op_name:
            return stage
    if "ba_optimize" in op_name:
        return "ba(chunk)"
    if "solve_planar_pnp_dual" in op_name or "pnp" in op_name:
        return "pnp"
    if "connected_components" in op_name:
        return "ccl"
    if "adaptive_threshold" in op_name or "median" in op_name:
        return "threshold"
    if op_name.startswith("jit(slam_step)/while/"):
        return "scan(per-frame)"
    if "searchsorted" in op_name:
        return "quads"
    return "other"


totals = defaultdict(float)
examples = defaultdict(lambda: defaultdict(float))
device_total = 0.0

for path in paths:
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        name = plane.name
        # Device planes: "/device:TPU:0" on TPU; the CPU backend logs its
        # XLA op events under "/host:CPU" in tf_XLA* lines.
        if not (name.startswith("/device:") or name == "/host:CPU"):
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            # Only XLA op-execution lines; skip python/runtime bookkeeping.
            if not (line.name.startswith("tf_XLA") or "XLA" in line.name
                    or line.name.startswith("TensorFlow Ops")
                    or plane.name.startswith("/device:")):
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                if md is None:
                    continue
                hlo_name = (md.display_name or md.name).removeprefix("end: ")
                scope = hlo_scope.get(hlo_name)
                if scope is None:
                    # not an entry-computation HLO instruction -> runtime
                    # bookkeeping (ThunkExecutor, python frames); skip.
                    continue
                dur_us = ev.duration_ps / 1e6
                stage = classify(scope)
                totals[stage] += dur_us
                examples[stage][f"{hlo_name} <- {scope.split('/')[-1][:50]}"] += dur_us
                device_total += dur_us

calls = 3
print(f"\n== device time per stage (us, {calls} calls x {B} frames) ==")
for stage, us in sorted(totals.items(), key=lambda kv: -kv[1]):
    print(f"{stage:12s} {us/calls/B:9.1f} us/frame  ({us/max(device_total,1e-9)*100:5.1f}%)")
print(f"{'TOTAL':12s} {device_total/calls/B:9.1f} us/frame")

print("\n== top ops in the 2 biggest stages ==")
for stage, _ in sorted(totals.items(), key=lambda kv: -kv[1])[:2]:
    print(f"[{stage}]")
    for op, us in sorted(examples[stage].items(), key=lambda kv: -kv[1])[:8]:
        print(f"   {us/calls/B:9.1f} us/frame  {op}")
