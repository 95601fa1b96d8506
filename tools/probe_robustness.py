"""Diagnostic sweep for the detector robustness suite: prints
(found/expected, corner RMS, false ids) for every scenario in
tests/test_detect_robustness.py plus a CLEAN control, so miscalibrated
floors can be told apart from real detector regressions."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard set: the shell exports JAX_PLATFORMS=axon

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")  # env alone loses to sitecustomize

import jax.numpy as jnp

from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.detect import TagDetector, DetectorParams
from aprilslam_tpu.sim import (
    SceneConfig, scene_tensors, render_frames, project_border_corners, degrade,
    tags_unoccluded,
)
from aprilslam_tpu.sim.config import TagConfig

RES = 512


def score(det_out, scene, gt_uv, gt_valid, margin=10):
    ids = np.asarray(det_out.ids)
    valid = np.asarray(det_out.valid)
    corners = np.asarray(det_out.corners)
    tag_ids = np.asarray(scene.tag_ids)
    scene_id_set = set(tag_ids.tolist())
    found = expected = false_ids = 0
    errs = []
    missing = []
    for b in range(ids.shape[0]):
        got = {int(ids[b, d]): d for d in range(ids.shape[1]) if valid[b, d]}
        false_ids += sum(1 for g in got if g not in scene_id_set)
        for t in range(gt_uv.shape[1]):
            uv = gt_uv[b, t]
            if not (gt_valid[b, t] and uv.min() > margin and uv.max() < RES - margin):
                continue
            expected += 1
            tid = int(tag_ids[t])
            if tid in got:
                found += 1
                errs.append(np.sqrt(np.mean(np.sum((corners[b, got[tid]] - uv) ** 2, -1))))
            else:
                missing.append((b, tid))
    rms = float(np.sqrt(np.mean(np.square(errs)))) if errs else float("inf")
    return found, expected, rms, false_ids, missing


cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(RES, RES, cfg.fov_y)
scene = scene_tensors(cfg)
pos = jnp.asarray([[0.0, 0.0, 10.0], [10.0, 2.0, 0.0], [25.0, 5.0, -10.0]], jnp.float32)
rot = jnp.zeros((3, 3), jnp.float32)
frames = render_frames(scene, pos, rot, jnp.asarray(cam.inv_matrix), RES, RES, 2)
gt_uv, gt_valid = project_border_corners(scene, pos, rot, jnp.asarray(cam.matrix))
unocc = np.asarray(tags_unoccluded(scene.tag_pos, scene.tag_rot, pos, scene.inner_size, scene.outer_half))
gt_uv, gt_valid = np.asarray(gt_uv), np.asarray(gt_valid & jnp.asarray(unocc))
det = TagDetector(cfg.family, DetectorParams(quad_decimate=1, min_cluster_pts=12))

key = jax.random.PRNGKey(7)


def report(name, x):
    f, e, r, fi, miss = score(det.detect(x), scene, gt_uv, gt_valid)
    print(f"{name:32s} found={f}/{e} rms={r:.3f} false={fi} missing={miss}")


report("clean", frames)
for sigma in (0.02, 0.05, 0.10):
    report(f"noise sigma={sigma}", degrade.gaussian_noise(frames, sigma, key))
for sigma in (0.8, 1.5):
    report(f"blur sigma={sigma}", degrade.gaussian_blur(frames, sigma))
for s in (0.3, 0.6):
    report(f"brightness {s}", degrade.brightness_gradient(frames, s))
for gamma, vig in [(0.6, 0.3), (1.8, 0.4)]:
    report(f"gamma={gamma} vig={vig}", degrade.vignette(degrade.gamma_correct(frames, gamma), vig))
x = degrade.gaussian_blur(frames, 0.7)
x = degrade.brightness_gradient(x, 0.25)
x = degrade.vignette(x, 0.25)
x = degrade.gamma_correct(x, 1.4)
x = degrade.gaussian_noise(x, 0.03, jax.random.PRNGKey(11))
report("combined stack", x)

# Oblique scene
for tilt in (30.0, 45.0, 60.0):
    tags = (
        TagConfig(id=0, position=np.array([0.0, 0.0, -50.0]),
                  rotation=np.array([0.0, tilt, 0.0])),
        TagConfig(id=1, position=np.array([20.0, 0.0, -50.0]),
                  rotation=np.array([tilt, 0.0, 0.0])),
    )
    ocfg = SceneConfig(
        display_width=RES, display_height=RES, fov_y=45.0,
        near_clip=0.1, far_clip=300.0, size_scale=2.0,
        tag_size_inner_raw=5.0, tag_size_outer_raw=9.0,
        actual_size_in_mm=55.6, tags=tags, family="tagStandard41h12",
    )
    ocam = PinholeCamera.from_fov(RES, RES, ocfg.fov_y)
    oscene = scene_tensors(ocfg)
    opos = jnp.asarray([[5.0, 0.0, 10.0]], jnp.float32)
    orot = jnp.zeros((1, 3), jnp.float32)
    ofr = render_frames(oscene, opos, orot, jnp.asarray(ocam.inv_matrix), RES, RES, 2)
    oguv, ogv = project_border_corners(oscene, opos, orot, jnp.asarray(ocam.matrix))
    odet = TagDetector(ocfg.family, DetectorParams(quad_decimate=1, min_cluster_pts=12))
    f, e, r, fi, miss = score(odet.detect(ofr), oscene, np.asarray(oguv), np.asarray(ogv))
    # also report unfiltered gt validity to see why expected < 2
    inview = [(int(t), bool(ogv[0, t]), np.asarray(oguv)[0, t].min(), np.asarray(oguv)[0, t].max()) for t in range(ogv.shape[1])]
    print(f"oblique tilt={tilt:4.0f} found={f}/{e} rms={r:.3f} false={fi} gt={inview}")
