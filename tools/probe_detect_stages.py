"""Stage-by-stage dump for detector misses: clean frame-1 tag-1 and the
noise sigma=0.05 collapse. Prints where each missing tag dies in the
pipeline (threshold -> CCL -> cluster -> quad fit -> decode)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.detect import DetectorParams
from aprilslam_tpu.detect.threshold import to_grayscale, decimate, adaptive_threshold_with_levels
from aprilslam_tpu.detect.segment import connected_components_auto
from aprilslam_tpu.detect.quads import quad_candidates
from aprilslam_tpu.detect.decode import decode_quads, FamilyTensors
from aprilslam_tpu.families import get_family
from aprilslam_tpu.sim import SceneConfig, scene_tensors, render_frames, project_border_corners, degrade

RES = 512

cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(RES, RES, cfg.fov_y)
scene = scene_tensors(cfg)
pos = jnp.asarray([[0.0, 0.0, 10.0], [10.0, 2.0, 0.0], [25.0, 5.0, -10.0]], jnp.float32)
rot = jnp.zeros((3, 3), jnp.float32)
frames = render_frames(scene, pos, rot, jnp.asarray(cam.inv_matrix), RES, RES, 2)
gt_uv, gt_valid = project_border_corners(scene, pos, rot, jnp.asarray(cam.matrix))
gt_uv = np.asarray(gt_uv)

p = DetectorParams(quad_decimate=1, min_cluster_pts=12)
fam = get_family(cfg.family)
ft = FamilyTensors(fam)


def stages(x):
    gray = to_grayscale(x)
    dec = decimate(gray, p.quad_decimate)
    trinary, level = adaptive_threshold_with_levels(dec, tile=p.tile, min_contrast=p.min_contrast)
    labels = connected_components_auto(trinary, p.scan_iters, p.jump_iters)
    quads = quad_candidates(
        trinary, labels, dec, p.quad_decimate, level,
        max_clusters=p.max_clusters, max_quads=p.max_quads,
        pts_per_quad=p.pts_per_quad, min_cluster_pts=p.min_cluster_pts,
        min_side=p.min_side, refine_iters=p.refine_iters,
        max_fit_err=p.max_fit_err, max_boundary=p.max_boundary)
    det = decode_quads(gray, quads, ft, max_hamming=p.max_hamming,
                       min_level_contrast=p.min_level_contrast,
                       max_detections=p.max_detections)
    return gray, trinary, labels, quads, det


def inspect(x, b, t, tag_name):
    gray, trinary, labels, quads, det = stages(x)
    uv = gt_uv[b, t]  # (4, 2) GT corner pixels
    cx, cy = uv[:, 0].mean(), uv[:, 1].mean()
    print(f"--- {tag_name}: frame {b}, GT centre ({cx:.1f},{cy:.1f}), corners\n{uv}")
    # Quad candidates whose centre is within 40px of the GT centre
    qc = np.asarray(quads.corners[b])  # (Q, 4, 2)
    qv = np.asarray(quads.valid[b])
    qe = np.asarray(quads.fit_err[b])
    qs = np.asarray(quads.cluster_size[b])
    centers = qc.mean(axis=1)
    d = np.hypot(centers[:, 0] - cx, centers[:, 1] - cy)
    near = np.argsort(d)[:6]
    for q in near:
        print(f"  quad {q}: d={d[q]:6.1f} valid={qv[q]} fit_err={qe[q]:.3f} csize={qs[q]:.0f} corners={qc[q].round(1).tolist()}")
    ids = np.asarray(det.ids[b]); dv = np.asarray(det.valid[b])
    print(f"  decoded ids: {[int(i) for i, v in zip(ids, dv) if v]}")
    # Threshold health in a patch around the tag centre
    tr = np.asarray(trinary[b])
    r = 30
    y0, y1 = max(0, int(cy) - r), min(RES, int(cy) + r)
    x0, x1 = max(0, int(cx) - r), min(RES, int(cx) + r)
    patch = tr[y0:y1, x0:x1]
    lab = np.asarray(labels[b])[y0:y1, x0:x1]
    print(f"  trinary patch: white={np.mean(patch == 1):.2f} black={np.mean(patch == 0):.2f} unk={np.mean(patch == -1):.2f}")
    print(f"  distinct labels in patch: {len(np.unique(lab))}")
    # total boundary stats framewide
    tot_unk = np.mean(tr == -1)
    print(f"  frame unknown frac={tot_unk:.3f}, n_valid_quads={qv.sum()}")


print("======= CLEAN =======")
inspect(frames, 1, 1, "clean miss (frame1 tag idx1)")
print("======= NOISE 0.05 =======")
noisy = degrade.gaussian_noise(frames, 0.05, jax.random.PRNGKey(7))
for b, t in [(0, 1), (0, 2), (1, 0)]:
    inspect(noisy, b, t, f"noise miss f{b} t{t}")
