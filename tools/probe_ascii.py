"""ASCII dump of the clean-miss tag region (frame 1, tag idx 1)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.detect import DetectorParams
from aprilslam_tpu.detect.threshold import to_grayscale, adaptive_threshold_with_levels
from aprilslam_tpu.sim import SceneConfig, scene_tensors, render_frames, project_border_corners

RES = 512
cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(RES, RES, cfg.fov_y)
scene = scene_tensors(cfg)
pos = jnp.asarray([[0.0, 0.0, 10.0], [10.0, 2.0, 0.0], [25.0, 5.0, -10.0]], jnp.float32)
rot = jnp.zeros((3, 3), jnp.float32)
frames = render_frames(scene, pos, rot, jnp.asarray(cam.inv_matrix), RES, RES, 2)
gt_uv, gt_valid = project_border_corners(scene, pos, rot, jnp.asarray(cam.matrix))
gt_uv = np.asarray(gt_uv)

gray = np.asarray(to_grayscale(frames))[1]
tr = np.asarray(adaptive_threshold_with_levels(to_grayscale(frames), tile=4, min_contrast=0.08)[0])[1]

print("tag GT corners:", gt_uv[1, 1])
print("scene tag ids:", np.asarray(scene.tag_ids), " positions:\n", np.asarray(scene.tag_pos) if hasattr(scene, 'tag_pos') else "n/a")
# gray levels, downsampled 2x for width; y 210..300, x 0..100
ramp = " .:-=+*#%@"
for y in range(215, 300, 2):
    row = "".join(ramp[min(9, int(gray[y, x] * 9.999))] for x in range(0, 100))
    print(f"{y:3d} {row}")
print("=== trinary (.=unknown, #=white, o=black) ===")
sym = {-1: ".", 0: "o", 1: "#"}
for y in range(215, 300, 2):
    row = "".join(sym[int(tr[y, x])] for x in range(0, 100))
    print(f"{y:3d} {row}")
