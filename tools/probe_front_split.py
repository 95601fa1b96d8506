"""TPU probe: front-end (pre-CCL) stage split.

Times grayscale, decimate, threshold (with/without the noise-sigma
median), and the full front prefix, pipelined. Run ON the TPU.
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
from aprilslam_tpu.sim import SceneConfig, scene_tensors, render_frames, trajectory
from aprilslam_tpu.detect import DetectorParams
from aprilslam_tpu.detect.threshold import (
    to_grayscale, decimate, adaptive_threshold_with_levels,
    estimate_noise_sigma, _box3, _tile_minmax,
)

print("device:", jax.devices()[0])
B = int(os.environ.get("B", "8"))
H = W = int(os.environ.get("RES", "1000"))
cfg = SceneConfig.from_file()
cam = PinholeCamera.from_fov(W, H, cfg.fov_y)
scene = scene_tensors(cfg)
p = DetectorParams(quad_decimate=2, min_cluster_pts=12)
traj = trajectory.monte_carlo(B, seed=3)
fr_f = render_frames(scene, jnp.asarray(traj.positions),
                     jnp.asarray(traj.rotations),
                     jnp.asarray(cam.inv_matrix), H, W, 2)
frames = jnp.clip(fr_f * 255.0, 0, 255).astype(jnp.uint8)  # bench dtype
gray = to_grayscale(frames)
dec = decimate(gray, 2)
jax.block_until_ready(dec)


def timed(name, fn, *a, reps=30):
    f = jax.jit(fn)
    jax.block_until_ready(f(*a))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*a)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    print(f"{name:36s} {best:8.2f} ms/call  {best / B:6.3f} ms/frame")
    return best


timed("gray(uint8 1000^2)", to_grayscale, frames)
timed("gray+decimate", lambda f: decimate(to_grayscale(f), 2), frames)
timed("noise_sigma(dec)", estimate_noise_sigma, dec)
timed("box3(dec)", _box3, dec)
timed("tile_minmax(box3)", lambda d: _tile_minmax(_box3(d), 4), dec)
timed("threshold(dec) full", lambda d: adaptive_threshold_with_levels(
    d, tile=p.tile, min_contrast=p.min_contrast), dec)
timed("threshold(dec) no_noise", lambda d: adaptive_threshold_with_levels(
    d, tile=p.tile, min_contrast=p.min_contrast, noise_adapt=False), dec)
timed("front total (gray+dec+thr)", lambda f: adaptive_threshold_with_levels(
    decimate(to_grayscale(f), 2), tile=p.tile, min_contrast=p.min_contrast),
    frames)


# ---- candidate optimizations -------------------------------------------
def decimate_mm(frames_u8, factor=2):
    """gray+decimate as two MXU matmuls; /255 folded into the matrices."""
    B, H, W = frames_u8.shape
    Hd, Wd = H // factor, W // factor
    Dr = jnp.zeros((Hd, H), jnp.float32)
    r = jnp.arange(H)
    Dr = Dr.at[r // factor, r].set(1.0 / factor / 255.0)
    Dc = jnp.zeros((W, Wd), jnp.float32)
    c = jnp.arange(W)
    Dc = Dc.at[c, c // factor].set(1.0 / factor)
    x = frames_u8.astype(jnp.float32)
    return jnp.einsum("rh,bhw,wc->brc", Dr, x, Dc)


def sigma_sub8(dec):
    B = dec.shape[0]
    sub = dec[:, ::8, ::8]
    d = jnp.abs(sub[:, :, 1:] - sub[:, :, :-1])
    return jnp.median(d.reshape(B, -1), axis=-1) / 0.954


ref = np.asarray(decimate(to_grayscale(frames), 2))
got = np.asarray(jax.jit(decimate_mm)(frames))
print("decimate_mm max err:", float(np.abs(ref - got).max()))
timed("decimate_mm(uint8->dec)", decimate_mm, frames)
timed("noise_sigma_sub8", sigma_sub8, dec)
timed("front mm+sub8 total", lambda f: adaptive_threshold_with_levels(
    decimate_mm(f), tile=p.tile, min_contrast=p.min_contrast), frames)


def box3_mm(x):
    B, H, W = x.shape
    br = np.zeros((H, H), np.float32)
    for i in range(H):
        for d in (-1, 0, 1):
            br[i, min(max(i + d, 0), H - 1)] += 1.0 / 3.0
    bc = br.T.copy() if W == H else None
    Br = jnp.asarray(br)
    Bc = jnp.asarray(bc)
    return jnp.einsum("rh,bhw,wc->brc", Br, x, Bc)


def sigma_bisect(dec, iters=12):
    B = dec.shape[0]
    sub = dec[:, ::4, ::4]
    d = jnp.abs(sub[:, :, 1:] - sub[:, :, :-1]).reshape(B, -1)
    n = d.shape[1]
    lo = jnp.zeros((B,), jnp.float32)
    hi = jnp.full((B,), 0.5, jnp.float32)

    def body(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        below = jnp.sum((d <= mid[:, None]).astype(jnp.float32), axis=1)
        go_lo = below >= 0.5 * n
        return jnp.where(go_lo, lo, mid), jnp.where(go_lo, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi) / 0.954


ref_b = np.asarray(_box3(dec))
got_b = np.asarray(jax.jit(box3_mm)(dec))
print("box3_mm max err:", float(np.abs(ref_b - got_b).max()))
s_ref = np.asarray(estimate_noise_sigma(dec))
s_got = np.asarray(jax.jit(sigma_bisect)(dec))
print("sigma ref:", s_ref.round(5).tolist()[:4], "bisect:", s_got.round(5).tolist()[:4])
timed("box3_mm", box3_mm, dec)
timed("sigma_bisect", sigma_bisect, dec)
