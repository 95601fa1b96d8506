"""Preprocessing + adaptive thresholding (stage 1 of the detector).

TPU-native counterpart of the C apriltag front end (grayscale conversion at
reference tag_detector.py:25, then the C library's decimate + tile-based
adaptive threshold). Everything is expressed as reduce-window/reshape ops that
XLA fuses into a handful of VPU passes over the frame batch.

Output is a trinary map: +1 white, 0 black, -1 unknown (insufficient local
contrast) — unknown pixels neither join components nor form boundaries.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BGR_WEIGHTS = (0.114, 0.587, 0.299)  # cv2 BGR2GRAY convention


def to_grayscale(frames: jax.Array) -> jax.Array:
    """(B, H, W[, 3]) uint8/float -> (B, H, W) float32 in [0, 1].

    3-channel input is taken as BGR (cv2 convention, tag_detector.py:25).
    """
    if frames.dtype == jnp.uint8:
        frames = frames.astype(jnp.float32) / 255.0
    frames = frames.astype(jnp.float32)
    if frames.ndim == 4:
        w = jnp.asarray(BGR_WEIGHTS, dtype=jnp.float32)
        frames = jnp.einsum("bhwc,c->bhw", frames, w)
    return frames


def decimate(frames: jax.Array, factor: int) -> jax.Array:
    """Average-pool by an integer factor (apriltag's quad_decimate).

    Expressed as two matmuls with block-diagonal averaging matrices: the
    MXU is idle during the front end, and XLA fuses the preceding
    uint8->float grayscale convert into the matmul read. Measured on v5e
    at 1000x1000 B=8 (tools/probe_front_split.py, 2026-08-21): 0.16
    ms/frame vs 0.37 for reshape-and-mean (which itself beat factor^2
    strided slices), exact to float eps (1.2e-7).
    """
    if factor == 1:
        return frames
    import numpy as np

    B, H, W = frames.shape
    Hd, Wd = H // factor, W // factor
    dr = np.zeros((Hd, H), np.float32)
    dr[np.arange(Hd * factor) // factor, np.arange(Hd * factor)] = 1.0 / factor
    dc = np.zeros((W, Wd), np.float32)
    dc[np.arange(Wd * factor), np.arange(Wd * factor) // factor] = 1.0 / factor
    x = frames.astype(jnp.float32)
    return jnp.einsum("rh,bhw,wc->brc", jnp.asarray(dr), x, jnp.asarray(dc))


def _tile_minmax(frames: jax.Array, tile: int) -> tuple[jax.Array, jax.Array]:
    """Per-tile min/max, then min/max over the 3x3 tile neighbourhood."""
    B, H, W = frames.shape
    Ht, Wt = H // tile, W // tile
    x = frames[:, : Ht * tile, : Wt * tile].reshape(B, Ht, tile, Wt, tile)
    tmin = x.min(axis=(2, 4))
    tmax = x.max(axis=(2, 4))

    def neigh(t, op):
        pads = jnp.pad(t, ((0, 0), (1, 1), (1, 1)), mode="edge")
        out = t
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                out = op(out, pads[:, 1 + dy : 1 + dy + Ht, 1 + dx : 1 + dx + Wt])
        return out

    nmin = neigh(tmin, jnp.minimum)
    nmax = neigh(tmax, jnp.maximum)
    return nmin, nmax


def _box3(x: jax.Array) -> jax.Array:
    """Separable 3x3 box mean with edge padding (one fused VPU pass)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="edge")
    x = (xp[:, :-2] + xp[:, 1:-1] + xp[:, 2:]) * (1.0 / 3.0)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)), mode="edge")
    return (xp[:, :, :-2] + xp[:, :, 1:-1] + xp[:, :, 2:]) * (1.0 / 3.0)


def estimate_noise_sigma(frames: jax.Array) -> jax.Array:
    """Robust per-frame noise sigma from horizontal first differences.

    For i.i.d. Gaussian sensor noise, |x[i+1] - x[i]| has median
    0.6745 * sqrt(2) * sigma ~= 0.954 * sigma in uniform regions; the
    median ignores the sparse real edges, so clean renders estimate ~0.
    Rows AND columns are subsampled 4x: the median is sort-based (the
    costliest op in the threshold stage), and ~6e4 samples already give a
    ~0.4% standard error on the median — a 16x cheaper sort for the same
    three-significant-figure estimate. Returns (B,) sigma estimates.
    """
    B = frames.shape[0]
    sub = frames[:, ::4, ::4]
    d = jnp.abs(sub[:, :, 1:] - sub[:, :, :-1])
    return jnp.median(d.reshape(B, -1), axis=-1) / 0.954


@partial(jax.jit, static_argnames=("tile", "min_contrast", "smooth", "noise_adapt", "noise_mult"))
def adaptive_threshold_with_levels(
    frames: jax.Array,
    tile: int = 4,
    min_contrast: float = 0.1,
    smooth: bool = True,
    noise_adapt: bool = True,
    noise_mult: float = 3.0,
) -> tuple[jax.Array, jax.Array]:
    """(B, H, W) float32 -> (trinary int8, local threshold level float32).

    Trinary: +1 white, 0 black, -1 unknown. Neighbourhood tile min/max
    thresholding at (min+max)/2, with low-contrast tiles marked unknown — the
    same scheme the C detector uses, reformulated as pooled reductions. The
    per-pixel threshold level is also returned: the boundary stage uses it to
    place edge points at the subpixel gray-level crossing.

    ``smooth`` runs the min/max statistics AND the classification on a 3x3
    box-filtered copy: tile min/max are extreme-value statistics over ~144
    pixels, so unsmoothed sensor noise of sigma inflates the apparent tile
    contrast by ~6*sigma and flips uniform background tiles past
    ``min_contrast``, flooding the component stage with specks. Box
    smoothing cuts that to ~2*sigma while leaving straight-edge crossings
    unbiased (the filter is symmetric). The subpixel boundary interpolation
    still uses the ORIGINAL gray image.

    ``noise_adapt`` raises the contrast floor to ``noise_mult`` * the
    frame's estimated sensor-noise sigma: tile min/max of the 3x3-smoothed
    image inflate by ~1.5 sigma under noise, so a FIXED floor below that
    turns every uniform tile "known" and floods the component stage with
    random speckle (the round-2 robustness-suite collapse at sigma=0.05).
    Real tag edges have contrast >= 0.3 even under heavy vignette/gamma, so
    the adaptive floor costs no true detections.
    """
    B, H, W = frames.shape
    stats_src = _box3(frames) if smooth else frames
    nmin, nmax = _tile_minmax(stats_src, tile)
    # Upsample tile stats back to pixel resolution.
    up_min = jnp.repeat(jnp.repeat(nmin, tile, axis=1), tile, axis=2)
    up_max = jnp.repeat(jnp.repeat(nmax, tile, axis=1), tile, axis=2)
    # Handle non-divisible edges by padding with the last row/col of stats.
    if up_min.shape[1] < H or up_min.shape[2] < W:
        up_min = jnp.pad(
            up_min, ((0, 0), (0, H - up_min.shape[1]), (0, W - up_min.shape[2])), mode="edge"
        )
        up_max = jnp.pad(
            up_max, ((0, 0), (0, H - up_max.shape[1]), (0, W - up_max.shape[2])), mode="edge"
        )
    mid = 0.5 * (up_min + up_max)
    white = (stats_src if smooth else frames) > mid
    if noise_adapt:
        floor = jnp.maximum(min_contrast, noise_mult * estimate_noise_sigma(frames))
        known = (up_max - up_min) >= floor[:, None, None]
    else:
        known = (up_max - up_min) >= min_contrast
    return jnp.where(known, white.astype(jnp.int8), jnp.int8(-1)), mid


def adaptive_threshold(
    frames: jax.Array,
    tile: int = 4,
    min_contrast: float = 0.1,
) -> jax.Array:
    """Trinary threshold map only (see adaptive_threshold_with_levels)."""
    return adaptive_threshold_with_levels(frames, tile, min_contrast)[0]
