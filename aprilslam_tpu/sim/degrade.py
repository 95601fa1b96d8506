"""Image degradations for sensor-realistic rendering and robustness tests.

The round-1 detector was only ever validated against frames produced by its
own rasterizer, so a shared convention bug could cancel out and never be
caught. These helpers break that symmetry: they warp/degrade a clean render
the way a real sensor would — lens distortion, shot noise, defocus blur,
exposure gradients, gamma, vignetting — *after* the rasterizer and with
independent math (inverse-map resampling, separable convolution), so detect
and render conventions can no longer cancel.

All functions take (B, H, W) float32 frames in [0, 1] and return the same.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.camera import undistort_pixels


def _bilinear_sample(frame: jax.Array, uv: jax.Array) -> jax.Array:
    """Sample one (H, W) frame at pixel coords uv (H, W, 2), clamp-to-edge."""
    H, W = frame.shape
    u = jnp.clip(uv[..., 0], 0.0, W - 1.0)
    v = jnp.clip(uv[..., 1], 0.0, H - 1.0)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    u1i = jnp.minimum(u0i + 1, W - 1)
    v1i = jnp.minimum(v0i + 1, H - 1)
    f00 = frame[v0i, u0i]
    f01 = frame[v0i, u1i]
    f10 = frame[v1i, u0i]
    f11 = frame[v1i, u1i]
    top = f00 * (1 - du) + f01 * du
    bot = f10 * (1 - du) + f11 * du
    return top * (1 - dv) + bot * dv


def apply_lens_distortion(frames: jax.Array, K: jax.Array, dist: jax.Array) -> jax.Array:
    """Warp pinhole renders into what a distorting lens would capture.

    A scene point lands at ideal pixel u_i in the render and at
    u_d = distort(u_i) on the real sensor, so the distorted image is
    I_d(u_d) = I_ideal(undistort(u_d)) — an inverse-map bilinear resample.
    Together with geometry.undistort_pixels this closes the loop the
    reference closes with cv2 (tag_detector.py:41 passes dist_coeffs to
    solvePnP): render -> distort -> detect -> undistort -> pinhole PnP.
    """
    B, H, W = frames.shape
    v, u = jnp.meshgrid(
        jnp.arange(H, dtype=frames.dtype), jnp.arange(W, dtype=frames.dtype), indexing="ij"
    )
    grid = jnp.stack([u, v], axis=-1)  # (H, W, 2) distorted pixel coords
    src = undistort_pixels(grid, K.astype(frames.dtype), dist)
    return jax.vmap(lambda f: _bilinear_sample(f, src))(frames)


def gaussian_noise(frames: jax.Array, sigma: float, key: jax.Array) -> jax.Array:
    """Additive sensor noise, clipped back to [0, 1]."""
    n = sigma * jax.random.normal(key, frames.shape, frames.dtype)
    return jnp.clip(frames + n, 0.0, 1.0)


def _gauss_kernel1d(sigma: float, dtype) -> jax.Array:
    radius = max(1, int(3.0 * sigma + 0.5))
    x = jnp.arange(-radius, radius + 1, dtype=dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(frames: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian defocus blur (static kernel size — jit friendly)."""
    if sigma <= 0:
        return frames
    k = _gauss_kernel1d(float(sigma), frames.dtype)
    n = k.shape[0]
    x = frames[:, None]  # (B, 1, H, W)
    kv = k.reshape(1, 1, n, 1)
    kh = k.reshape(1, 1, 1, n)
    dn = jax.lax.conv_dimension_numbers(x.shape, kv.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), "SAME", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME", dimension_numbers=dn)
    return x[:, 0]


def brightness_gradient(frames: jax.Array, strength: float, horizontal: bool = True) -> jax.Array:
    """Multiplicative exposure ramp from (1-strength) to (1+strength)."""
    B, H, W = frames.shape
    n = W if horizontal else H
    ramp = 1.0 + strength * (2.0 * jnp.arange(n, dtype=frames.dtype) / (n - 1) - 1.0)
    ramp = ramp[None, None, :] if horizontal else ramp[None, :, None]
    return jnp.clip(frames * ramp, 0.0, 1.0)


def gamma_correct(frames: jax.Array, gamma: float) -> jax.Array:
    """Nonlinear sensor response: out = in ** gamma."""
    return jnp.clip(frames, 1e-6, 1.0) ** gamma


def vignette(frames: jax.Array, strength: float) -> jax.Array:
    """Radial falloff: corners darkened by `strength` (cos^4-style profile)."""
    B, H, W = frames.shape
    v, u = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, H, dtype=frames.dtype),
        jnp.linspace(-1.0, 1.0, W, dtype=frames.dtype),
        indexing="ij",
    )
    r2 = (u * u + v * v) / 2.0  # 1.0 at the corners
    fall = 1.0 - strength * r2
    return jnp.clip(frames * fall[None], 0.0, 1.0)
