"""Pinhole camera model and OpenGL<->CV coordinate conventions.

Reference parity notes:
* Intrinsics are derived from the renderer's vertical FOV exactly as the
  reference does (simulation_engine.py:121-143): ``fx = fy =
  0.5 * height / tan(0.5 * fov_y)``, principal point at the image centre,
  zero distortion.
* The simulator works in an OpenGL camera frame (x right, y up, camera looks
  down -z); detection/PnP work in the CV camera frame (x right, y down,
  camera looks down +z). The flip between them is ``diag(1, -1, -1)``
  (reference ground_truth.py:71-83).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

GL_TO_CV_FLIP = np.diag([1.0, -1.0, -1.0]).astype(np.float32)


@dataclass(frozen=True)
class PinholeCamera:
    """Static pinhole intrinsics (python-level; safe to close over in jit)."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    @staticmethod
    def from_fov(width: int, height: int, fov_y_deg: float) -> "PinholeCamera":
        """Derive intrinsics from a vertical field of view.

        Mirrors reference simulation_engine.py:124-134.
        """
        f = 0.5 * height / float(np.tan(np.radians(0.5 * fov_y_deg)))
        return PinholeCamera(fx=f, fy=f, cx=width / 2.0, cy=height / 2.0, width=width, height=height)

    @property
    def matrix(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )

    @property
    def inv_matrix(self) -> np.ndarray:
        return np.array(
            [
                [1.0 / self.fx, 0.0, -self.cx / self.fx],
                [0.0, 1.0 / self.fy, -self.cy / self.fy],
                [0.0, 0.0, 1.0],
            ],
            dtype=np.float32,
        )


def project(points_cam: jax.Array, K: jax.Array) -> jax.Array:
    """Project CV-frame camera points (..., 3) to pixels (..., 2)."""
    z = points_cam[..., 2:3]
    xy = points_cam[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K[0, 0] * xy[..., 0] + K[0, 2]
    v = K[1, 1] * xy[..., 1] + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def unproject(pixels: jax.Array, K_inv: jax.Array) -> jax.Array:
    """Pixels (..., 2) -> normalized image-plane rays (..., 3) with z=1."""
    x = K_inv[0, 0] * pixels[..., 0] + K_inv[0, 2]
    y = K_inv[1, 1] * pixels[..., 1] + K_inv[1, 2]
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def distort_normalized(xn: jax.Array, dist: jax.Array) -> jax.Array:
    """Apply Brown-Conrady distortion to normalized image coords (..., 2).

    ``dist`` is the OpenCV coefficient vector (k1, k2, p1, p2[, k3]) — the
    same layout the reference loads from its calibration .npz and feeds to
    cv2.solvePnP (reference tag_detector.py:41, video_detection.py:41-73).
    Radial terms up to r^6 plus tangential terms.
    """
    dist = jnp.asarray(dist, dtype=xn.dtype)
    d = jnp.zeros(5, dtype=xn.dtype).at[: dist.shape[-1]].set(dist[:5])
    k1, k2, p1, p2, k3 = d[0], d[1], d[2], d[3], d[4]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xt = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yt = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([x * radial + xt, y * radial + yt], axis=-1)


def undistort_normalized(xd: jax.Array, dist: jax.Array, iters: int = 10) -> jax.Array:
    """Invert Brown-Conrady distortion by fixed-point iteration (..., 2).

    Same compensation loop cv2.undistortPoints runs, written as a
    fixed-count ``lax.fori_loop`` so it traces to a static XLA graph: start
    from the distorted coords and repeatedly divide out the radial factor /
    subtract the tangential shift evaluated at the current estimate.
    Converges to float32 round-off in <10 iterations for |k1| <= 0.5.
    """
    dist = jnp.asarray(dist, dtype=xd.dtype)
    d = jnp.zeros(5, dtype=xd.dtype).at[: dist.shape[-1]].set(dist[:5])
    k1, k2, p1, p2, k3 = d[0], d[1], d[2], d[3], d[4]
    x0, y0 = xd[..., 0], xd[..., 1]

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        inv = 1.0 / jnp.where(jnp.abs(radial) < 1e-6, 1e-6, radial)
        xt = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yt = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return ((x0 - xt) * inv, (y0 - yt) * inv)

    x, y = jax.lax.fori_loop(0, iters, body, (x0, y0))
    return jnp.stack([x, y], axis=-1)


def distort_pixels(px: jax.Array, K: jax.Array, dist: jax.Array) -> jax.Array:
    """Ideal pinhole pixels (..., 2) -> observed (distorted) pixels."""
    x = (px[..., 0] - K[0, 2]) / K[0, 0]
    y = (px[..., 1] - K[1, 2]) / K[1, 1]
    xd = distort_normalized(jnp.stack([x, y], axis=-1), dist)
    return jnp.stack(
        [K[0, 0] * xd[..., 0] + K[0, 2], K[1, 1] * xd[..., 1] + K[1, 2]], axis=-1
    )


def undistort_pixels(px: jax.Array, K: jax.Array, dist: jax.Array, iters: int = 10) -> jax.Array:
    """Observed (distorted) pixels (..., 2) -> ideal pinhole pixels.

    This is the cv2.undistortPoints(..., P=K) equivalent: after it, the
    pinhole-only PnP/calibration math applies exactly.
    """
    x = (px[..., 0] - K[0, 2]) / K[0, 0]
    y = (px[..., 1] - K[1, 2]) / K[1, 1]
    xn = undistort_normalized(jnp.stack([x, y], axis=-1), dist, iters=iters)
    return jnp.stack(
        [K[0, 0] * xn[..., 0] + K[0, 2], K[1, 1] * xn[..., 1] + K[1, 2]], axis=-1
    )


def gl_point_to_cv(p_gl: jax.Array) -> jax.Array:
    """Flip a GL-camera-frame point into the CV camera frame (negate y, z).

    Reference ground_truth.py:71-74.
    """
    return p_gl * jnp.asarray([1.0, -1.0, -1.0], dtype=p_gl.dtype)


def gl_rotation_to_cv(R_gl: jax.Array) -> jax.Array:
    """Left-multiply the GL->CV flip onto a rotation (ground_truth.py:80-83)."""
    flip = jnp.asarray(GL_TO_CV_FLIP, dtype=R_gl.dtype)
    return flip @ R_gl


def tag_object_corners(tag_size: float, dtype=jnp.float32) -> jax.Array:
    """The 4 tag-frame corner points in 'lb-rb-rt-lt' order.

    Matches the PnP object points of reference tag_detector.py:35-38:
    z = 0 plane, corners at +-tag_size/2, ordered
    (-,-), (+,-), (+,+), (-,+).
    """
    h = tag_size / 2.0
    return jnp.asarray(
        [[-h, -h, 0.0], [h, -h, 0.0], [h, h, 0.0], [-h, h, 0.0]], dtype=dtype
    )
