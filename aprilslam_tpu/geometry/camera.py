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
