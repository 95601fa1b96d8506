"""Batched planar PnP: tag pose from 4 corners + intrinsics.

Replaces cv2.solvePnP (reference tag_detector.py:30-43) with a TPU-friendly
two-step estimator, vmapped over every detection in every frame at once:

1. **Closed-form init from the homography**: K^-1 H = lambda [r0 r1 t] for a
   z=0 planar target; orthonormalize [r0 r1 r0xr1] via SVD, recover t, fix
   the cheirality sign (t_z > 0).
2. **Levenberg-Marquardt refinement** of the 8-residual corner reprojection
   over the 6-dof se(3) tangent, fixed iteration count (jit-friendly), with
   the Jacobian from forward-mode autodiff.

Outputs match the reference convention: T is camera->tag (tag pose in the CV
camera frame), rvec/tvec as in OpenCV.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3_exp, so3_log, make_se3, tag_object_corners
from ..detect.decode import homography_from_corners, Detections


def _pose_from_homography(H_obj: jax.Array, K_inv: jax.Array) -> jax.Array:
    """(..., 3, 3) object-plane->pixel homography -> (..., 4, 4) T_cam_tag."""
    M = jnp.einsum("ij,...jk->...ik", K_inv, H_obj)
    c0 = M[..., :, 0]
    c1 = M[..., :, 1]
    c2 = M[..., :, 2]
    lam = 2.0 / (jnp.linalg.norm(c0, axis=-1) + jnp.linalg.norm(c1, axis=-1) + 1e-12)
    # Cheirality: tag must be in front of the camera (t_z > 0).
    sign = jnp.where(c2[..., 2] * lam > 0, 1.0, -1.0)
    lam = lam * sign
    r0 = c0 * lam[..., None]
    r1 = c1 * lam[..., None]
    r2 = jnp.cross(r0, r1)
    R_approx = jnp.stack([r0, r1, r2], axis=-1)
    U, _, Vt = jnp.linalg.svd(R_approx)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    D = jnp.zeros_like(R_approx).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0).at[..., 2, 2].set(det)
    R = jnp.einsum("...ij,...jk,...kl->...il", U, D, Vt)
    t = c2 * lam[..., None]
    return make_se3(R, t)


def _project_corners(T: jax.Array, obj: jax.Array, K: jax.Array) -> jax.Array:
    """T (4,4), obj (4,3), K (3,3) -> (4,2) pixels."""
    p = obj @ T[:3, :3].T + T[:3, 3]
    z = jnp.where(jnp.abs(p[:, 2:3]) < 1e-9, 1e-9, p[:, 2:3])
    xy = p[:, :2] / z
    return jnp.stack([K[0, 0] * xy[:, 0] + K[0, 2], K[1, 1] * xy[:, 1] + K[1, 2]], axis=-1)


def _refine_one(T0: jax.Array, corners: jax.Array, obj: jax.Array, K: jax.Array,
                iters: int, lm_lambda: float) -> tuple[jax.Array, jax.Array]:
    """LM refinement for a single detection. Returns (T, rms_px)."""

    def residual(xi, T):
        T_new = se3_exp(xi) @ T
        return (_project_corners(T_new, obj, K) - corners).reshape(-1)

    def step(T, _):
        r = residual(jnp.zeros(6, dtype=T.dtype), T)
        J = jax.jacfwd(residual)(jnp.zeros(6, dtype=T.dtype), T)  # (8, 6)
        A = J.T @ J + lm_lambda * jnp.eye(6, dtype=T.dtype)
        g = J.T @ r
        xi = -jnp.linalg.solve(A, g)
        T_new = se3_exp(xi) @ T
        r_new = residual(jnp.zeros(6, dtype=T.dtype), T_new)
        better = jnp.sum(r_new**2) < jnp.sum(r**2)
        return jnp.where(better, T_new, T), None

    T, _ = jax.lax.scan(step, T0, None, length=iters)
    rms = jnp.sqrt(jnp.mean(residual(jnp.zeros(6, dtype=T.dtype), T) ** 2))
    return T, rms


@partial(jax.jit, static_argnames=("iters",))
def solve_planar_pnp(
    corners: jax.Array,  # (..., 4, 2) pixel corners in lb-rb-rt-lt order
    K: jax.Array,  # (3, 3)
    tag_size: float | jax.Array,
    iters: int = 8,
    lm_lambda: float = 1e-6,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Batched planar PnP.

    Returns (T (..., 4, 4) camera->tag, rvec (..., 3), tvec (..., 3),
    reproj_rms (...,)). Matches the object-point convention of reference
    tag_detector.py:35-38.
    """
    corners = corners.astype(jnp.float32)
    K = K.astype(jnp.float32)
    obj = tag_object_corners(tag_size)  # (4, 3) z=0 plane
    # Homography: quad frame [-1,1]^2 (y down) -> pixels; object x = a*s/2,
    # y = -b*s/2 (tag frame y up), so H_obj = H_quad @ diag(2/s, -2/s, 1).
    Hq = homography_from_corners(corners)
    s = jnp.asarray(tag_size, dtype=jnp.float32)
    S = jnp.asarray(
        [[2.0, 0.0, 0.0], [0.0, -2.0, 0.0], [0.0, 0.0, 1.0]], dtype=jnp.float32
    ) * jnp.asarray([1.0 / s, 1.0 / s, 1.0])[:, None]
    H_obj = Hq @ S
    K_inv = jnp.linalg.inv(K)
    T0 = _pose_from_homography(H_obj, K_inv)

    batch_shape = corners.shape[:-2]
    Tf = T0.reshape((-1, 4, 4))
    cf = corners.reshape((-1, 4, 2))
    T, rms = jax.vmap(lambda T0i, ci: _refine_one(T0i, ci, obj, K, iters, lm_lambda))(Tf, cf)
    T = T.reshape(batch_shape + (4, 4))
    rms = rms.reshape(batch_shape)
    rvec = so3_log(T[..., :3, :3])
    tvec = T[..., :3, 3]
    return T, rvec, tvec, rms


def poses_from_detections(
    det: Detections,
    K: jax.Array,
    tag_size: float,
    iters: int = 8,
    max_reproj_px: float = 2.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Estimate T_cam_tag for every detection.

    Returns (T (B, D, 4, 4), ok (B, D) bool, reproj_rms (B, D)) where ok
    combines detection validity, cheirality, and reprojection quality —
    the batched analog of the reference's per-tag retval (slam.py:29-31).
    """
    T, _, tvec, rms = solve_planar_pnp(det.corners, K, tag_size, iters=iters)
    ok = det.valid & (tvec[..., 2] > 0) & (rms < max_reproj_px)
    return T, ok, rms
