"""Batched planar PnP: tag pose from 4 corners + intrinsics.

Replaces cv2.solvePnP (reference tag_detector.py:30-43) with a TPU-friendly
estimator, vmapped over every detection in every frame at once:

1. **IPPE closed-form init** (Collins & Bartoli, "Infinitesimal Plane-Based
   Pose Estimation"): planar targets admit exactly TWO local reprojection
   minima (the classic tilt ambiguity). Both candidate rotations are
   recovered analytically from the homography's first-order behaviour at the
   tag centre, and the translation for each follows from a 3x3 linear solve.
2. **Levenberg-Marquardt refinement** of BOTH candidates over the 8-residual
   corner reprojection (6-dof se(3) tangent, fixed iteration count,
   forward-mode Jacobian), then the lower-error solution wins.

A single-start homography+LM solver (what cv2.solvePnP ITERATIVE does)
silently converges to the wrong branch for shallow viewing angles, which
poisons any map built by chaining such poses. The dual-start solver also
reports an **ambiguity ratio** (best rms / other rms, in [0, 1]; near 1 =
the two branches are indistinguishable) so callers can gate map seeding.

Outputs match the reference convention: T is camera->tag (tag pose in the CV
camera frame), rvec/tvec as in OpenCV.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3_exp, so3_log, make_se3, tag_object_corners, undistort_pixels
from ..detect.decode import homography_from_corners, Detections


def _ippe_rotations(H_obj: jax.Array, K_inv: jax.Array) -> jax.Array:
    """(..., 3, 3) object-plane->pixel homography -> (..., 2, 3, 3) rotations.

    The two IPPE candidate rotations for the camera->tag transform.
    """
    Hn = jnp.einsum("ij,...jk->...ik", K_inv, H_obj)
    # Make the tag-centre depth positive (cheirality): Hn[:,2] ~ t up to scale.
    sgn = jnp.where(Hn[..., 2, 2] >= 0, 1.0, -1.0)
    Hn = Hn * sgn[..., None, None]
    h = Hn
    h9 = h[..., 2, 2]
    inv_h9 = 1.0 / jnp.where(jnp.abs(h9) < 1e-12, 1e-12, h9)

    # Projection of the object origin, in normalized image coords.
    v0 = h[..., 0, 2] * inv_h9
    v1 = h[..., 1, 2] * inv_h9

    # 2x2 Jacobian of the homography map at the object origin.
    J00 = (h[..., 0, 0] - h[..., 2, 0] * v0) * inv_h9
    J01 = (h[..., 0, 1] - h[..., 2, 1] * v0) * inv_h9
    J10 = (h[..., 1, 0] - h[..., 2, 0] * v1) * inv_h9
    J11 = (h[..., 1, 1] - h[..., 2, 1] * v1) * inv_h9

    # R_v: rotation aligning e_z with the centre ray d = (v0, v1, 1)/|.|.
    dn = jnp.sqrt(v0 * v0 + v1 * v1 + 1.0)
    dx, dy, dz = v0 / dn, v1 / dn, 1.0 / dn
    # k = e_z x d = (-dy, dx, 0);  R_v = I + [k]x + [k]x^2 / (1 + dz).
    c = 1.0 / (1.0 + dz)
    Rv = jnp.stack(
        [
            jnp.stack([1.0 - dx * dx * c, -dx * dy * c, dx], axis=-1),
            jnp.stack([-dx * dy * c, 1.0 - dy * dy * c, dy], axis=-1),
            jnp.stack([-dx, -dy, jnp.full_like(dx, 0.0) + dz], axis=-1),
        ],
        axis=-2,
    )

    # B[i, j] = Rv[i, j] - v_i * Rv[2, j]  (i, j in {0, 1});  A = B^-1 J.
    B00 = Rv[..., 0, 0] - v0 * Rv[..., 2, 0]
    B01 = Rv[..., 0, 1] - v0 * Rv[..., 2, 1]
    B10 = Rv[..., 1, 0] - v1 * Rv[..., 2, 0]
    B11 = Rv[..., 1, 1] - v1 * Rv[..., 2, 1]
    detB = B00 * B11 - B01 * B10
    inv_det = 1.0 / jnp.where(jnp.abs(detB) < 1e-12, 1e-12, detB)
    A00 = (B11 * J00 - B01 * J10) * inv_det
    A01 = (B11 * J01 - B01 * J11) * inv_det
    A10 = (-B10 * J00 + B00 * J10) * inv_det
    A11 = (-B10 * J01 + B00 * J11) * inv_det

    # Largest singular value of A (closed form for 2x2 via A^T A).
    m00 = A00 * A00 + A10 * A10
    m11 = A01 * A01 + A11 * A11
    m01 = A00 * A01 + A10 * A11
    disc = jnp.sqrt(jnp.maximum((m00 - m11) ** 2 + 4.0 * m01 * m01, 0.0))
    s1sq = 0.5 * (m00 + m11 + disc)
    gamma = 1.0 / jnp.sqrt(jnp.maximum(s1sq, 1e-12))

    # P = gamma * A is the top-left 2x2 of the canonical-frame rotation.
    p00, p01, p10, p11 = gamma * A00, gamma * A01, gamma * A10, gamma * A11
    # Complete the first two columns q1 = [p00, p10, c0], q2 = [p01, p11, c1]:
    # |q| = 1 fixes magnitudes; orthogonality fixes the relative sign; the
    # global sign flip of (c0, c1) is exactly the planar two-fold ambiguity.
    c0 = jnp.sqrt(jnp.maximum(1.0 - (p00 * p00 + p10 * p10), 0.0))
    c1m = jnp.sqrt(jnp.maximum(1.0 - (p01 * p01 + p11 * p11), 0.0))
    dot01 = p00 * p01 + p10 * p11
    srel = jnp.where(dot01 > 0, -1.0, 1.0)  # c0*c1 = -q1_2d . q2_2d
    c1 = srel * c1m

    def build(c0s, c1s):
        q1 = jnp.stack([p00, p10, c0s], axis=-1)
        q2 = jnp.stack([p01, p11, c1s], axis=-1)
        q3 = jnp.cross(q1, q2)
        Rt = jnp.stack([q1, q2, q3], axis=-1)  # columns
        return jnp.einsum("...ij,...jk->...ik", Rv, Rt)

    R_a = build(c0, c1)
    R_b = build(-c0, -c1)
    return jnp.stack([R_a, R_b], axis=-3)  # (..., 2, 3, 3)


def _translation_for_rotation(
    R: jax.Array, obj: jax.Array, corners: jax.Array, K_inv: jax.Array
) -> jax.Array:
    """Least-squares translation given rotation (..., 3, 3) -> (..., 3).

    Minimizes || u_i (R X_i + t)_z - (R X_i + t)_{x,y} || over the 4 corners
    (u in normalized image coords): 8 linear equations in t, solved via the
    3x3 normal equations — batched, no SVD.
    """
    ones = jnp.ones_like(corners[..., :1])
    m = jnp.einsum("ij,...cj->...ci", K_inv, jnp.concatenate([corners, ones], axis=-1))
    u = m[..., :2] / m[..., 2:3]  # (..., 4, 2) normalized coords
    RX = jnp.einsum("...ij,cj->...ci", R, obj)  # (..., 4, 3)
    # Rows: [-1 0 u0] t = RX_x - u0 RX_z ; [0 -1 u1] t = RX_y - u1 RX_z
    zeros = jnp.zeros_like(u[..., 0])
    mones = -jnp.ones_like(u[..., 0])
    r1 = jnp.stack([mones, zeros, u[..., 0]], axis=-1)  # (..., 4, 3)
    r2 = jnp.stack([zeros, mones, u[..., 1]], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 8, 3)
    b = jnp.concatenate(
        [RX[..., 0] - u[..., 0] * RX[..., 2], RX[..., 1] - u[..., 1] * RX[..., 2]],
        axis=-1,
    )  # (..., 8)
    AtA = jnp.einsum("...ri,...rj->...ij", A, A) + 1e-9 * jnp.eye(3, dtype=A.dtype)
    Atb = jnp.einsum("...ri,...r->...i", A, b)
    return jnp.linalg.solve(AtA, Atb[..., None])[..., 0]


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
        A = J.T @ J
        A = A + lm_lambda * jnp.diag(jnp.diagonal(A)) + 1e-9 * jnp.eye(6, dtype=T.dtype)
        g = J.T @ r
        xi = -jnp.linalg.solve(A, g)
        T_new = se3_exp(xi) @ T
        r_new = residual(jnp.zeros(6, dtype=T.dtype), T_new)
        better = jnp.sum(r_new**2) < jnp.sum(r**2)
        return jnp.where(better, T_new, T), None

    T, _ = jax.lax.scan(step, T0, None, length=iters)
    rms = jnp.sqrt(jnp.mean(residual(jnp.zeros(6, dtype=T.dtype), T) ** 2))
    return T, rms


class PnPDual(NamedTuple):
    """Both branches of the planar-PnP ambiguity, best first."""

    T: jax.Array  # (..., 4, 4) best camera->tag
    rms: jax.Array  # (...,) reprojection rms of the best branch (px)
    T_alt: jax.Array  # (..., 4, 4) the other branch
    rms_alt: jax.Array  # (...,)
    ambiguity: jax.Array  # (...,) rms / rms_alt in [0, 1]; near 1 = ambiguous


@partial(jax.jit, static_argnames=("iters",))
def solve_planar_pnp_dual(
    corners: jax.Array,  # (..., 4, 2) pixel corners in lb-rb-rt-lt order
    K: jax.Array,  # (3, 3)
    tag_size: float | jax.Array,
    iters: int = 8,
    lm_lambda: float = 1e-4,
) -> PnPDual:
    """Batched dual-hypothesis planar PnP (IPPE init, LM-refined branches)."""
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

    R2 = _ippe_rotations(H_obj, K_inv)  # (..., 2, 3, 3)
    c2 = jnp.broadcast_to(corners[..., None, :, :], R2.shape[:-2] + (4, 2))
    t2 = _translation_for_rotation(R2, obj, c2, K_inv)  # (..., 2, 3)
    T0 = make_se3(R2, t2)  # (..., 2, 4, 4)

    batch_shape = corners.shape[:-2]
    Tf = T0.reshape((-1, 4, 4))
    cf = c2.reshape((-1, 4, 2))
    T, rms = jax.vmap(lambda T0i, ci: _refine_one(T0i, ci, obj, K, iters, lm_lambda))(Tf, cf)
    T = T.reshape(batch_shape + (2, 4, 4))
    rms = rms.reshape(batch_shape + (2,))

    best = jnp.argmin(rms, axis=-1)
    T_best = jnp.take_along_axis(T, best[..., None, None, None], axis=-3)[..., 0, :, :]
    T_alt = jnp.take_along_axis(T, (1 - best)[..., None, None, None], axis=-3)[..., 0, :, :]
    rms_best = jnp.take_along_axis(rms, best[..., None], axis=-1)[..., 0]
    rms_alt = jnp.take_along_axis(rms, (1 - best)[..., None], axis=-1)[..., 0]
    ambiguity = rms_best / jnp.maximum(rms_alt, 1e-9)
    return PnPDual(T_best, rms_best, T_alt, rms_alt, ambiguity)


@partial(jax.jit, static_argnames=("iters",))
def solve_planar_pnp(
    corners: jax.Array,  # (..., 4, 2) pixel corners in lb-rb-rt-lt order
    K: jax.Array,  # (3, 3)
    tag_size: float | jax.Array,
    iters: int = 8,
    lm_lambda: float = 1e-4,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Batched planar PnP (best IPPE branch).

    Returns (T (..., 4, 4) camera->tag, rvec (..., 3), tvec (..., 3),
    reproj_rms (...,)). Matches the object-point convention of reference
    tag_detector.py:35-38.
    """
    res = solve_planar_pnp_dual(corners, K, tag_size, iters=iters,
                                lm_lambda=lm_lambda)
    rvec = so3_log(res.T[..., :3, :3])
    tvec = res.T[..., :3, 3]
    return res.T, rvec, tvec, res.rms


def poses_from_detections(
    det: Detections,
    K: jax.Array,
    tag_size: float,
    iters: int = 8,
    max_reproj_px: float = 2.0,
    ambiguity_max: float = 0.55,
    branch_sep_ok: float = 0.35,
    dist_coeffs: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Estimate T_cam_tag for every detection.

    Returns (T (B, D, 4, 4), ok (B, D) bool, reproj_rms (B, D),
    seed_ok (B, D), T_alt (B, D, 4, 4)) where ok combines detection
    validity, cheirality, and reprojection quality — the batched analog of
    the reference's per-tag retval (slam.py:29-31).

    ``seed_ok`` additionally requires the pose to be branch-reliable: either
    the rejected IPPE branch fits clearly worse (rms ratio < ambiguity_max),
    or the two branches are nearly the same rotation (near-frontal views,
    where the ambiguity is harmless). Use it to gate MAP SEEDING; plain
    ``ok`` is fine for localization, which only consumes corners. ``T_alt``
    is the rejected ambiguity branch — localizers should try both as inits
    when only one tag anchors the pose.
    """
    corners = det.corners
    if dist_coeffs is not None:
        # Compensate lens distortion on the measured corners so the pinhole
        # PnP below is exact — the counterpart of the reference passing
        # dist_coeffs to cv2.solvePnP (tag_detector.py:41).
        corners = undistort_pixels(corners, K, jnp.asarray(dist_coeffs))
    res = solve_planar_pnp_dual(corners, K, tag_size, iters=iters)
    ok = det.valid & (res.T[..., 2, 3] > 0) & (res.rms < max_reproj_px)
    sep = jnp.linalg.norm(
        res.T[..., :3, :3] - res.T_alt[..., :3, :3], axis=(-2, -1)
    )
    seed_ok = ok & ((res.ambiguity < ambiguity_max) | (sep < branch_sep_ok))
    return res.T, ok, res.rms, seed_ok, res.T_alt
