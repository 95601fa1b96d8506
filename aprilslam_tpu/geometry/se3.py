"""Batched SO(3)/SE(3) primitives for the TPU-native AprilTag SLAM engine.

Everything here is pure JAX, shape-polymorphic over leading batch axes, and safe
to `jit`/`vmap`/`grad`. These replace the reference's scattered numpy/OpenCV
rotation helpers (reference: src/detection/tag_detector.py:45-68 Rodrigues +
Euler extraction, src/simulation/ground_truth.py:214-272 Euler<->R in ZYX order,
src/simulation/camera_controller.py:163-194 camera pose composition) with one
canonical, batched, differentiable module.

Conventions
-----------
* Rotations are 3x3 matrices or axis-angle 3-vectors (Rodrigues form, like
  OpenCV's ``rvec``).
* Euler angles follow the reference: ``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)``
  ("ZYX order", reference ground_truth.py:269-270) with degrees at the API
  boundary where the reference used degrees.
* SE(3) is a 4x4 homogeneous matrix; a compact (..., 6) tangent vector is
  ``[omega, v]`` (rotation first).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of (..., 3) vectors -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of :func:`hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _safe_sqrt(x: jax.Array, tiny: float = 1e-20) -> jax.Array:
    """sqrt with a NaN-free gradient at 0 and no value pollution elsewhere."""
    return jnp.sqrt(jnp.where(x < tiny, tiny, x))


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues formula: axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    Numerically stable at theta -> 0 via Taylor expansions; replaces
    cv2.Rodrigues (reference tag_detector.py:47).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = _safe_sqrt(theta2)
    # sin(t)/t and (1-cos(t))/t^2 with small-angle fallbacks.
    use_taylor = theta2 < 1e-8
    safe_theta = jnp.where(use_taylor, 1.0, theta)
    safe_theta2 = jnp.where(use_taylor, 1.0, theta2)
    a = jnp.where(use_taylor, 1.0 - theta2 / 6.0, jnp.sin(safe_theta) / safe_theta)
    b = jnp.where(use_taylor, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_theta)) / safe_theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Stable for theta in [0, pi); the pi neighbourhood uses the diagonal
    formulation.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # DERIVATIVE SAFETY: this function is differentiated (jacfwd in the BA /
    # PGO optimizers), and arccos/norm have infinite/undefined derivatives at
    # the branch points (cos = +-1, skew = 0). A `where` only blocks NaNs in
    # the UNSELECTED branch's tangent; any 0*inf formed inside the selected
    # expression still poisons it (that silently zeroed every PGO update on
    # graphs whose odometry edges had bit-exact zero residuals). So every
    # dangerous primitive gets a bounded-input evaluation, and the selected
    # small-angle branch is written in terms of cos_theta only.
    small = cos_theta > 1.0 - 1e-8
    safe_cos = jnp.clip(cos_theta, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(safe_cos)  # value+tangent finite everywhere
    sin_theta = jnp.sin(theta)
    near_pi = cos_theta < -1.0 + 5e-7
    # theta^2 ~= 2(1 - cos) near 0 — smooth in R, no arccos involved.
    t2 = 2.0 * (1.0 - cos_theta)
    scale = jnp.where(
        small,
        0.5 + t2 / 12.0,
        theta / (2.0 * jnp.where(jnp.abs(sin_theta) < _EPS, 1.0, sin_theta)),
    )
    skew = vee(R - jnp.swapaxes(R, -1, -2))
    w_generic = skew * scale[..., None]
    # Near pi the arccos-derived angle is ill-conditioned; recover it from the
    # (well-conditioned) skew magnitude instead: |vee(R - R^T)|/2 = sin(theta).
    s = jnp.clip(
        0.5 * _safe_sqrt(jnp.sum(skew * skew, axis=-1)), 0.0, 1.0 - 1e-7
    )
    theta_pi = jnp.pi - jnp.arcsin(s)
    # Axis from the largest column of R + R^T + (1 - trace) I ~ 2(1-cos) aa^T.
    S = R + jnp.swapaxes(R, -1, -2) + (1.0 - trace)[..., None, None] * jnp.broadcast_to(
        jnp.eye(3, dtype=R.dtype), R.shape
    )
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    cols = jnp.take_along_axis(S, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    axis = cols / (_safe_sqrt(jnp.sum(cols * cols, axis=-1))[..., None] + _EPS)
    # Fix the sign so that exp matches: sign from vee(R - R^T) projection
    # (falls back to + when the skew part vanishes at exactly pi).
    proj = jnp.sum(axis * skew, axis=-1)
    sgn = jnp.where(proj < 0.0, -1.0, 1.0)
    w_pi = axis * (theta_pi * sgn)[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def euler_zyx_to_matrix(euler_deg: jax.Array) -> jax.Array:
    """Euler [roll(x), pitch(y), yaw(z)] in degrees -> R = Rz @ Ry @ Rx.

    Matches reference ground_truth.py:241-272 (tag orientation convention).
    """
    r = jnp.deg2rad(euler_deg)
    roll, pitch, yaw = r[..., 0], r[..., 1], r[..., 2]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    # Rz(yaw) @ Ry(pitch) @ Rx(roll), written out.
    r00 = cy * cp
    r01 = cy * sp * sr - sy * cr
    r02 = cy * sp * cr + sy * sr
    r10 = sy * cp
    r11 = sy * sp * sr + cy * cr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_euler_zyx(R: jax.Array) -> jax.Array:
    """R -> Euler [roll, pitch, yaw] in radians (ZYX factorization).

    Matches reference ground_truth.py:214-239 including the singular branch.
    """
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    singular = sy < 1e-6
    roll = jnp.where(
        singular,
        jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
    )
    pitch = jnp.arctan2(-R[..., 2, 0], sy)
    yaw = jnp.where(singular, jnp.zeros_like(sy), jnp.arctan2(R[..., 1, 0], R[..., 0, 0]))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def camera_euler_to_matrix(rot_deg: jax.Array) -> jax.Array:
    """Camera [pitch, yaw, roll] degrees -> R = Ry(yaw) @ Rx(pitch) @ Rz(roll).

    Matches the reference camera pose convention
    (camera_controller.py:163-194: ``rotation_matrix = ry @ rx @ rz``).
    """
    r = jnp.deg2rad(rot_deg)
    pitch, yaw, roll = r[..., 0], r[..., 1], r[..., 2]
    cx, sx = jnp.cos(pitch), jnp.sin(pitch)
    cyw, syw = jnp.cos(yaw), jnp.sin(yaw)
    cz, sz = jnp.cos(roll), jnp.sin(roll)
    # Ry @ Rx @ Rz
    r00 = cyw * cz + syw * sx * sz
    r01 = -cyw * sz + syw * sx * cz
    r02 = syw * cx
    r10 = cx * sz
    r11 = cx * cz
    r12 = -sx
    r20 = -syw * cz + cyw * sx * sz
    r21 = syw * sz + cyw * sx * cz
    r22 = cyw * cx
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def make_se3(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation + (..., 3) translation -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.broadcast_to(jnp.eye(4, dtype=R.dtype), batch + (4, 4))
    T = T.at[..., :3, :3].set(jnp.broadcast_to(R, batch + (3, 3)))
    T = T.at[..., :3, 3].set(jnp.broadcast_to(t, batch + (3,)))
    return T


def rotation(T: jax.Array) -> jax.Array:
    return T[..., :3, :3]


def translation(T: jax.Array) -> jax.Array:
    return T[..., :3, 3]


def se3_inverse(T: jax.Array) -> jax.Array:
    """Closed-form inverse of a rigid transform (no linear solve).

    Replaces np.linalg.inv at reference slam_graph.py:25-27 with the
    orthogonality-aware form used at ground_truth.py:179-188.
    """
    R = rotation(T)
    t = translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return make_se3(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def se3_exp(xi: jax.Array) -> jax.Array:
    """SE(3) exponential map: (..., 6) [omega, v] -> (..., 4, 4)."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = _safe_sqrt(theta2)
    use_taylor = theta2 < 1e-8
    safe_theta = jnp.where(use_taylor, 1.0, theta)
    safe_theta2 = jnp.where(use_taylor, 1.0, theta2)
    b = jnp.where(use_taylor, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_theta)) / safe_theta2)
    c = jnp.where(
        use_taylor,
        1.0 / 6.0 - theta2 / 120.0,
        (safe_theta - jnp.sin(safe_theta)) / (safe_theta2 * safe_theta),
    )
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * (W @ W)
    return make_se3(R, jnp.einsum("...ij,...j->...i", V, v))


def se3_log(T: jax.Array) -> jax.Array:
    """SE(3) log map: (..., 4, 4) -> (..., 6) [omega, v]."""
    R = rotation(T)
    t = translation(T)
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = _safe_sqrt(theta2)
    W = hat(w)
    use_taylor = theta2 < 1e-8
    safe_theta2 = jnp.where(use_taylor, 1.0, theta2)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - theta sin / (2 (1-cos))) W^2
    half_theta = 0.5 * theta
    cot_term = jnp.where(
        use_taylor,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.where(jnp.abs(jnp.sin(half_theta)) < _EPS, 1.0, jnp.sin(half_theta)))
        / safe_theta2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    V_inv = eye - 0.5 * W + cot_term[..., None, None] * (W @ W)
    v = jnp.einsum("...ij,...j->...i", V_inv, t)
    return jnp.concatenate([w, v], axis=-1)


def se3_compose(A: jax.Array, B: jax.Array) -> jax.Array:
    """A @ B with broadcasting over batch axes."""
    return A @ B


def se3_retract(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Left-multiplicative retraction used by the optimizers: exp(xi) @ T."""
    return se3_exp(xi) @ T


def rotation_geodesic_angle(Ra: jax.Array, Rb: jax.Array) -> jax.Array:
    """Angle (radians) between two rotations."""
    Rrel = jnp.swapaxes(Ra, -1, -2) @ Rb
    trace = Rrel[..., 0, 0] + Rrel[..., 1, 1] + Rrel[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


def pose_error(T_est: jax.Array, T_gt: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(translation L2 error, rotation Frobenius error).

    Metric parity with reference ground_truth.py:274-300 so accuracy numbers
    are directly comparable to the baseline CSVs.
    """
    t_err = jnp.linalg.norm(translation(T_est) - translation(T_gt), axis=-1)
    r_err = jnp.linalg.norm(
        (rotation(T_est) - rotation(T_gt)).reshape(T_est.shape[:-2] + (9,)), axis=-1
    )
    return t_err, r_err


def project_to_so3(M: jax.Array) -> jax.Array:
    """Nearest rotation matrix via SVD (used after averaging / BA updates)."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), M.shape).at[..., 2, 2].set(det)
    return U @ D @ Vt
