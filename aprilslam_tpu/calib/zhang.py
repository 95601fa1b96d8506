"""Camera calibration: Zhang's method with JAX refinement.

Capability parity with the reference's checkerboard calibration
(src/calibration/calibrate.py: cv2.calibrateCamera -> .npz + reprojection
quality gates) — rebuilt so the optimization runs on the XLA path:

1. Per-view DLT homographies board->image (SVD).
2. Closed-form intrinsics from the homography constraints (Zhang 2000).
3. Per-view extrinsics from K^-1 H.
4. Joint Levenberg-Marquardt over intrinsics (fx, fy, cx, cy), radial
   distortion (k1, k2), and all view poses — batched residuals over every
   corner of every view.

Corner *detection* for real images can come from any frontend (cv2's
findChessboardCorners is the usual choice and is what the apps layer uses);
this module is pure geometry and is oracle-tested against synthetic boards
and cv2.calibrateCamera.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3_exp, so3_exp


def board_points(cols: int, rows: int, square_mm: float) -> np.ndarray:
    """Inner-corner grid (cols*rows, 3) in board frame, z=0 — matches the
    reference's 10x7 board with 25 mm squares (calibrate.py:7-8)."""
    xs, ys = np.meshgrid(np.arange(cols), np.arange(rows))
    pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(cols * rows)], axis=-1)
    return (pts * square_mm).astype(np.float32)


def homography_dlt(obj_xy: jax.Array, img_uv: jax.Array) -> jax.Array:
    """N-point DLT homography (N >= 4): board plane (x, y) -> pixels.

    Normalized for conditioning; returns (3, 3) with H[2,2] ~ 1.
    """

    def normalize(p):
        mu = jnp.mean(p, axis=0)
        sd = jnp.mean(jnp.linalg.norm(p - mu, axis=-1)) + 1e-12
        s = jnp.sqrt(2.0) / sd
        T = jnp.asarray(
            [[s, 0.0, -s * mu[0]], [0.0, s, -s * mu[1]], [0.0, 0.0, 1.0]], dtype=p.dtype
        )
        ph = jnp.concatenate([p, jnp.ones_like(p[:, :1])], axis=-1) @ T.T
        return ph[:, :2], T

    x, Tx = normalize(obj_xy)
    u, Tu = normalize(img_uv)
    n = x.shape[0]
    zeros = jnp.zeros((n,), x.dtype)
    ones = jnp.ones((n,), x.dtype)
    r1 = jnp.stack([x[:, 0], x[:, 1], ones, zeros, zeros, zeros,
                    -u[:, 0] * x[:, 0], -u[:, 0] * x[:, 1], -u[:, 0]], axis=-1)
    r2 = jnp.stack([zeros, zeros, zeros, x[:, 0], x[:, 1], ones,
                    -u[:, 1] * x[:, 0], -u[:, 1] * x[:, 1], -u[:, 1]], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2n, 9)
    _, _, Vt = jnp.linalg.svd(A)
    Hn = Vt[-1].reshape(3, 3)
    H = jnp.linalg.inv(Tu) @ Hn @ Tx
    return H / H[2, 2]


def intrinsics_from_homographies(Hs: jax.Array) -> jax.Array:
    """Closed-form K init from >= 3 homographies (Zhang's B-matrix method).

    Assumes zero skew. Returns (fx, fy, cx, cy).
    """

    def v_ij(H, i, j):
        return jnp.stack(
            [
                H[0, i] * H[0, j],
                H[0, i] * H[1, j] + H[1, i] * H[0, j],
                H[1, i] * H[1, j],
                H[2, i] * H[0, j] + H[0, i] * H[2, j],
                H[2, i] * H[1, j] + H[1, i] * H[2, j],
                H[2, i] * H[2, j],
            ]
        )

    rows = []
    for k in range(Hs.shape[0]):
        H = Hs[k]
        rows.append(v_ij(H, 0, 1))
        rows.append(v_ij(H, 0, 0) - v_ij(H, 1, 1))
    V = jnp.stack(rows)
    _, _, Vt = jnp.linalg.svd(V)
    b = Vt[-1]  # B11 B12 B22 B13 B23 B33 (zero skew -> B12 ~ 0)
    B11, B12, B22, B13, B23, B33 = b
    cy = (B12 * B13 - B11 * B23) / (B11 * B22 - B12**2)
    lam = B33 - (B13**2 + cy * (B12 * B13 - B11 * B23)) / B11
    fx = jnp.sqrt(jnp.abs(lam / B11))
    fy = jnp.sqrt(jnp.abs(lam * B11 / (B11 * B22 - B12**2)))
    cx = -B13 * fx**2 / lam
    return jnp.stack([fx, fy, cx, cy])


def extrinsics_from_homography(H: jax.Array, K: jax.Array) -> jax.Array:
    """Per-view board pose T (4, 4) from H = K [r0 r1 t]."""
    M = jnp.linalg.inv(K) @ H
    lam = 2.0 / (jnp.linalg.norm(M[:, 0]) + jnp.linalg.norm(M[:, 1]) + 1e-12)
    sign = jnp.where(M[2, 2] * lam > 0, 1.0, -1.0)
    lam = lam * sign
    r0 = M[:, 0] * lam
    r1 = M[:, 1] * lam
    r2 = jnp.cross(r0, r1)
    R = jnp.stack([r0, r1, r2], axis=-1)
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.asarray([1.0, 1.0, det], R.dtype))
    R = U @ D @ Vt
    t = M[:, 2] * lam
    T = jnp.eye(4, dtype=H.dtype)
    T = T.at[:3, :3].set(R).at[:3, 3].set(t)
    return T


def _project_dist(params, poses_xi, obj, view_idx):
    """Project all corners with intrinsics + radial distortion.

    params = [fx, fy, cx, cy, k1, k2]; poses_xi (V, 6); obj (N, 3);
    view_idx (V*N,) mapping each corner row to its view.
    """
    fx, fy, cx, cy, k1, k2 = params
    T = jax.vmap(se3_exp)(poses_xi)  # (V, 4, 4)
    Tsel = T[view_idx]  # (VN, 4, 4)
    p = jnp.einsum("nij,nj->ni", Tsel[:, :3, :3], obj) + Tsel[:, :3, 3]
    z = jnp.where(jnp.abs(p[:, 2:3]) < 1e-9, 1e-9, p[:, 2:3])
    xy = p[:, :2] / z
    r2 = jnp.sum(xy**2, axis=-1, keepdims=True)
    d = 1.0 + k1 * r2 + k2 * r2**2
    xyd = xy * d
    return jnp.stack([fx * xyd[:, 0] + cx, fy * xyd[:, 1] + cy], axis=-1)


@dataclass
class CalibrationResult:
    camera_matrix: np.ndarray  # (3, 3)
    dist_coeffs: np.ndarray  # (5,) [k1, k2, 0, 0, 0] OpenCV layout
    mean_reprojection_error: float
    per_view_errors: np.ndarray
    quality: str

    @staticmethod
    def rate(err_px: float) -> str:
        """Reference quality gates (calibrate.py:88-95)."""
        if err_px < 0.5:
            return "Excellent"
        if err_px < 1.0:
            return "Good"
        if err_px < 2.0:
            return "Acceptable"
        return "Poor"

    def save_npz(self, path: str):
        """Same artifact layout the reference writes (calibrate.py:74-76)."""
        np.savez(path, camera_matrix=self.camera_matrix, dist_coeffs=self.dist_coeffs[None, :])


def calibrate_camera(
    object_points: np.ndarray,  # (N, 3) shared board model
    image_points: list[np.ndarray],  # V arrays of (N, 2)
    iters: int = 30,
) -> CalibrationResult:
    """Zhang init + joint LM refinement. Returns OpenCV-comparable results."""
    obj = jnp.asarray(object_points, dtype=jnp.float32)
    V = len(image_points)
    uv = jnp.asarray(np.stack(image_points).astype(np.float32))  # (V, N, 2)

    Hs = jnp.stack([homography_dlt(obj[:, :2], uv[v]) for v in range(V)])
    k4 = intrinsics_from_homographies(Hs)
    K0 = jnp.asarray(
        [[k4[0], 0, k4[2]], [0, k4[1], k4[3]], [0, 0, 1]], dtype=jnp.float32
    )
    Ts = jnp.stack([extrinsics_from_homography(Hs[v], K0) for v in range(V)])

    # Pose tangents relative to identity: store xi with exp(xi) = T via log.
    from ..geometry import se3_log

    xi0 = jax.vmap(se3_log)(Ts)
    params0 = jnp.asarray([k4[0], k4[1], k4[2], k4[3], 0.0, 0.0], jnp.float32)

    N = obj.shape[0]
    view_idx = jnp.repeat(jnp.arange(V), N)
    obj_rep = jnp.tile(obj, (V, 1))
    uv_flat = uv.reshape(V * N, 2)

    def residual(flat):
        params = flat[:6]
        poses = flat[6:].reshape(V, 6)
        proj = _project_dist(params, poses, obj_rep, view_idx)
        return (proj - uv_flat).reshape(-1)

    flat = jnp.concatenate([params0, xi0.reshape(-1)])

    def lm_step(carry, _):
        flat, lam = carry
        r = residual(flat)
        J = jax.jacfwd(residual)(flat)
        A = J.T @ J + lam * jnp.eye(flat.shape[0], dtype=flat.dtype)
        g = J.T @ r
        step = -jnp.linalg.solve(A, g)
        new = flat + step
        better = jnp.sum(residual(new) ** 2) < jnp.sum(r**2)
        flat = jnp.where(better, new, flat)
        lam = jnp.clip(jnp.where(better, lam * 0.5, lam * 4.0), 1e-8, 1e3)
        return (flat, lam), None

    (flat, _), _ = jax.lax.scan(lm_step, (flat, jnp.float32(1e-3)), None, length=iters)

    params = np.asarray(flat[:6])
    poses = flat[6:].reshape(V, 6)
    proj = _project_dist(flat[:6], poses, obj_rep, view_idx)
    err = np.asarray(jnp.linalg.norm(proj - uv_flat, axis=-1)).reshape(V, N)
    per_view = err.mean(axis=1)
    mean_err = float(err.mean())

    K = np.array(
        [[params[0], 0, params[2]], [0, params[1], params[3]], [0, 0, 1]], dtype=np.float64
    )
    dist = np.array([params[4], params[5], 0.0, 0.0, 0.0], dtype=np.float64)
    return CalibrationResult(
        camera_matrix=K,
        dist_coeffs=dist,
        mean_reprojection_error=mean_err,
        per_view_errors=per_view,
        quality=CalibrationResult.rate(mean_err),
    )


def find_checkerboard_corners(images, cols: int = 10, rows: int = 7):
    """Corner frontend over grayscale images via OpenCV (optional dep).

    Returns (image_points list, ok flags). Mirrors calibrate.py:40-66
    (findChessboardCorners + cornerSubPix).
    """
    import cv2

    pts, oks = [], []
    criteria = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 0.001)
    for img in images:
        if img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        ok, corners = cv2.findChessboardCorners(img, (cols, rows), None)
        if ok:
            corners = cv2.cornerSubPix(img, corners, (11, 11), (-1, -1), criteria)
            pts.append(corners[:, 0, :])
        oks.append(bool(ok))
    return pts, oks
