"""Golden tests for the geometry core against numpy/cv2 oracles.

The oracles are independent re-derivations of the reference formulas
(ground_truth.py:214-272, camera_controller.py:163-194, tag_detector.py:45-68),
not imports from the reference.
"""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aprilslam_tpu.geometry import (
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    se3_inverse,
    make_se3,
    euler_zyx_to_matrix,
    matrix_to_euler_zyx,
    camera_euler_to_matrix,
    pose_error,
    project_to_so3,
    PinholeCamera,
    project,
    unproject,
    tag_object_corners,
)


def random_rvecs(rng, n, max_angle=3.0):
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    return axis * angles


class TestSO3:
    def test_exp_matches_cv2_rodrigues(self, rng):
        rvecs = random_rvecs(rng, 64)
        R_jax = np.asarray(so3_exp(jnp.asarray(rvecs, dtype=jnp.float64)))
        for i in range(len(rvecs)):
            R_cv, _ = cv2.Rodrigues(rvecs[i])
            np.testing.assert_allclose(R_jax[i], R_cv, atol=1e-6)

    def test_exp_small_angle(self):
        w = jnp.asarray([[1e-10, 0.0, 0.0], [0.0, 0.0, 0.0]])
        R = so3_exp(w)
        np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(2, 0), atol=1e-6)

    def test_log_roundtrip(self, rng):
        rvecs = random_rvecs(rng, 64, max_angle=3.1)
        R = so3_exp(jnp.asarray(rvecs, dtype=jnp.float64))
        w = so3_log(R)
        R2 = so3_exp(w)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)

    def test_log_near_pi(self):
        w = jnp.asarray([[np.pi - 1e-5, 0.0, 0.0]], dtype=jnp.float64)
        R = so3_exp(w)
        w2 = so3_log(R)
        np.testing.assert_allclose(np.asarray(so3_exp(w2)), np.asarray(R), atol=1e-5)


class TestSE3:
    def test_inverse(self, rng):
        rvecs = random_rvecs(rng, 16)
        t = rng.normal(size=(16, 3))
        T = make_se3(so3_exp(jnp.asarray(rvecs)), jnp.asarray(t, dtype=jnp.float32))
        TI = se3_inverse(T) @ T
        np.testing.assert_allclose(np.asarray(TI), np.eye(4)[None].repeat(16, 0), atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 6)) * 0.8, dtype=jnp.float64)
        T = se3_exp(xi)
        xi2 = se3_log(T)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-6)

    def test_identity(self):
        T = se3_exp(jnp.zeros((6,)))
        np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)


class TestEuler:
    def test_zyx_matches_reference_formula(self, rng):
        """Oracle: Rz @ Ry @ Rx built from scratch in numpy (ground_truth.py:241-272)."""
        eulers = rng.uniform(-80, 80, size=(32, 3))
        R_jax = np.asarray(euler_zyx_to_matrix(jnp.asarray(eulers, dtype=jnp.float64)))
        for e, R in zip(eulers, R_jax):
            roll, pitch, yaw = np.radians(e)
            Rx = np.array([[1, 0, 0], [0, np.cos(roll), -np.sin(roll)], [0, np.sin(roll), np.cos(roll)]])
            Ry = np.array([[np.cos(pitch), 0, np.sin(pitch)], [0, 1, 0], [-np.sin(pitch), 0, np.cos(pitch)]])
            Rz = np.array([[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
            np.testing.assert_allclose(R, Rz @ Ry @ Rx, atol=1e-9)

    def test_euler_roundtrip(self, rng):
        eulers = rng.uniform(-80, 80, size=(32, 3))
        R = euler_zyx_to_matrix(jnp.asarray(eulers, dtype=jnp.float64))
        back = np.degrees(np.asarray(matrix_to_euler_zyx(R)))
        np.testing.assert_allclose(back, eulers, atol=1e-5)

    def test_camera_convention(self, rng):
        """Oracle: Ry @ Rx @ Rz from camera_controller.py:163-194."""
        rots = rng.uniform(-80, 80, size=(16, 3))
        R_jax = np.asarray(camera_euler_to_matrix(jnp.asarray(rots, dtype=jnp.float64)))
        for e, R in zip(rots, R_jax):
            p, y, r = np.radians(e)
            Rx = np.array([[1, 0, 0], [0, np.cos(p), -np.sin(p)], [0, np.sin(p), np.cos(p)]])
            Ry = np.array([[np.cos(y), 0, np.sin(y)], [0, 1, 0], [-np.sin(y), 0, np.cos(y)]])
            Rz = np.array([[np.cos(r), -np.sin(r), 0], [np.sin(r), np.cos(r), 0], [0, 0, 1]])
            np.testing.assert_allclose(R, Ry @ Rx @ Rz, atol=1e-9)


class TestCamera:
    def test_intrinsics_from_fov(self):
        cam = PinholeCamera.from_fov(1000, 1000, 45.0)
        # fx = fy = 0.5*1000/tan(22.5deg)  (simulation_engine.py:124-134)
        expected = 0.5 * 1000 / np.tan(np.radians(22.5))
        assert abs(cam.fx - expected) < 1e-3
        assert cam.cx == 500.0 and cam.cy == 500.0

    def test_project_unproject(self, rng):
        cam = PinholeCamera.from_fov(640, 480, 60.0)
        pts = rng.uniform(-1, 1, size=(50, 3)) + np.array([0, 0, 5.0])
        K = jnp.asarray(cam.matrix)
        uv = project(jnp.asarray(pts, dtype=jnp.float32), K)
        rays = unproject(uv, jnp.asarray(cam.inv_matrix))
        recon = np.asarray(rays) * pts[:, 2:3]
        np.testing.assert_allclose(recon, pts, rtol=1e-4, atol=1e-3)

    def test_project_matches_cv2(self, rng):
        cam = PinholeCamera.from_fov(1000, 1000, 45.0)
        pts = rng.uniform(-10, 10, size=(20, 3)) + np.array([0, 0, 50.0])
        uv = np.asarray(project(jnp.asarray(pts, dtype=jnp.float64), jnp.asarray(cam.matrix, dtype=jnp.float64)))
        uv_cv, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), cam.matrix.astype(np.float64), None)
        np.testing.assert_allclose(uv, uv_cv[:, 0, :], atol=1e-3)

    def test_tag_corners_order(self):
        c = np.asarray(tag_object_corners(0.06))
        # lb, rb, rt, lt per tag_detector.py:35-38
        np.testing.assert_allclose(
            c,
            [[-0.03, -0.03, 0], [0.03, -0.03, 0], [0.03, 0.03, 0], [-0.03, 0.03, 0]],
            atol=1e-7,
        )


class TestMetrics:
    def test_pose_error_matches_reference_def(self, rng):
        A = np.asarray(se3_exp(jnp.asarray(rng.normal(size=(6,)) * 0.3)))
        B = np.asarray(se3_exp(jnp.asarray(rng.normal(size=(6,)) * 0.3)))
        t_err, r_err = pose_error(jnp.asarray(A), jnp.asarray(B))
        assert abs(float(t_err) - np.linalg.norm(A[:3, 3] - B[:3, 3])) < 1e-5
        assert abs(float(r_err) - np.linalg.norm(A[:3, :3] - B[:3, :3], "fro")) < 1e-5

    def test_project_to_so3(self, rng):
        M = np.asarray(so3_exp(jnp.asarray(rng.normal(size=(3,))))) + rng.normal(size=(3, 3)) * 0.05
        R = np.asarray(project_to_so3(jnp.asarray(M)))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0.99


class TestLogMapDerivatives:
    """jacfwd/jacrev of the log maps must be finite AT the branch points.
    arccos/norm have infinite derivatives at cos=+-1 / skew=0; a where()
    only blocks NaN from the unselected branch's TANGENT, not 0*inf formed
    inside the selected expression. This silently zeroed every PGO update
    on graphs whose odometry edges had bit-exact zero residuals (round-3
    root cause of 'optimizer does nothing')."""

    def test_se3_log_jacfwd_finite_at_identity(self):
        import jax

        J = jax.jacfwd(se3_log)(jnp.eye(4))
        assert np.isfinite(np.asarray(J)).all()

    def test_se3_log_jacfwd_finite_near_identity(self):
        import jax

        for scale in (1e-9, 1e-6, 1e-3, 1e-1):
            T = np.asarray(se3_exp(jnp.asarray([1.0, -2.0, 0.5, 3.0, 0.1, -1.0]) * scale))
            J = jax.jacfwd(se3_log)(jnp.asarray(T, jnp.float32))
            assert np.isfinite(np.asarray(J)).all(), scale

    def test_se3_log_jacfwd_finite_near_pi(self):
        import jax

        w = jnp.asarray([np.pi - 1e-5, 0.0, 0.0, 0.2, 0.0, 0.0], jnp.float32)
        T = se3_exp(w)
        J = jax.jacfwd(se3_log)(T)
        assert np.isfinite(np.asarray(J)).all()

    def test_composed_residual_grad_finite_at_zero(self):
        """The PGO residual pattern: d/dxi log(inv(Tm) @ inv(exp(xi) Ti) @ Tj)
        at xi=0 with Tm exactly equal to inv(Ti) Tj (zero residual)."""
        import jax

        Ti = se3_exp(jnp.asarray([0.1, 0.2, -0.1, 5.0, -3.0, 1.0], jnp.float32))
        Tj = se3_exp(jnp.asarray([-0.2, 0.1, 0.3, 1.0, 4.0, -2.0], jnp.float32))
        Tm = se3_inverse(Ti) @ Tj

        def res(xi):
            return se3_log(se3_inverse(Tm) @ se3_inverse(se3_exp(xi) @ Ti) @ Tj)

        J = jax.jacfwd(res)(jnp.zeros(6, jnp.float32))
        assert np.isfinite(np.asarray(J)).all()
