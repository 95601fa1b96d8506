"""Calibration tests: synthetic boards with known intrinsics, cv2 oracle."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from aprilslam_tpu.calib import (
    board_points,
    homography_dlt,
    calibrate_camera,
    CalibrationResult,
)
from aprilslam_tpu.geometry import se3_exp


@pytest.fixture(scope="module")
def synthetic_views():
    """Render a 10x7 checkerboard through known intrinsics + distortion."""
    rng = np.random.default_rng(11)
    K_true = np.array([[820.0, 0, 315.0], [0, 825.0, 245.0], [0, 0, 1]])
    k1, k2 = -0.12, 0.035
    obj = board_points(10, 7, 25.0)
    views = []
    poses = []
    while len(views) < 8:
        xi = np.r_[rng.normal(scale=0.25, size=3), rng.normal(scale=40, size=2), 0]
        T = np.array(se3_exp(jnp.asarray(xi)))
        T[:3, 3] += [0, 0, rng.uniform(420, 700)]
        p = obj @ T[:3, :3].T + T[:3, 3]
        if p[:, 2].min() < 50:
            continue
        xy = p[:, :2] / p[:, 2:3]
        r2 = np.sum(xy**2, axis=-1, keepdims=True)
        xyd = xy * (1 + k1 * r2 + k2 * r2**2)
        uv = np.stack([K_true[0, 0] * xyd[:, 0] + K_true[0, 2],
                       K_true[1, 1] * xyd[:, 1] + K_true[1, 2]], axis=-1)
        if uv.min() < 5 or uv[:, 0].max() > 635 or uv[:, 1].max() > 475:
            continue
        views.append(uv.astype(np.float32))
        poses.append(T)
    return K_true, (k1, k2), obj, views


class TestHomography:
    def test_dlt_exact(self, synthetic_views):
        K_true, _, obj, views = synthetic_views
        # build an undistorted view for exactness
        T = np.eye(4)
        T[:3, 3] = [0, 0, 500]
        p = obj @ T[:3, :3].T + T[:3, 3]
        uv = (p[:, :2] / p[:, 2:3]) @ np.diag([K_true[0, 0], K_true[1, 1]]) + [K_true[0, 2], K_true[1, 2]]
        H = np.asarray(homography_dlt(jnp.asarray(obj[:, :2]), jnp.asarray(uv.astype(np.float32))))
        ph = np.concatenate([obj[:, :2], np.ones((len(obj), 1))], axis=-1) @ H.T
        reproj = ph[:, :2] / ph[:, 2:3]
        assert np.abs(reproj - uv).max() < 0.05


class TestCalibration:
    def test_recovers_intrinsics(self, synthetic_views):
        K_true, (k1, k2), obj, views = synthetic_views
        res = calibrate_camera(obj, views, iters=40)
        assert res.mean_reprojection_error < 0.1, res.mean_reprojection_error
        assert abs(res.camera_matrix[0, 0] - K_true[0, 0]) < 4.0
        assert abs(res.camera_matrix[1, 1] - K_true[1, 1]) < 4.0
        assert abs(res.camera_matrix[0, 2] - K_true[0, 2]) < 4.0
        assert abs(res.camera_matrix[1, 2] - K_true[1, 2]) < 4.0
        assert abs(res.dist_coeffs[0] - k1) < 0.02
        assert abs(res.dist_coeffs[1] - k2) < 0.03

    def test_comparable_to_cv2(self, synthetic_views):
        K_true, _, obj, views = synthetic_views
        res = calibrate_camera(obj, views, iters=40)
        objs = [obj.astype(np.float32)] * len(views)
        imgs = [v[:, None, :].astype(np.float32) for v in views]
        rms, K_cv, dist_cv, _, _ = cv2.calibrateCamera(objs, imgs, (640, 480), None, None)
        # both near truth; ours should not be much worse than cv2
        assert abs(res.camera_matrix[0, 0] - K_cv[0, 0]) < 8.0
        assert res.mean_reprojection_error < max(2 * rms, 0.15)

    def test_quality_gates(self):
        assert CalibrationResult.rate(0.3) == "Excellent"
        assert CalibrationResult.rate(0.7) == "Good"
        assert CalibrationResult.rate(1.5) == "Acceptable"
        assert CalibrationResult.rate(3.0) == "Poor"

    def test_npz_roundtrip(self, synthetic_views, tmp_path):
        K_true, _, obj, views = synthetic_views
        res = calibrate_camera(obj, views, iters=10)
        p = str(tmp_path / "calib.npz")
        res.save_npz(p)
        z = np.load(p)
        assert z["camera_matrix"].shape == (3, 3)
        assert z["dist_coeffs"].shape[1] == 5
