"""Lens distortion end-to-end: model round-trip, cv2 oracle, distorted-render
detect -> undistort -> PnP recovery.

Closes the round-1 gap where (k1, k2) were calibrated and loaded but never
applied (reference tag_detector.py:41 passes dist_coeffs to cv2.solvePnP).
"""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from aprilslam_tpu.geometry import (
    PinholeCamera,
    distort_normalized,
    undistort_normalized,
    distort_pixels,
    undistort_pixels,
)
from aprilslam_tpu.detect import TagDetector, DetectorParams
from aprilslam_tpu.pose import poses_from_detections
from aprilslam_tpu.sim import (
    SceneConfig,
    scene_tensors,
    render_frames,
    camera_to_tag_transforms,
    degrade,
)

# A typical webcam barrel lens: radial + mild tangential.
DIST = np.array([-0.15, 0.03, 0.0008, -0.0005, 0.0], np.float32)


class TestDistortionModel:
    def test_round_trip(self, rng):
        xn = rng.uniform(-0.45, 0.45, size=(256, 2)).astype(np.float32)
        xd = distort_normalized(jnp.asarray(xn), jnp.asarray(DIST))
        back = undistort_normalized(xd, jnp.asarray(DIST))
        assert np.abs(np.asarray(back) - xn).max() < 1e-5

    def test_matches_cv2_undistort_points(self, rng):
        cam = PinholeCamera.from_fov(800, 800, 45.0)
        K = cam.matrix
        px = rng.uniform(60, 740, size=(128, 2)).astype(np.float32)
        ours = np.asarray(undistort_pixels(jnp.asarray(px), jnp.asarray(K), jnp.asarray(DIST)))
        ref = cv2.undistortPoints(
            px.reshape(-1, 1, 2).astype(np.float64),
            K.astype(np.float64),
            DIST.astype(np.float64),
            P=K.astype(np.float64),
        ).reshape(-1, 2)
        assert np.abs(ours - ref).max() < 1e-2  # px

    def test_distort_pixels_matches_cv2_project(self, rng):
        cam = PinholeCamera.from_fov(800, 800, 45.0)
        K = cam.matrix
        pts = np.concatenate(
            [rng.uniform(-3, 3, size=(64, 2)), rng.uniform(8, 20, size=(64, 1))], axis=1
        )
        ref, _ = cv2.projectPoints(
            pts, np.zeros(3), np.zeros(3), K.astype(np.float64), DIST.astype(np.float64)
        )
        ideal = pts[:, :2] / pts[:, 2:3]
        ideal_px = np.stack(
            [K[0, 0] * ideal[:, 0] + K[0, 2], K[1, 1] * ideal[:, 1] + K[1, 2]], axis=-1
        ).astype(np.float32)
        ours = np.asarray(distort_pixels(jnp.asarray(ideal_px), jnp.asarray(K), jnp.asarray(DIST)))
        assert np.abs(ours - ref.reshape(-1, 2)).max() < 1e-2


class TestDistortedRenderEndToEnd:
    def test_detect_undistort_pnp_recovers_pose(self):
        cfg = SceneConfig.from_file()
        cam = PinholeCamera.from_fov(800, 800, cfg.fov_y)
        scene = scene_tensors(cfg)
        pos = jnp.asarray([[0.0, 0.0, 10.0]], jnp.float32)
        rot = jnp.zeros((1, 3), jnp.float32)
        K = jnp.asarray(cam.matrix)
        clean = render_frames(scene, pos, rot, jnp.asarray(cam.inv_matrix), 800, 800, 2)
        warped = degrade.apply_lens_distortion(clean, K, jnp.asarray(DIST))

        det = TagDetector(cfg.family, DetectorParams(quad_decimate=1)).detect(warped)
        T_fix, ok_fix, rms_fix, _, _ = poses_from_detections(
            det, K, cfg.tag_size_inner, dist_coeffs=jnp.asarray(DIST)
        )
        T_raw, ok_raw, _, _, _ = poses_from_detections(det, K, cfg.tag_size_inner)
        T_fix, ok_fix = np.asarray(T_fix), np.asarray(ok_fix)
        T_raw, ok_raw = np.asarray(T_raw), np.asarray(ok_raw)
        assert ok_fix[0].sum() >= 2, "distorted frame should still detect tags"

        gt = np.asarray(
            camera_to_tag_transforms(
                jnp.asarray(cfg.tag_positions()), jnp.asarray(cfg.tag_rotations()), pos, rot
            )
        )[0]
        ids = np.asarray(det.ids)[0]
        tag_ids = cfg.tag_ids()
        fix_errs, raw_errs = [], []
        for d in range(det.max_detections):
            if not ok_fix[0, d]:
                continue
            t_idx = int(np.where(tag_ids == ids[d])[0][0])
            depth = gt[t_idx, 2, 3]
            e_fix = np.linalg.norm(T_fix[0, d, :3, 3] - gt[t_idx, :3, 3])
            fix_errs.append(e_fix / depth)
            # distortion-corrected pose must be accurate in absolute terms
            assert e_fix < max(0.35, 0.012 * depth), (ids[d], e_fix, depth)
            if ok_raw[0, d]:
                raw_errs.append(
                    np.linalg.norm(T_raw[0, d, :3, 3] - gt[t_idx, :3, 3]) / depth
                )
        # ...and undistorting must actually help vs feeding distorted corners
        # straight into the pinhole solver.
        assert np.mean(fix_errs) < 0.6 * max(np.mean(raw_errs), 1e-9) or np.mean(raw_errs) > 0.01, (
            np.mean(fix_errs),
            np.mean(raw_errs),
        )

    def test_degrade_is_identity_with_zero_coeffs(self):
        cfg = SceneConfig.from_file()
        cam = PinholeCamera.from_fov(320, 320, cfg.fov_y)
        scene = scene_tensors(cfg)
        pos = jnp.asarray([[0.0, 0.0, 10.0]], jnp.float32)
        rot = jnp.zeros((1, 3), jnp.float32)
        clean = render_frames(scene, pos, rot, jnp.asarray(cam.inv_matrix), 320, 320, 1)
        same = degrade.apply_lens_distortion(
            clean, jnp.asarray(cam.matrix), jnp.zeros(5, jnp.float32)
        )
        assert np.abs(np.asarray(same) - np.asarray(clean)).max() < 1e-5
