"""Pose observability (localization confidence) — slam/localize.py.

The headline ATE tail is ~10 single-visible-tag frames where the planar
tilt continuum leaves the reprojection rms tiny while the pose slides
scene units (docs/PERFORMANCE.md). `pose_observability` is the per-frame
confidence scalar that separates those frames: the smallest singular
value of the 6-dof localization Jacobian. These tests pin its analytic
behavior without any rendering.
"""

import jax.numpy as jnp
import numpy as np

from aprilslam_tpu.slam.localize import joint_camera_pose, pose_observability


F = 1200.0
K = jnp.asarray([[F, 0.0, 500.0], [0.0, F, 500.0], [0.0, 0.0, 1.0]])
TAG = 5.0


def _pose(t, R=None):
    T = np.eye(4)
    if R is not None:
        T[:3, :3] = R
    T[:3, 3] = t
    return jnp.asarray(T)


def _map(positions):
    M = np.tile(np.eye(4), (len(positions), 1, 1))
    for i, p in enumerate(positions):
        M[i, :3, 3] = p
    return jnp.asarray(M)


class TestPoseObservability:
    def test_single_frontal_distant_tag_is_weak(self):
        """One frontal tag at distance vs two separated tags: the
        single-tag sigma_min collapses (the tilt/lateral-arc continuum),
        the two-tag geometry is well conditioned."""
        world = _map([[0, 0, 0], [30, 0, 0]])
        cam = _pose([0, 0, -100.0])  # frontal, z=100 in front of tag 0
        s1 = float(pose_observability(
            world, jnp.asarray([True, False]), K, TAG, cam))
        s2 = float(pose_observability(
            world, jnp.asarray([True, True]), K, TAG, cam))
        assert s1 > 0.0
        assert s2 > 4.0 * s1, (s1, s2)

    def test_closer_tag_is_better_conditioned(self):
        world = _map([[0, 0, 0]])
        use = jnp.asarray([True])
        far = float(pose_observability(world, use, K, TAG, _pose([0, 0, -120.0])))
        near = float(pose_observability(world, use, K, TAG, _pose([0, 0, -40.0])))
        assert near > 2.0 * far, (near, far)

    def test_no_used_landmarks_is_zero(self):
        world = _map([[0, 0, 0]])
        s = float(pose_observability(
            world, jnp.asarray([False]), K, TAG, _pose([0, 0, -50.0])))
        assert s == 0.0

    def test_weak_direction_matches_large_error_at_tiny_rms(self):
        """The failure mode itself: perturb the single-tag camera pose along
        a lateral arc around the tag. The reprojection rms moves by less
        than a tenth of a pixel while the position error is ~1 su —
        exactly why rms cannot gate these frames and sigma_min can."""
        world = _map([[0, 0, 0]])
        use = jnp.asarray([True])
        z = 100.0
        cam = _pose([0, 0, -z])
        # Observed corners: exact projection from the true pose.
        from aprilslam_tpu.geometry import se3_inverse, tag_object_corners

        obj = tag_object_corners(TAG)
        T_cw = se3_inverse(cam)
        Xc = obj @ T_cw[:3, :3].T + T_cw[:3, 3]
        uv = jnp.stack(
            [F * Xc[:, 0] / Xc[:, 2] + 500.0, F * Xc[:, 1] / Xc[:, 2] + 500.0],
            axis=-1,
        )
        corners = jnp.zeros((1, 4, 2)).at[0].set(uv)

        # Arc: rotate the camera position ~0.6 deg around the tag's y-axis
        # while keeping the optical axis pointed at the tag (tilt trade).
        th = np.radians(0.6)
        Ry = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
        )
        cam_arc = _pose(Ry @ np.array([0, 0, -z]), Ry)

        _, rms_true = joint_camera_pose(world, use, corners, K, TAG, cam, iters=0)
        _, rms_arc = joint_camera_pose(world, use, corners, K, TAG, cam_arc, iters=0)
        pos_err = float(np.linalg.norm(np.asarray(cam_arc)[:3, 3] - np.asarray(cam)[:3, 3]))
        assert pos_err > 0.8  # ~1 su of camera motion...
        assert float(rms_arc - rms_true) < 0.1  # ...under 0.1 px of rms
        # and sigma_min predicts it: the weak direction's pixel gain over
        # this 1 su step is on the same sub-pixel order.
        s = float(pose_observability(world, use, K, TAG, cam))
        assert s * pos_err < 5.0, (s, pos_err)
