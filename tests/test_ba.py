"""Bundle adjustment tests: synthetic convergence + noise robustness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aprilslam_tpu.geometry import (
    PinholeCamera,
    se3_exp,
    se3_inverse,
    tag_object_corners,
)
from aprilslam_tpu.slam.ba import ba_init, ba_add_frame, ba_optimize, ba_cost, latest_pose


@pytest.fixture(scope="module")
def world():
    """Synthetic world: 6 tags on a rough plane, camera arc, exact corners."""
    rng = np.random.default_rng(5)
    cam = PinholeCamera.from_fov(800, 800, 50.0)
    M = 8
    tag_size = 10.0
    tag_pos = np.array(
        [[0, 0, 0], [25, 3, -4], [-22, -4, 3], [10, 20, 2], [-12, 18, -3], [30, -15, 5]],
        dtype=np.float64,
    )
    tags = []
    for i, p in enumerate(tag_pos):
        w = np.array(se3_exp(jnp.asarray(np.r_[rng.normal(scale=0.08, size=3), 0, 0, 0])))
        w[:3, 3] = p
        tags.append(w)
    T_wt = np.stack(tags)  # tag -> world

    # Camera poses looking at the scene from z = +60 (world z toward camera).
    n_frames = 8
    cams = []
    for k in range(n_frames):
        c = np.eye(4)
        c[:3, :3] = np.diag([1.0, -1.0, -1.0])  # look down -z_world, CV frame
        c[:3, 3] = [k * 4.0 - 14.0, k * 1.0 - 4.0, 60.0 + 3 * np.sin(k)]
        cams.append(c)
    T_wc = np.stack(cams)  # camera -> world

    obj = np.asarray(tag_object_corners(tag_size, dtype=jnp.float64))

    def project(T_wc_i, T_wt_j):
        T_ct = np.linalg.inv(T_wc_i) @ T_wt_j
        p = obj @ T_ct[:3, :3].T + T_ct[:3, 3]
        uv = p[:, :2] / p[:, 2:3]
        K = cam.matrix
        return np.stack([K[0, 0] * uv[:, 0] + K[0, 2], K[1, 1] * uv[:, 1] + K[1, 2]], axis=-1), p[:, 2].min()

    return cam, tag_size, T_wt, T_wc, project


def build_state(world, noise=0.0, pose_noise=0.0, seed=0):
    cam, tag_size, T_wt, T_wc, project = world
    rng = np.random.default_rng(seed)
    st = ba_init(n_keyframes=8, n_landmarks=8, n_obs=128)
    for k in range(len(T_wc)):
        ids, corners = [], []
        for j in range(len(T_wt)):
            uv, zmin = project(T_wc[k], T_wt[j])
            if zmin < 1.0 or uv.min() < 5 or uv.max() > 795:
                continue
            ids.append(j)
            corners.append(uv + rng.normal(scale=noise, size=uv.shape))
        D = 8
        ids_a = np.full((D,), -1, np.int32)
        cor_a = np.zeros((D, 4, 2), np.float32)
        ok_a = np.zeros((D,), bool)
        ids_a[: len(ids)] = ids
        cor_a[: len(ids)] = np.stack(corners) if corners else 0
        ok_a[: len(ids)] = True
        # init with noisy camera pose
        xi = rng.normal(scale=pose_noise, size=6)
        T_init = np.asarray(se3_exp(jnp.asarray(xi))) @ T_wc[k]
        # per-detection PnP poses: T_cam_tag = inv(T_wc) @ T_wt (+noise)
        T_ct = np.zeros((D, 4, 4), np.float32)
        for i, j in enumerate(ids):
            T_ct[i] = np.linalg.inv(T_init) @ T_wt[j]
        st = ba_add_frame(
            st,
            jnp.asarray(ids_a),
            jnp.asarray(cor_a),
            jnp.asarray(ok_a),
            jnp.asarray(T_init.astype(np.float32)),
            jnp.asarray(T_ct),
        )
    return st


class TestBA:
    def test_zero_noise_zero_cost(self, world):
        cam, tag_size, T_wt, T_wc, project = world
        st = build_state(world, noise=0.0, pose_noise=0.0)
        c0 = float(ba_cost(st, jnp.asarray(cam.matrix), tag_size))
        assert c0 < 1e-4, c0

    def test_optimize_reduces_cost(self, world):
        cam, tag_size, T_wt, T_wc, project = world
        st = build_state(world, noise=0.5, pose_noise=0.02)
        K = jnp.asarray(cam.matrix)
        c0 = float(ba_cost(st, K, tag_size))
        st2 = ba_optimize(st, K, tag_size, iters=10)
        c1 = float(ba_cost(st2, K, tag_size))
        assert c1 < c0 * 0.5, (c0, c1)

    def test_recovers_geometry(self, world):
        """Perturbed init + noiseless corners: BA must recover the true
        relative geometry (up to the anchor gauge)."""
        cam, tag_size, T_wt, T_wc, project = world
        st = build_state(world, noise=0.0, pose_noise=0.03)
        K = jnp.asarray(cam.matrix)
        st2 = ba_optimize(st, K, tag_size, iters=12)
        c1 = float(ba_cost(st2, K, tag_size))
        n_obs = int(np.asarray(st2.obs_ok).sum())
        rms = np.sqrt(c1 / (8 * n_obs))
        assert rms < 0.05, rms
        # relative landmark geometry: distances between tags in world frame
        lm = np.asarray(st2.lm_pose)
        act = np.asarray(st2.lm_active)
        for i in range(6):
            for j in range(i + 1, 6):
                if act[i] and act[j]:
                    d_est = np.linalg.norm(lm[i][:3, 3] - lm[j][:3, 3])
                    d_true = np.linalg.norm(T_wt[i][:3, 3] - T_wt[j][:3, 3])
                    assert abs(d_est - d_true) < 0.05, (i, j, d_est, d_true)

    def test_anchor_relative_map_converges(self, world):
        # The gauge is free (Marquardt damping absorbs the null space);
        # the invariant consumers rely on is the ANCHOR-RELATIVE map:
        # conjugating by the refined anchor pose must cancel any gauge
        # drift and match the true tag layout (slam/ba.py gauge note).
        cam, tag_size, T_wt, T_wc, project = world
        st = build_state(world, noise=0.3, pose_noise=0.02)
        anchor = int(st.anchor)
        st2 = ba_optimize(st, jnp.asarray(cam.matrix), tag_size, iters=12)
        lm = np.asarray(st2.lm_pose)
        act = np.asarray(st2.lm_active)
        rel_est = np.linalg.inv(lm[anchor])[None] @ lm
        rel_gt = np.linalg.inv(T_wt[anchor])[None] @ T_wt
        for i in range(len(T_wt)):
            if act[i]:
                err = np.linalg.norm(rel_est[i][:3, 3] - rel_gt[i][:3, 3])
                assert err < 0.5, (i, err)

    def test_keyframe_ring_recycles(self, world):
        cam, tag_size, T_wt, T_wc, project = world
        st = build_state(world)  # 8 frames fill the 8-slot window
        # add one more frame -> oldest slot recycled, its obs dropped
        st2 = ba_add_frame(
            st,
            jnp.asarray([0, -1, -1, -1, -1, -1, -1, -1], jnp.int32),
            jnp.zeros((8, 4, 2)),
            jnp.asarray([True] + [False] * 7),
            jnp.eye(4),
            jnp.broadcast_to(jnp.eye(4), (8, 4, 4)),
        )
        assert int(st2.kf_ptr) == 9
        slot = 8 % 8
        assert not bool(np.asarray(st2.obs_ok)[np.asarray(st2.obs_kf) == slot][:0].any() if False else False)
        # all obs pointing at recycled slot 0 are either new (from this frame) or dropped
        obs_kf = np.asarray(st2.obs_kf)
        obs_ok = np.asarray(st2.obs_ok)
        # frame count with slot 0 active obs should be exactly the new frame's 1
        assert obs_ok[obs_kf == slot].sum() == 1

    def test_latest_pose(self, world):
        st = build_state(world)
        cam, tag_size, T_wt, T_wc, project = world
        lp = np.asarray(latest_pose(st))
        np.testing.assert_allclose(lp, T_wc[-1], atol=0.2)
