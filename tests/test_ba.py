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


class TestSparseSchur:
    """Sparse per-observation Schur assembly vs the dense (K,M,6,6) path."""

    def test_lm_obs_grid_groups_and_counts(self):
        from aprilslam_tpu.slam.ba import lm_obs_grid

        obs_lm = jnp.asarray([2, 0, 2, 1, 2, 0, 3, 3], jnp.int32)
        obs_ok = jnp.asarray([1, 1, 1, 1, 1, 0, 1, 1], bool)
        grid, overflow = lm_obs_grid(obs_lm, obs_ok, M=4, P=4)
        grid = np.asarray(grid)
        O = 8
        # every valid obs appears exactly once, under its landmark row
        seen = {}
        for m in range(4):
            for p in range(4):
                o = grid[m, p]
                if o < O:
                    assert int(obs_lm[o]) == m
                    assert bool(obs_ok[o])
                    seen[o] = m
        assert sorted(seen) == [0, 1, 2, 3, 4, 6, 7]
        assert int(overflow) == 0

    def test_lm_obs_grid_overflow(self):
        from aprilslam_tpu.slam.ba import lm_obs_grid

        obs_lm = jnp.zeros((6,), jnp.int32)  # all on landmark 0
        obs_ok = jnp.ones((6,), bool)
        grid, overflow = lm_obs_grid(obs_lm, obs_ok, M=2, P=4)
        assert int(overflow) == 2
        assert (np.asarray(grid)[0] < 6).sum() == 4

    def test_sparse_matches_dense(self, world):
        cam, tag_size, T_wt, T_wc, project = world
        st = build_state(world, noise=0.5, pose_noise=0.02)
        K = jnp.asarray(cam.matrix)
        st_d = ba_optimize(st, K, tag_size, iters=8, coupling="dense")
        st_s = ba_optimize(st, K, tag_size, iters=8, coupling="sparse")
        c_d = float(ba_cost(st_d, K, tag_size))
        c_s = float(ba_cost(st_s, K, tag_size))
        # identical math, different assembly: costs agree tightly
        assert abs(c_d - c_s) / max(c_d, 1e-6) < 1e-3, (c_d, c_s)
        np.testing.assert_allclose(
            np.asarray(st_s.kf_pose), np.asarray(st_d.kf_pose), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(st_s.lm_pose), np.asarray(st_d.lm_pose), atol=1e-3
        )

    def test_sparse_reduces_cost_big_map(self):
        """A map far beyond the dense regime: 512 landmarks, 16 keyframes."""
        from dataclasses import replace
        from aprilslam_tpu.geometry import tag_object_corners, se3_exp

        rng = np.random.default_rng(1)
        cam = PinholeCamera.from_fov(1000, 1000, 45.0)
        Kmat = jnp.asarray(cam.matrix)
        M, Kf, O = 512, 16, 2048
        tag_size = 10.0
        obj = np.asarray(tag_object_corners(tag_size))
        side = int(np.ceil(np.sqrt(M)))
        lm_pose = np.broadcast_to(np.eye(4, dtype=np.float32), (M, 4, 4)).copy()
        for m in range(M):
            lm_pose[m][:3, 3] = [(m % side) * 25.0, (m // side) * 25.0, 0.0]
        kf_pose = np.broadcast_to(np.eye(4, dtype=np.float32), (Kf, 4, 4)).copy()
        for k in range(Kf):
            kf_pose[k][:3, :3] = np.diag([1, -1, -1]).astype(np.float32)
            kf_pose[k][:3, 3] = [rng.uniform(0, side * 25), rng.uniform(0, side * 25), 140.0]
        obs_kf = np.zeros(O, np.int32)
        obs_lm = np.zeros(O, np.int32)
        obs_uv = np.zeros((O, 4, 2), np.float32)
        per_kf = O // Kf
        i = 0
        for k in range(Kf):
            d = np.linalg.norm(lm_pose[:, :3, 3] - kf_pose[k][:3, 3], axis=-1)
            for m in np.argsort(d)[:per_kf]:
                T_ct = np.linalg.inv(kf_pose[k]) @ lm_pose[m]
                p = obj @ T_ct[:3, :3].T + T_ct[:3, 3]
                uv = p[:, :2] / p[:, 2:3]
                Km = np.asarray(cam.matrix)
                obs_uv[i] = np.stack(
                    [Km[0, 0] * uv[:, 0] + Km[0, 2], Km[1, 1] * uv[:, 1] + Km[1, 2]], -1
                ) + rng.normal(scale=0.3, size=(4, 2))
                obs_kf[i], obs_lm[i] = k, m
                i += 1
        kf_noisy = np.stack([
            np.asarray(se3_exp(jnp.asarray(rng.normal(scale=0.01, size=6)))) @ kf_pose[k]
            for k in range(Kf)
        ]).astype(np.float32)
        lm_noisy = np.stack([
            np.asarray(se3_exp(jnp.asarray(rng.normal(scale=0.01, size=6)))) @ lm_pose[m]
            for m in range(M)
        ]).astype(np.float32)
        from aprilslam_tpu.slam.ba import ba_init
        st = replace(
            ba_init(Kf, M, O),
            kf_pose=jnp.asarray(kf_noisy), kf_active=jnp.ones((Kf,), bool),
            lm_pose=jnp.asarray(lm_noisy), lm_active=jnp.ones((M,), bool),
            obs_kf=jnp.asarray(obs_kf), obs_lm=jnp.asarray(obs_lm),
            obs_uv=jnp.asarray(obs_uv), obs_ok=jnp.asarray(np.arange(O) < i),
            anchor=jnp.int32(0), kf_ptr=jnp.int32(Kf),
        )
        c0 = float(ba_cost(st, Kmat, tag_size))
        # auto selects sparse here (K*M = 8192 > 4096); cap P at the true max
        st2 = ba_optimize(st, Kmat, tag_size, iters=6, max_obs_per_lm=16)
        c1 = float(ba_cost(st2, Kmat, tag_size))
        assert c1 < 0.2 * c0, (c0, c1)
