"""Multi-device tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aprilslam_tpu.parallel import (
    make_mesh,
    build_distributed_ba,
    shard_observations_by_owner,
    build_parallel_slam,
)
from aprilslam_tpu.slam.ba import ba_cost, ba_optimize
from aprilslam_tpu.geometry import PinholeCamera

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_ba import world, build_state  # noqa: E402  (fixtures)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8, axis="lm")


class TestDistributedBA:
    def test_matches_single_device_cost(self, world, mesh8):
        """Sharded LM-BA must reduce cost like the single-device solver."""
        cam, tag_size, T_wt, T_wc, project = world
        st = build_state(world, noise=0.5, pose_noise=0.02)
        K = jnp.asarray(cam.matrix)
        c0 = float(ba_cost(st, K, tag_size))

        st_sh = shard_observations_by_owner(st, 8)
        c0_sh = float(ba_cost(st_sh, K, tag_size))
        assert abs(c0_sh - c0) / c0 < 1e-3  # same obs, reordered

        run = build_distributed_ba(
            mesh8, st.n_keyframes, st.n_landmarks, st.n_obs_capacity,
            tag_size, iters=10,
        )
        st2, cost = run(st_sh, K)
        c1 = float(ba_cost(st2, K, tag_size))
        assert c1 < 0.5 * c0, (c0, c1)

        # single-device reference
        st_ref = ba_optimize(st, K, tag_size, iters=10)
        c_ref = float(ba_cost(st_ref, K, tag_size))
        # distributed should land in the same cost ballpark
        assert c1 < 4 * max(c_ref, 1e-3) + 1.0, (c1, c_ref)

    def test_shard_observation_grouping(self, world):
        st = build_state(world)
        st_sh = shard_observations_by_owner(st, 8)
        M = st.n_landmarks
        per = st.n_obs_capacity // 8
        lm = np.asarray(st_sh.obs_lm)
        ok = np.asarray(st_sh.obs_ok)
        for s in range(8):
            blk = lm[s * per : (s + 1) * per][ok[s * per : (s + 1) * per]]
            if len(blk):
                owners = blk // (M // 8)
                assert np.all(owners == s)


class TestParallelSequences:
    def test_independent_sequences(self):
        from aprilslam_tpu.sim import SceneConfig, scene_tensors, render_frames, trajectory
        from aprilslam_tpu.detect import DetectorParams

        mesh = make_mesh(8, axis="data")
        cfg = SceneConfig.from_file()
        cam = PinholeCamera.from_fov(128, 128, cfg.fov_y)
        scene = scene_tensors(cfg)

        S, B = 8, 2
        pos = np.zeros((S, B, 3), np.float32)
        rot = np.zeros((S, B, 3), np.float32)
        for s in range(S):
            tr = trajectory.scripted_line(B, np.array([s * 1.0, 0, 22.0]), np.array([s * 1.0 + 2, 0, 15.0]))
            pos[s] = tr.positions
            rot[s] = tr.rotations
        frames = np.stack([
            np.asarray(render_frames(scene, jnp.asarray(pos[s]), jnp.asarray(rot[s]),
                                     jnp.asarray(cam.inv_matrix), 128, 128, 1))
            for s in range(S)
        ])

        pstep, init_states, shard = build_parallel_slam(
            mesh, cfg.family, cam, cfg.tag_size_inner,
            detector_params=DetectorParams(quad_decimate=1, max_quads=16,
                                           max_detections=8, max_clusters=64,
                                           pts_per_quad=64, min_cluster_pts=8,
                                           min_side=2.0),
            estimator="chain_avg",
            graph_capacity=16,
        )
        states = init_states()
        states, outs = pstep(states, shard(jnp.asarray(frames)))
        n_nodes = np.asarray(outs.n_nodes)  # (S, B)
        assert n_nodes.shape == (S, B)
        # every sequence mapped at least one tag on its last frame
        assert (n_nodes[:, -1] >= 1).all(), n_nodes
        valid = np.asarray(outs.valid)
        assert valid.any(axis=1).all()
