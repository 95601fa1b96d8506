"""Keyframe-axis sharded BA: one long trajectory partitioned across devices.

SURVEY §5 long-context row: the reference's frame stream
(/root/reference/src/simulation/simulation_engine.py:161-184) has O(1) state
and cannot outgrow one host; here a single dead-reckoned trajectory is
split into contiguous windows over the mesh's ``kf`` axis, seam odometry
factors cross via ppermute, and the landmark coupling via psum.

The VERDICT round-2 done-criterion for this feature: a multi-device CPU test
showing COST PARITY with a single-device solve of the same problem.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aprilslam_tpu.parallel import (
    make_mesh,
    build_keyframe_ba,
    keyframe_ba_cost,
    synthesize_trajectory_problem,
)


def _ate_rmse(est, gt):
    e = est[:, :3, 3] - gt[:, :3, 3]
    return float(np.sqrt(np.mean(np.sum(e * e, axis=-1))))


@pytest.fixture(scope="module")
def problem():
    # 256 keyframes, 16 tags, 4 obs/kf; odometry noise integrates into a
    # drifted initial trajectory (ATE of the init is several units).
    prob, kf_gt, Kmat = synthesize_trajectory_problem(
        n_keyframes=256, n_landmarks=16, n_shards=8, seed=3
    )
    return prob, kf_gt, Kmat


class TestKeyframeShardedBA:
    @pytest.mark.slow
    def test_multi_device_cost_parity_with_single_device(self, problem):
        prob, kf_gt, Kmat = problem
        K, M = prob.n_keyframes, prob.n_landmarks
        O = int(prob.obs_kf.shape[0])
        tag_size = 10.0

        c0 = float(keyframe_ba_cost(prob, Kmat, tag_size))

        run1 = build_keyframe_ba(
            make_mesh(1, axis="kf"), K, M, O, tag_size, iters=6, cg_iters=24
        )
        p1, _ = run1(prob, Kmat)
        c1 = float(keyframe_ba_cost(p1, Kmat, tag_size))

        run8 = build_keyframe_ba(
            make_mesh(8, axis="kf"), K, M, O, tag_size, iters=6, cg_iters=24
        )
        p8, _ = run8(prob, Kmat)
        c8 = float(keyframe_ba_cost(p8, Kmat, tag_size))

        # Both converge far below the drifted initial cost...
        assert c1 < 0.05 * c0, (c0, c1)
        assert c8 < 0.05 * c0, (c0, c8)
        # ...and the 8-way sharded solve matches the single-device solve on
        # the same problem (identical algorithm; only summation order and
        # seam relinearization differ).
        assert abs(c8 - c1) <= 0.05 * max(c1, 1.0), (c1, c8)

    def test_sharded_solve_removes_dead_reckoning_drift(self, problem):
        prob, kf_gt, Kmat = problem
        K, M = prob.n_keyframes, prob.n_landmarks
        O = int(prob.obs_kf.shape[0])

        ate_init = _ate_rmse(np.asarray(prob.kf_pose), kf_gt)
        run8 = build_keyframe_ba(
            make_mesh(8, axis="kf"), K, M, O, 10.0, iters=6, cg_iters=24
        )
        p8, _ = run8(prob, Kmat)
        est = np.asarray(p8.kf_pose)
        assert np.isfinite(est).all()
        ate_opt = _ate_rmse(est, kf_gt)
        # The init drifts by integrated odometry noise; BA pins the
        # trajectory back onto the landmark observations.
        assert ate_init > 0.5, ate_init
        assert ate_opt < 0.3 * ate_init, (ate_init, ate_opt)
        # Statistical floor of this geometry (0.3 px corners at 130 units
        # depth -> ~0.4-unit depth sigma per tag observation).
        assert ate_opt < 0.5, ate_opt

    def test_gauge_keyframe_pinned(self, problem):
        prob, _, Kmat = problem
        K, M = prob.n_keyframes, prob.n_landmarks
        O = int(prob.obs_kf.shape[0])
        run8 = build_keyframe_ba(
            make_mesh(8, axis="kf"), K, M, O, 10.0, iters=4, cg_iters=16
        )
        p8, _ = run8(prob, Kmat)
        d0 = np.asarray(p8.kf_pose[0]) - np.asarray(prob.kf_pose[0])
        # Keyframe 0 carries the gauge prior: it must not move measurably.
        assert np.abs(d0).max() < 1e-3, np.abs(d0).max()


class TestLongTrajectory:
    @pytest.mark.slow
    def test_1k_keyframes_converges_sharded(self):
        # The scale target from the VERDICT: >=1k keyframes on the mesh.
        # The dead-reckoned init drifts ~10 units; the dominant error is a
        # LOW-FREQUENCY bend (integrated rotational odometry noise lever-
        # arming over the sweep), which is exactly what needs deep CG to
        # traverse the whole trajectory — 128 iterations collapse it to
        # ~0.2 units (53x), shallow CG visibly does not (still ~4 at 24).
        prob, kf_gt, Kmat = synthesize_trajectory_problem(
            n_keyframes=1024, n_landmarks=64, n_shards=8, obs_per_kf=6, seed=7
        )
        K, M = prob.n_keyframes, prob.n_landmarks
        O = int(prob.obs_kf.shape[0])
        c0 = float(keyframe_ba_cost(prob, Kmat, 10.0))
        run = build_keyframe_ba(
            make_mesh(8, axis="kf"), K, M, O, 10.0,
            iters=24, cg_iters=128, damping=1e-4,
        )
        p, _ = run(prob, Kmat)
        c = float(keyframe_ba_cost(p, Kmat, 10.0))
        assert np.isfinite(np.asarray(p.kf_pose)).all()
        assert c < 0.05 * c0, (c0, c)
        ate_init = _ate_rmse(np.asarray(prob.kf_pose), kf_gt)
        ate_opt = _ate_rmse(np.asarray(p.kf_pose), kf_gt)
        assert ate_init > 5.0, ate_init
        assert ate_opt < 0.1 * ate_init, (ate_init, ate_opt)
        assert ate_opt < 0.5, ate_opt
