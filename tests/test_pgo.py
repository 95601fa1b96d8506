"""Pose graph optimization tests: drift correction around a loop."""

import numpy as np
import jax
import jax.numpy as jnp

from aprilslam_tpu.geometry import se3_exp, se3_inverse, se3_log
from aprilslam_tpu.slam.pgo import (
    edges_init,
    add_edge,
    edges_from_trajectory,
    pgo_cost,
    pgo_optimize,
    PoseGraphEdges,
)


def circle_poses(n, radius=10.0):
    poses = []
    for k in range(n):
        a = 2 * np.pi * k / n
        T = np.eye(4)
        T[:3, 3] = [radius * np.cos(a), radius * np.sin(a), 0]
        T[:3, :3] = np.array(se3_exp(jnp.asarray([0, 0, a, 0, 0, 0.0])))[:3, :3]
        poses.append(T)
    return np.stack(poses).astype(np.float32)


class TestPGO:
    def test_zero_cost_at_truth(self):
        gt = jnp.asarray(circle_poses(8))
        edges = edges_from_trajectory(gt)
        assert float(pgo_cost(gt, edges)) < 1e-8

    def test_loop_closure_corrects_drift(self):
        """Odometry with accumulated drift + one loop-closure edge: PGO must
        pull the trajectory back toward ground truth."""
        rng = np.random.default_rng(3)
        n = 10
        gt = circle_poses(n)
        # exact relative measurements
        edges = edges_from_trajectory(jnp.asarray(gt))
        # drifted initialization: integrate odometry with injected noise
        drifted = [gt[0]]
        for k in range(n - 1):
            rel = np.linalg.inv(gt[k]) @ gt[k + 1]
            noise = np.array(se3_exp(jnp.asarray(rng.normal(scale=0.02, size=6))))
            drifted.append(drifted[-1] @ rel @ noise)
        drifted = jnp.asarray(np.stack(drifted), jnp.float32)

        # loop closure: measured relative pose between last and first
        E = edges.capacity + 1
        full = edges_init(E)
        full = PoseGraphEdges(
            i=full.i.at[: E - 1].set(edges.i),
            j=full.j.at[: E - 1].set(edges.j),
            T_meas=full.T_meas.at[: E - 1].set(edges.T_meas),
            weight=full.weight.at[: E - 1].set(edges.weight),
            ok=full.ok.at[: E - 1].set(edges.ok),
        )
        T_loop = jnp.asarray(np.linalg.inv(gt[n - 1]) @ gt[0], jnp.float32)
        full = add_edge(full, E - 1, n - 1, 0, T_loop, weight=2.0)

        err_before = np.linalg.norm(np.asarray(drifted)[:, :3, 3] - gt[:, :3, 3], axis=-1)
        opt = pgo_optimize(drifted, full, iters=15)
        err_after = np.linalg.norm(np.asarray(opt)[:, :3, 3] - gt[:, :3, 3], axis=-1)
        assert err_after.mean() < 0.5 * err_before.mean() + 1e-4, (
            err_before.mean(), err_after.mean())
        # gauge: first pose pinned
        np.testing.assert_allclose(np.asarray(opt)[0], gt[0], atol=1e-3)

    def test_inactive_poses_untouched(self):
        gt = circle_poses(6)
        poses = jnp.asarray(gt)
        edges = edges_from_trajectory(poses)
        active = jnp.asarray([True, True, True, True, False, False])
        out = pgo_optimize(poses, edges, active=active, iters=3)
        np.testing.assert_allclose(np.asarray(out)[4:], gt[4:], atol=1e-5)
