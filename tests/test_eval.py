"""Evaluation subsystem tests: metrics, CSV logger, analysis pipeline."""

import csv
import os

import numpy as np
import jax.numpy as jnp
import pytest

from aprilslam_tpu.eval import (
    pose_errors,
    percentage_error,
    ate_rmse,
    align_umeyama,
    trajectory_report,
    DataLogger,
    MAIN_HEADER,
    error_analysis,
    covariance_report,
    pca,
    kmeans,
    linear_regression,
)
from aprilslam_tpu.geometry import se3_exp


def random_traj(rng, n=50):
    gt = []
    for i in range(n):
        T = np.array(se3_exp(jnp.asarray(rng.normal(size=6) * 0.1)))
        T[:3, 3] = [i * 0.5, np.sin(i * 0.2), 10 + np.cos(i * 0.3)]
        gt.append(T)
    return np.stack(gt)


class TestMetrics:
    def test_pose_errors_zero(self, rng):
        gt = random_traj(rng)
        t, r = pose_errors(gt, gt)
        assert t.max() < 1e-12 and r.max() < 1e-12

    def test_ate_rmse_known_offset(self, rng):
        gt = random_traj(rng)
        est = gt.copy()
        est[:, 0, 3] += 2.0
        assert abs(ate_rmse(est, gt) - 2.0) < 1e-6
        # alignment removes a constant offset entirely
        assert ate_rmse(est, gt, align=True) < 1e-6

    def test_umeyama_recovers_rotation(self, rng):
        gt = random_traj(rng)[:, :3, 3]
        R_true = np.array(se3_exp(jnp.asarray([0.1, 0.2, -0.1, 0, 0, 0])))[:3, :3]
        est = (R_true.T @ (gt - [1, 2, 3]).T).T
        R, t, s = align_umeyama(est, gt)
        recon = (R @ est.T).T + t
        assert np.abs(recon - gt).max() < 1e-8

    def test_percentage_error(self):
        assert percentage_error(1.0, 10.0) == 10.0
        assert percentage_error(1.0, 0.0) == 0.0

    def test_trajectory_report(self, rng):
        gt = random_traj(rng)
        est = gt + rng.normal(scale=0.01, size=gt.shape)
        rep = trajectory_report(est, gt, unit_to_mm=5.56)
        assert rep["translation"]["count"] == len(gt)
        assert rep["ate_rmse"] > 0
        assert "translation_mm" in rep


class TestLogger:
    def test_schemas_and_rows(self, tmp_path, rng):
        d = str(tmp_path / "csv")
        with DataLogger(d) as log:
            gt = random_traj(rng, 12)
            est = gt + rng.normal(scale=0.01, size=gt.shape)
            for i in range(12):
                log.log_frame(est[i], gt[i], n_nodes=3, avg_distance=42.0, t=i * 0.1)
                log.log_node(1.0, gt[i], est[i], est[i], 0.1, 0.2, 0.3)
            stats = log.get_statistics()
            assert stats["frames_logged"] == 12
        with open(os.path.join(d, "slam_simulation_data.csv")) as f:
            rows = list(csv.reader(f))
        assert rows[0] == MAIN_HEADER
        assert len(rows) == 13
        assert len(rows[1]) == 18  # reference's 17 + Reproj_RMS
        with open(os.path.join(d, "error_analysis.csv")) as f:
            rows = list(csv.reader(f))
        assert len(rows[1]) == 22
        with open(os.path.join(d, "covariance_analysis.csv")) as f:
            rows = list(csv.reader(f))
        assert len(rows[1]) == 8


class TestAnalysis:
    def test_pca_orthogonal(self, rng):
        X = jnp.asarray(rng.normal(size=(100, 5)).astype(np.float32))
        proj, comps, ev = pca(X, 2)
        G = np.asarray(comps @ comps.T)
        np.testing.assert_allclose(G, np.eye(2), atol=1e-4)

    def test_kmeans_separates_blobs(self, rng):
        a = rng.normal(size=(40, 2)) + [0, 0]
        b = rng.normal(size=(40, 2)) + [10, 10]
        c = rng.normal(size=(40, 2)) + [-10, 10]
        X = jnp.asarray(np.vstack([a, b, c]).astype(np.float32))
        labels, centers = kmeans(X, 3, seed=1)
        labels = np.asarray(labels)
        for seg in (labels[:40], labels[40:80], labels[80:]):
            assert len(np.unique(seg)) == 1
        assert len(np.unique(labels)) == 3

    def test_linear_regression_exact(self, rng):
        X = jnp.asarray(rng.normal(size=(60, 3)).astype(np.float32))
        w_true = jnp.asarray([2.0, -1.0, 0.5])
        y = X @ w_true + 3.0
        coef, b, stats = linear_regression(X, y)
        np.testing.assert_allclose(np.asarray(coef), np.asarray(w_true), atol=1e-4)
        assert abs(float(b) - 3.0) < 1e-4
        assert float(stats[1]) > 0.999  # r2

    def test_error_analysis_csv_pipeline(self, tmp_path, rng):
        d = str(tmp_path / "csv")
        with DataLogger(d) as log:
            gt = random_traj(rng, 40)
            est = gt + rng.normal(scale=0.05, size=gt.shape)
            for i in range(40):
                log.log_frame(est[i], gt[i], n_nodes=3 + i % 3, avg_distance=40 + i, t=i * 0.1)
        out = str(tmp_path / "clustered.csv")
        res = error_analysis(os.path.join(d, "slam_simulation_data.csv"), output_csv=out)
        assert os.path.exists(out)
        assert res.labels.shape == (40,)
        assert 0 <= res.r2 <= 1.0 or res.r2 < 0  # r2 may be poor on noise, just finite
        assert np.isfinite(res.mse)

    def test_covariance_report(self, tmp_path, rng):
        p = tmp_path / "cov.csv"
        with open(p, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["A", "B", "Translation_Error"])
            # 400 samples puts the sample cov of the independent column B at
            # ~0.1 sigma, so the 0.5 bound is ~5 sigma (and the per-test rng
            # fixture makes the draw deterministic regardless of ordering).
            for i in range(400):
                a = rng.normal()
                w.writerow([a, rng.normal(), 2 * a + rng.normal() * 0.01])
        rep = covariance_report(str(p))
        assert rep["A"] > 1.0  # strongly covarying
        assert abs(rep["B"]) < 0.5
