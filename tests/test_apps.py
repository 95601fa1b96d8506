"""CLI app tests (run in-process on CPU with small scenes)."""

import json
import os

import numpy as np
import pytest

from aprilslam_tpu.apps.run_simulation import main as sim_main, parse_arguments, fmt_distance
from aprilslam_tpu.apps.verify_install import main as verify_main


class TestArgs:
    def test_defaults(self):
        a = parse_arguments([])
        assert a.estimator == "ba"
        assert not a.no_movement

    def test_reference_flags(self):
        a = parse_arguments(["--config", "x.json", "--no-movement", "--debug"])
        assert a.config == "x.json" and a.no_movement and a.debug

    def test_fmt_distance_units(self):
        to_mm = lambda v: v * 5.56
        assert fmt_distance(1.0, to_mm).endswith("mm")
        assert fmt_distance(10.0, to_mm).endswith("cm")
        assert fmt_distance(300.0, to_mm).endswith("m")


class TestSimCli:
    def test_end_to_end_run(self, tmp_path, capsys):
        out_dir = str(tmp_path / "csv")
        rc = sim_main([
            "--frames", "8", "--batch", "4", "--resolution", "256",
            "--estimator", "chain_avg", "--headless",
            "--decimate", "1", "--trajectory", "line",
            "--output-dir", out_dir,
        ])
        assert rc == 0
        assert os.path.exists(os.path.join(out_dir, "slam_simulation_data.csv"))
        captured = capsys.readouterr().out.strip().splitlines()
        summary = json.loads(captured[-1])
        assert summary["frames"] >= 6
        assert summary["ate_rmse_su"] < 1.8  # reference accuracy bar

    def test_bad_config_error(self, tmp_path):
        bad = tmp_path / "bad.json"
        bad.write_text("{\"display_width\": 100}")
        rc = sim_main(["--config", str(bad), "--headless"])
        assert rc == 2

    def test_node_analysis_csvs_populated(self, tmp_path):
        """A live run must fill error_analysis.csv / covariance_analysis.csv
        (reference simulation_engine.py:302-356), and the offline analytics
        must run on the fresh output."""
        out_dir = str(tmp_path / "csv")
        rc = sim_main([
            "--frames", "12", "--batch", "4", "--resolution", "256",
            "--estimator", "chain_avg", "--headless",
            "--decimate", "1", "--trajectory", "line",
            "--output-dir", out_dir,
            "--save-viz", str(tmp_path / "viz"),
        ])
        assert rc == 0
        import csv as _csv

        err_csv = os.path.join(out_dir, "error_analysis.csv")
        cov_csv = os.path.join(out_dir, "covariance_analysis.csv")
        with open(err_csv) as f:
            err_rows = list(_csv.DictReader(f))
        with open(cov_csv) as f:
            cov_rows = list(_csv.DictReader(f))
        assert len(err_rows) > 0, "error_analysis.csv has no data rows"
        assert len(cov_rows) > 0, "covariance_analysis.csv has no data rows"
        # Main CSV gained the per-frame reprojection RMS column.
        with open(os.path.join(out_dir, "slam_simulation_data.csv")) as f:
            main_rows = list(_csv.DictReader(f))
        assert "Reproj_RMS" in main_rows[0]

        from aprilslam_tpu.eval import covariance_report

        rep = covariance_report(cov_csv)
        assert "Tag_Est_X" in rep
        # The error graph snapshot must have been produced.
        assert os.path.exists(str(tmp_path / "viz" / "error_graph.png"))

    def test_checkpoint_resume(self, tmp_path):
        out_dir = str(tmp_path / "csv")
        ckpt_dir = str(tmp_path / "ckpt")
        common = [
            "--frames", "8", "--batch", "4", "--resolution", "256",
            "--estimator", "chain_avg", "--headless",
            "--decimate", "1", "--trajectory", "line",
            "--output-dir", out_dir,
            "--checkpoint-dir", ckpt_dir, "--checkpoint-every", "4",
        ]
        assert sim_main(common) == 0
        assert os.listdir(ckpt_dir), "no checkpoint written"
        # Resume must load the saved graph (anchor already set) and still run.
        rc = sim_main(common + ["--resume"])
        assert rc == 0


class TestInteractiveCamera:
    def test_key_mapping(self):
        from aprilslam_tpu.sim.interactive import InteractiveCamera

        c = InteractiveCamera(movement_speed=0.5, rotation_speed=2.0, size_scale=2.0)
        c.apply_keys("ll")  # x += 2 * speed
        assert np.isclose(c.position[0], 2.0)
        c.apply_keys("w")
        assert np.isclose(c.position[2], -1.0)
        c.apply_keys("ik")  # y up then down cancels
        assert np.isclose(c.position[1], 0.0)
        c.apply_keys("dd")  # yaw +4 deg
        assert np.isclose(c.rotation[1], 4.0)
        c.apply_keys("q")
        assert np.isclose(c.rotation[2], -2.0)
        c.apply_keys("r")
        assert np.isclose(c.rotation[0], 2.0)
        assert not c.quit
        c.apply_key("x")
        assert c.quit

    def test_interactive_run_headless(self, tmp_path, monkeypatch):
        """--interactive with no tty: keys come from a pipe; the run still
        completes end to end."""
        import io

        monkeypatch.setattr("sys.stdin", io.StringIO("llwwaa" * 10))
        rc = sim_main([
            "--frames", "4", "--batch", "2", "--resolution", "256",
            "--estimator", "chain_avg", "--headless", "--interactive",
            "--decimate", "1",
            "--output-dir", str(tmp_path / "csv"),
        ])
        assert rc in (0, 1)  # pose validity depends on where the user drove


class TestVerifyCli:
    def test_verify_install_passes(self, capsys):
        rc = verify_main(["--cpu"])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "functional render+detect smoke test" in out


class TestRefineCli:
    @pytest.mark.slow
    def test_demo_refine_and_roundtrip(self, tmp_path, capsys):
        from aprilslam_tpu.apps.refine_trajectory import main as refine_main

        out = str(tmp_path / "refined.npz")
        rc = refine_main([
            "--demo", "--keyframes", "128", "--landmarks", "16",
            "--iters", "8", "--cg-iters", "32", "--device", "cpu",
            "--output", out,
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["finite"]
        assert rep["cost_refined"] < 0.05 * rep["cost_initial"]
        assert rep["ate_refined"] < rep["ate_initial"]
        assert os.path.exists(out)

        # Round-trip: reloading the refined problem starts near-converged.
        rc = refine_main([
            "--input", out, "--iters", "1", "--cg-iters", "4",
            "--device", "cpu",
        ])
        assert rc == 0
        rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep2["cost_initial"] <= 1.05 * rep["cost_refined"]

    @pytest.mark.slow
    def test_export_problem_then_refine(self, tmp_path, capsys):
        """Online run -> exported global-BA problem -> offline refine:
        the full online-to-offline workflow."""
        from aprilslam_tpu.apps.refine_trajectory import main as refine_main

        prob_path = str(tmp_path / "run.npz")
        rc = sim_main([
            "--frames", "12", "--batch", "4", "--resolution", "256",
            "--estimator", "ba", "--headless", "--decimate", "1",
            "--trajectory", "line", "--output-dir", str(tmp_path / "csv"),
            "--export-problem", prob_path,
        ])
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["exported_keyframes"] >= 10
        assert os.path.exists(prob_path)

        rc = refine_main([
            "--input", prob_path, "--iters", "6", "--cg-iters", "24",
            "--device", "cpu",
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["finite"]
        assert rep["cost_refined"] <= rep["cost_initial"]


class TestVideoCli:
    def test_y4m_native_replay(self, tmp_path, caplog):
        """Full video app over a .y4m file: native C++ reader (no cv2 in the
        file path) -> batched detect -> PnP -> per-tag console report."""
        import logging

        import jax.numpy as jnp

        from aprilslam_tpu.apps.video_detection import main as video_main
        from aprilslam_tpu.geometry import PinholeCamera
        from aprilslam_tpu.sim import SceneConfig, scene_tensors, render_frames, trajectory

        cfg = SceneConfig.from_file()
        res = 256
        cam = PinholeCamera.from_fov(res, res, cfg.fov_y)
        scene = scene_tensors(cfg)
        traj = trajectory.scripted_line(4, np.array([0.0, 0.0, 20.0]),
                                        np.array([4.0, 1.0, 10.0]))
        frames = np.asarray(render_frames(
            scene, jnp.asarray(traj.positions), jnp.asarray(traj.rotations),
            jnp.asarray(cam.inv_matrix), res, res, 2))
        y = np.clip(frames * 255.0, 0, 255).astype(np.uint8)

        y4m = tmp_path / "seq.y4m"
        with open(y4m, "wb") as f:
            f.write(f"YUV4MPEG2 W{res} H{res} F25:1 Cmono\n".encode())
            for fr in y:
                f.write(b"FRAME\n")
                f.write(fr.tobytes())

        calib = tmp_path / "cal.npz"
        np.savez(calib, camera_matrix=cam.matrix,
                 dist_coeffs=np.zeros(5, np.float32))

        with caplog.at_level(logging.INFO):
            rc = video_main([
                "--source", str(y4m), "--calibration", str(calib),
                "--family", cfg.family, "--tag-size", str(cfg.tag_size_inner),
                "--batch", "4", "--max-frames", "4", "--device", "cpu",
                "--decimate", "1",
            ])
        assert rc == 0
        tag_lines = [r.message for r in caplog.records if r.message.startswith("tag ")]
        assert len(tag_lines) >= 4, tag_lines
