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


class TestVerifyCli:
    def test_verify_install_passes(self, capsys):
        rc = verify_main(["--cpu"])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "functional render+detect smoke test" in out
