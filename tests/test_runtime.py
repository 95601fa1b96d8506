"""Native runtime tests: C++ rasterizer vs JAX rasterizer oracle, pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.sim import SceneConfig, scene_tensors, render_frames


@pytest.fixture(scope="module")
def setup():
    cfg = SceneConfig.from_file()
    cam = PinholeCamera.from_fov(256, 256, cfg.fov_y)
    scene = scene_tensors(cfg)
    return cfg, cam, scene


class TestNativeRasterizer:
    def test_builds_and_versions(self):
        from aprilslam_tpu.runtime import load_library

        lib = load_library()
        assert lib.asr_version() == 1

    def test_matches_jax_rasterizer(self, setup):
        from aprilslam_tpu.runtime import render_frames_native

        cfg, cam, scene = setup
        pos = np.asarray([[0.0, 0.0, 10.0], [6.0, 2.0, -4.0]], np.float32)
        rot = np.asarray([[0.0, 0.0, 0.0], [3.0, -5.0, 2.0]], np.float32)
        ours = render_frames_native(scene, pos, rot, cam, 256, 256, supersample=1)
        ref = np.asarray(
            render_frames(scene, jnp.asarray(pos), jnp.asarray(rot),
                          jnp.asarray(cam.inv_matrix), 256, 256, 1)
        )
        # identical math; tolerate a thin band of edge pixels differing from
        # float32-vs-double rounding at cell boundaries
        diff = np.abs(ours - ref)
        mismatched = (diff > 0.5).mean()
        assert mismatched < 0.002, mismatched
        assert diff.mean() < 0.01

    def test_supersample_range(self, setup):
        from aprilslam_tpu.runtime import render_frames_native

        cfg, cam, scene = setup
        img = render_frames_native(scene, np.zeros((1, 3), np.float32),
                                   np.zeros((1, 3), np.float32), cam, 128, 128, 2)
        assert img.shape == (1, 128, 128)
        assert 0.0 <= img.min() and img.max() <= 1.0
        assert img.std() > 0.05  # scene content present


class TestFramePipeline:
    def test_streams_all_batches_in_order_set(self, setup):
        from aprilslam_tpu.runtime import FramePipeline
        from aprilslam_tpu.sim import trajectory

        cfg, cam, scene = setup
        traj = trajectory.scripted_line(12, np.array([0, 0, 20.0]), np.array([4, 1, 5.0]))
        firsts = []
        with FramePipeline(scene, cam, traj.positions, traj.rotations,
                           height=128, width=128, batch=4, supersample=1,
                           n_threads=2) as pipe:
            for first, frames in pipe:
                assert frames.shape == (4, 128, 128)
                assert np.isfinite(frames).all()
                firsts.append(first)
        assert sorted(firsts) == [0, 4, 8]

    def test_pipeline_frames_match_sync_render(self, setup):
        from aprilslam_tpu.runtime import FramePipeline, render_frames_native
        from aprilslam_tpu.sim import trajectory

        cfg, cam, scene = setup
        traj = trajectory.scripted_line(8, np.array([0, 0, 18.0]), np.array([2, 0, 10.0]))
        got = {}
        with FramePipeline(scene, cam, traj.positions, traj.rotations,
                           height=96, width=96, batch=4, supersample=1) as pipe:
            for first, frames in pipe:
                got[first] = frames
        sync = render_frames_native(scene, traj.positions, traj.rotations, cam, 96, 96, 1)
        for first, frames in got.items():
            np.testing.assert_allclose(frames, sync[first : first + 4], atol=1e-6)


class TestY4MReader:
    """Native Y4M ingestion (runtime/video_io.cpp): header parsing, chroma
    skipping per colourspace, prefetch ring, EOF semantics."""

    @staticmethod
    def _write_y4m(path, frames, cspace="420"):
        H, W = frames.shape[1:]
        with open(path, "wb") as f:
            f.write(f"YUV4MPEG2 W{W} H{H} F25:1 Ip A1:1 C{cspace}\n".encode())
            for fr in frames:
                f.write(b"FRAME\n")
                f.write(fr.tobytes())
                if cspace == "420":
                    f.write(b"\x80" * (H * W // 2))
                elif cspace == "444":
                    f.write(b"\x80" * (H * W * 2))

    @pytest.mark.parametrize("cspace", ["420", "444", "mono"])
    def test_roundtrip(self, tmp_path, rng, cspace):
        from aprilslam_tpu.runtime import Y4MReader

        frames = rng.integers(0, 256, (5, 32, 48), dtype=np.uint8)
        path = str(tmp_path / f"t_{cspace}.y4m")
        self._write_y4m(path, frames, cspace)
        with Y4MReader(path) as r:
            assert (r.width, r.height) == (48, 32)
            assert abs(r.fps - 25.0) < 1e-9
            got = r.read_batch(8)  # more than available -> stops at EOF
        np.testing.assert_array_equal(got, frames)

    def test_eof_and_bad_file(self, tmp_path):
        from aprilslam_tpu.runtime import Y4MReader

        frames = np.zeros((2, 16, 16), np.uint8)
        path = str(tmp_path / "t.y4m")
        self._write_y4m(path, frames)
        with Y4MReader(path) as r:
            assert r.read_batch(2).shape == (2, 16, 16)
            assert r.read() is None
            assert r.read_batch(4).shape[0] == 0

        bad = tmp_path / "bad.y4m"
        bad.write_bytes(b"NOT A STREAM")
        with pytest.raises(OSError):
            Y4MReader(str(bad))
