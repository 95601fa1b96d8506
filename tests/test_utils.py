"""Checkpoint + profiling utility tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from aprilslam_tpu.slam import init_graph, update_graph
from aprilslam_tpu.slam.ba import ba_init
from aprilslam_tpu.utils import CheckpointManager, StageTimer, FpsCounter


class TestCheckpoint:
    def test_graph_state_roundtrip(self, tmp_path, rng):
        from tests.test_slam import mk_T  # reuse helper

        st = init_graph(16)
        st = update_graph(
            st, jnp.asarray([0, 3]), jnp.stack([mk_T(rng), mk_T(rng)]), jnp.asarray([True, True])
        )
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(5, st, metadata={"frames": 10})
        assert mgr.latest_step() == 5

        restored = mgr.restore(init_graph(16))
        np.testing.assert_allclose(np.asarray(restored.world), np.asarray(st.world), atol=1e-7)
        np.testing.assert_allclose(np.asarray(restored.local), np.asarray(st.local), atol=1e-7)
        assert int(restored.coordinate_id) == int(st.coordinate_id)
        assert bool(restored.present[3])
        mgr.close()

    def test_tuple_state_roundtrip(self, tmp_path, rng):
        from tests.test_slam import mk_T

        g = init_graph(8)
        b = ba_init(4, 8, 32)
        mgr = CheckpointManager(str(tmp_path / "ckpt2"))
        mgr.save(1, (g, b))
        g2, b2 = mgr.restore((init_graph(8), ba_init(4, 8, 32)))
        assert g2.local.shape == g.local.shape
        assert b2.obs_uv.shape == b.obs_uv.shape
        mgr.close()

    def test_missing_checkpoint_raises(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "empty"))
        with pytest.raises(FileNotFoundError):
            mgr.restore(init_graph(4))
        mgr.close()


class TestProfiling:
    def test_stage_timer(self):
        t = StageTimer()
        with t.stage("a"):
            sum(range(1000))
        with t.stage("a"):
            pass
        assert t.counts["a"] == 2
        assert "a" in t.report()

    def test_fps_counter(self):
        c = FpsCounter(window=2)
        assert c.tick() is None
        fps = c.tick()
        assert fps is not None and fps > 0
