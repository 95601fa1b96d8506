"""Simulator tests: config parity, GT oracle parity, rasterizer correctness."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.sim import (
    SceneConfig,
    DEFAULT_SCENE,
    randomize_scene,
    camera_to_tag_transforms,
    camera_in_tag_frames,
    scene_tensors,
    render_frames,
    project_border_corners,
    trajectory,
)


@pytest.fixture(scope="module")
def config():
    return SceneConfig.from_file(DEFAULT_SCENE)


class TestConfig:
    def test_default_scene(self, config):
        assert config.display_size == (1000, 1000)
        assert config.tag_size_inner == 10.0  # 5 * size_scale 2
        assert config.tag_size_outer == 18.0
        assert len(config.tags) == 5

    def test_unit_conversion(self, config):
        # 1 sim unit = 55.6 / 10 = 5.56 mm (config_manager.py:199-209)
        assert abs(config.simulation_units_to_mm(1.0) - 5.56) < 1e-6
        assert abs(config.mm_to_simulation_units(5.56) - 1.0) < 1e-6

    @pytest.mark.parametrize(
        "patch,msg",
        [
            ({"fov_y": 200}, "fov_y"),
            ({"near_clip": 400}, "near_clip"),
            ({"display_width": -1}, "display"),
            ({"tags": []}, "non-empty"),
            ({"tag_size_inner": 0}, "positive"),
        ],
    )
    def test_validation(self, patch, msg):
        with open(DEFAULT_SCENE) as f:
            raw = json.load(f)
        raw.update(patch)
        with pytest.raises(ValueError, match=msg):
            SceneConfig.from_dict(raw)

    def test_missing_key(self):
        with open(DEFAULT_SCENE) as f:
            raw = json.load(f)
        del raw["actual_size_in_mm"]
        with pytest.raises(ValueError, match="missing"):
            SceneConfig.from_dict(raw)

    def test_randomize(self):
        with open(DEFAULT_SCENE) as f:
            raw = json.load(f)
        out = randomize_scene(raw, percentage=0.1, seed=0)
        p0 = np.array(raw["tags"][3]["position"])
        p1 = np.array(out["tags"][3]["position"])
        assert not np.allclose(p0, p1)
        nz = p0 != 0
        assert np.all(np.abs(p1[nz] - p0[nz]) <= np.abs(p0[nz]) * 0.1 + 1e-9)


class TestGroundTruth:
    def test_matches_reference_formula_zero_rotation(self, config):
        """Oracle: re-derived numpy version of ground_truth.py:48-90."""
        cam_pos = np.array([3.0, -1.0, 7.0], dtype=np.float32)
        T = np.asarray(
            camera_to_tag_transforms(
                jnp.asarray(config.tag_positions()),
                jnp.asarray(config.tag_rotations()),
                jnp.asarray(cam_pos),
            )
        )
        flip = np.diag([1.0, -1.0, -1.0])
        for i, tag in enumerate(config.tags):
            rel = tag.position - cam_pos
            rel[1:] = -rel[1:]
            ang = np.radians(tag.rotation)
            Rx = np.array([[1, 0, 0], [0, np.cos(ang[0]), -np.sin(ang[0])], [0, np.sin(ang[0]), np.cos(ang[0])]])
            Ry = np.array([[np.cos(ang[1]), 0, np.sin(ang[1])], [0, 1, 0], [-np.sin(ang[1]), 0, np.cos(ang[1])]])
            Rz = np.array([[np.cos(ang[2]), -np.sin(ang[2]), 0], [np.sin(ang[2]), np.cos(ang[2]), 0], [0, 0, 1]])
            R = flip @ (Rz @ Ry @ Rx)
            np.testing.assert_allclose(T[i, :3, :3], R, atol=1e-5)
            np.testing.assert_allclose(T[i, :3, 3], rel, atol=1e-5)

    def test_inverse_is_inverse(self, config):
        cam_pos = jnp.asarray([[3.0, -1.0, 7.0], [0.0, 0.0, 0.0]])
        cam_rot = jnp.asarray([[5.0, -10.0, 2.0], [0.0, 0.0, 0.0]])
        fw = camera_to_tag_transforms(
            jnp.asarray(config.tag_positions()), jnp.asarray(config.tag_rotations()), cam_pos, cam_rot
        )
        inv = camera_in_tag_frames(
            jnp.asarray(config.tag_positions()), jnp.asarray(config.tag_rotations()), cam_pos, cam_rot
        )
        prod = np.asarray(fw @ inv)
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-4)


class TestTrajectory:
    def test_monte_carlo_bounds(self):
        tr = trajectory.monte_carlo(256, seed=1)
        b = trajectory.REFERENCE_BOUNDS
        assert np.all(tr.positions >= b[:, 0]) and np.all(tr.positions <= b[:, 1])
        assert np.all(tr.rotations == 0)

    def test_scripted_and_orbit(self):
        tr = trajectory.scripted_line(10)
        assert len(tr) == 10
        orb = trajectory.orbit(12)
        assert np.any(orb.rotations[:, 1] != 0)

    def test_smooth_walk_in_bounds(self):
        tr = trajectory.smooth_random_walk(100, seed=2)
        b = trajectory.REFERENCE_BOUNDS
        assert np.all(tr.positions >= b[:, 0] - 1e-3)
        assert np.all(tr.positions <= b[:, 1] + 1e-3)


class TestRasterizer:
    @pytest.fixture(scope="class")
    def small_setup(self, config):
        cam = PinholeCamera.from_fov(256, 256, 45.0)
        scene = scene_tensors(config)
        return cam, scene

    def test_render_shapes_and_range(self, small_setup):
        cam, scene = small_setup
        pos = jnp.asarray([[0.0, 0.0, 0.0]])
        rot = jnp.zeros((1, 3))
        img = np.asarray(
            render_frames(scene, pos, rot, jnp.asarray(cam.inv_matrix), 256, 256, 1)
        )
        assert img.shape == (1, 256, 256)
        assert img.min() >= 0.0 and img.max() <= 1.0
        # Tag 0 is dead ahead at z=-50: centre region must contain black+white
        patch = img[0, 96:160, 96:160]
        assert patch.min() < 0.1 and patch.max() > 0.9
        # Corners of the frame are background
        assert abs(img[0, 0, 0] - scene.background) < 1e-3

    def test_rendered_cells_match_texture(self, config):
        """Sample the rendered image at analytically-projected cell centres;
        each must match the family grid value — end-to-end render oracle."""
        from aprilslam_tpu.families import get_family

        cam = PinholeCamera.from_fov(512, 512, 45.0)
        scene = scene_tensors(config)
        fam = get_family(config.family)
        pos = jnp.asarray([[0.0, 0.0, 0.0]])
        rot = jnp.zeros((1, 3))
        img = np.asarray(render_frames(scene, pos, rot, jnp.asarray(cam.inv_matrix), 512, 512, 1))[0]

        # Tag 0: at [0,0,-50] facing camera; CV frame t=(0,0,50), R=flip.
        # Cell centres in tag local units then project.
        C = fam.total_width
        cell = scene.outer_half * 2 / C
        K = cam.matrix
        grid = fam.grids[0]
        errs = 0
        for r in range(C):
            for c in range(C):
                x = -scene.outer_half + (c + 0.5) * cell
                y = scene.outer_half - (r + 0.5) * cell
                # CV camera point: R=diag(1,-1,-1) applied to (x, y, 0) + t
                p = np.array([x, -y, 50.0])
                u = K[0, 0] * p[0] / p[2] + K[0, 2]
                v = K[1, 1] * p[1] / p[2] + K[1, 2]
                got = img[int(round(v)), int(round(u))]
                want = float(grid[r, c])
                if abs(got - want) > 0.5:
                    errs += 1
        assert errs == 0, f"{errs} cell mismatches"

    def test_projected_corners_oracle(self, small_setup):
        cam, scene = small_setup
        pos = jnp.asarray([[0.0, 0.0, 0.0]])
        rot = jnp.zeros((1, 3))
        uv, valid = project_border_corners(scene, pos, rot, jnp.asarray(cam.matrix))
        uv = np.asarray(uv)
        assert np.asarray(valid).all()
        # Tag 0 border square: +-5 units at depth 50 -> half-extent in pixels
        f = cam.fx
        half_px = 5.0 / 50.0 * f
        np.testing.assert_allclose(uv[0, 0, 0], [128 - half_px, 128 + half_px], atol=1e-3)
        np.testing.assert_allclose(uv[0, 0, 2], [128 + half_px, 128 - half_px], atol=1e-3)

    def test_occlusion_depth_order(self, config):
        """Place two tags on the same ray; nearer one must win."""
        raw = {
            "display_width": 128, "display_height": 128, "fov_y": 45,
            "near_clip": 0.1, "far_clip": 300.0, "size_scale": 2,
            "tag_size_inner": 5, "tag_size_outer": 9, "actual_size_in_mm": 55.6,
            "family": "tagStandard41h12",
            "tags": [
                {"id": 0, "position": [0, 0, -50], "rotation": [0, 0, 0]},
                {"id": 1, "position": [0, 0, -30], "rotation": [0, 0, 0]},
            ],
        }
        cfg = SceneConfig.from_dict(raw)
        cam = PinholeCamera.from_fov(128, 128, 45.0)
        scene = scene_tensors(cfg)
        img = np.asarray(
            render_frames(scene, jnp.zeros((1, 3)), jnp.zeros((1, 3)), jnp.asarray(cam.inv_matrix), 128, 128, 1)
        )[0]
        # centre pixel: tag1 (id 1) at z=30 occludes tag0; its centre cell value
        from aprilslam_tpu.families import get_family

        fam = get_family("tagStandard41h12")
        assert abs(img[64, 64] - float(fam.grids[1][4, 4])) < 0.5

    def test_supersampling_smooths_edges(self, small_setup):
        cam, scene = small_setup
        pos = jnp.asarray([[0.0, 0.0, 0.0]])
        rot = jnp.zeros((1, 3))
        img1 = np.asarray(render_frames(scene, pos, rot, jnp.asarray(cam.inv_matrix), 256, 256, 1))
        img2 = np.asarray(render_frames(scene, pos, rot, jnp.asarray(cam.inv_matrix), 256, 256, 2))
        # supersampled image has intermediate gray levels at edges
        mid1 = np.sum((img1 > 0.3) & (img1 < 0.7) & (np.abs(img1 - scene.background) > 0.05))
        mid2 = np.sum((img2 > 0.3) & (img2 < 0.7) & (np.abs(img2 - scene.background) > 0.05))
        assert mid2 > mid1


class TestOcclusion:
    def test_tags_unoccluded_matches_brute_force(self, rng):
        """Analytic segment-vs-quad occlusion vs a per-ray numpy reference,
        with ROTATED occluders (regression: a double-transpose evaluated the
        inside-quad test in the wrong frame for rotated tags)."""
        from aprilslam_tpu.sim.ground_truth import (
            tags_unoccluded, tag_world_rotations,
        )

        T, B = 6, 4
        tag_pos = rng.uniform(-20, 20, (T, 3)).astype(np.float32)
        tag_pos[:, 2] = rng.uniform(-5, 5, T)
        tag_rot = rng.uniform(-60, 60, (T, 3)).astype(np.float32)
        cam_pos = rng.uniform(-10, 10, (B, 3)).astype(np.float32)
        cam_pos[:, 2] += 40
        inner, outer_half = 5.0, 4.5

        got = np.asarray(tags_unoccluded(
            jnp.asarray(tag_pos), jnp.asarray(tag_rot), jnp.asarray(cam_pos),
            inner, outer_half,
        ))

        R = np.asarray(tag_world_rotations(jnp.asarray(tag_rot)))
        half = inner / 2
        local = np.array(
            [[-half, -half, 0], [half, -half, 0], [half, half, 0],
             [-half, half, 0], [0, 0, 0]], np.float32)
        P = np.einsum("tij,pj->tpi", R, local) + tag_pos[:, None]
        exp = np.ones((B, T), bool)
        for b in range(B):
            for t in range(T):
                for p in range(5):
                    C, d = cam_pos[b], P[t, p] - cam_pos[b]
                    for s in range(T):
                        if s == t:
                            continue
                        n = R[s][:, 2]
                        den = n @ d
                        if abs(den) < 1e-9:
                            continue
                        tau = (n @ (tag_pos[s] - C)) / den
                        if not (1e-3 < tau < 1 - 1e-3):
                            continue
                        q = R[s].T @ (C + tau * d - tag_pos[s])
                        if abs(q[0]) <= outer_half and abs(q[1]) <= outer_half:
                            exp[b, t] = False
        np.testing.assert_array_equal(got, exp)
