"""Detector robustness beyond the self-oracle (round-1 VERDICT weak #6).

Every round-1 detection test rendered with sim/rasterizer.py and detected
with shared conventions — a convention bug (pixel-centre offset, gamma
assumption) could cancel and pass. These sweeps perturb the renders the way
a real sensor would (sim/degrade.py: noise, blur, exposure gradient, gamma,
vignetting, combinations) and gate on quantified floors:

* detection rate over the sweep,
* corner RMS error against the analytic projected-corner oracle,
* zero false tag ids.

The oracle (project_border_corners) is analytic geometry, independent of
the rasterized pixels, so degradations cannot cancel against it.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.detect import TagDetector, DetectorParams
from aprilslam_tpu.sim import (
    SceneConfig,
    scene_tensors,
    render_frames,
    project_border_corners,
    degrade,
    tags_unoccluded,
)
from aprilslam_tpu.sim.config import TagConfig

RES = 512


@pytest.fixture(scope="module")
def clean_scene():
    cfg = SceneConfig.from_file()
    cam = PinholeCamera.from_fov(RES, RES, cfg.fov_y)
    scene = scene_tensors(cfg)
    pos = jnp.asarray([[0.0, 0.0, 10.0], [10.0, 2.0, 0.0], [25.0, 5.0, -10.0]], jnp.float32)
    rot = jnp.zeros((3, 3), jnp.float32)
    frames = render_frames(scene, pos, rot, jnp.asarray(cam.inv_matrix), RES, RES, 2)
    gt_uv, gt_valid = project_border_corners(scene, pos, rot, jnp.asarray(cam.matrix))
    # The raw oracle has no occlusion model but the z-buffered renderer
    # does: from pose [10,2,0] tag 1 sits entirely behind tag 0, so the
    # detector can never (and should never) report it. Scope "expected"
    # to analytically unoccluded tags.
    unocc = tags_unoccluded(scene.tag_pos, scene.tag_rot, pos, scene.inner_size, scene.outer_half)
    gt_valid = gt_valid & unocc
    det = TagDetector(cfg.family, DetectorParams(quad_decimate=1, min_cluster_pts=12))
    return cfg, cam, scene, frames, np.asarray(gt_uv), np.asarray(gt_valid), det


def _score(det_out, scene, gt_uv, gt_valid, margin=10):
    """(found, expected, corner_rms, false_ids) over all frames."""
    ids = np.asarray(det_out.ids)
    valid = np.asarray(det_out.valid)
    corners = np.asarray(det_out.corners)
    tag_ids = np.asarray(scene.tag_ids)
    scene_id_set = set(tag_ids.tolist())
    found = expected = false_ids = 0
    errs = []
    B = ids.shape[0]
    for b in range(B):
        got = {int(ids[b, d]): d for d in range(ids.shape[1]) if valid[b, d]}
        false_ids += sum(1 for g in got if g not in scene_id_set)
        for t in range(gt_uv.shape[1]):
            uv = gt_uv[b, t]
            if not (gt_valid[b, t] and uv.min() > margin and uv.max() < RES - margin):
                continue
            expected += 1
            tid = int(tag_ids[t])
            if tid in got:
                found += 1
                d = got[tid]
                errs.append(np.sqrt(np.mean(np.sum((corners[b, d] - uv) ** 2, -1))))
    rms = float(np.sqrt(np.mean(np.square(errs)))) if errs else float("inf")
    return found, expected, rms, false_ids


class TestSensorNoise:
    def test_noise_sweep(self, clean_scene):
        cfg, cam, scene, frames, gt_uv, gt_valid, det = clean_scene
        key = jax.random.PRNGKey(7)
        for sigma, min_rate, max_rms in [(0.02, 1.0, 0.6), (0.05, 1.0, 0.8), (0.10, 1.0, 1.0)]:
            noisy = degrade.gaussian_noise(frames, sigma, key)
            out = det.detect(noisy)
            found, expected, rms, false_ids = _score(out, scene, gt_uv, gt_valid)
            assert expected >= 5  # 6 unoccluded in-view tags over the 3 poses
            rate = found / expected
            assert rate >= min_rate, (sigma, rate)
            assert rms <= max_rms, (sigma, rms)
            assert false_ids == 0, (sigma, false_ids)


class TestBlur:
    def test_defocus_sweep(self, clean_scene):
        cfg, cam, scene, frames, gt_uv, gt_valid, det = clean_scene
        for sigma, min_rate, max_rms in [(0.8, 1.0, 0.6), (1.5, 0.9, 1.2)]:
            soft = degrade.gaussian_blur(frames, sigma)
            out = det.detect(soft)
            found, expected, rms, false_ids = _score(out, scene, gt_uv, gt_valid)
            rate = found / expected
            assert rate >= min_rate, (sigma, rate)
            assert rms <= max_rms, (sigma, rms)
            assert false_ids == 0


class TestPhotometric:
    def test_brightness_gradient(self, clean_scene):
        cfg, cam, scene, frames, gt_uv, gt_valid, det = clean_scene
        for strength in (0.3, 0.6):
            lit = degrade.brightness_gradient(frames, strength)
            out = det.detect(lit)
            found, expected, rms, false_ids = _score(out, scene, gt_uv, gt_valid)
            assert found / expected >= 0.9, strength
            assert rms <= 1.0, (strength, rms)
            assert false_ids == 0

    def test_gamma_and_vignette(self, clean_scene):
        """Gamma + vignetting break any render<->detect intensity-convention
        cancellation: absolute levels and local contrast both shift."""
        cfg, cam, scene, frames, gt_uv, gt_valid, det = clean_scene
        for gamma, vig in [(0.6, 0.3), (1.8, 0.4)]:
            warped = degrade.vignette(degrade.gamma_correct(frames, gamma), vig)
            out = det.detect(warped)
            found, expected, rms, false_ids = _score(out, scene, gt_uv, gt_valid)
            assert found / expected >= 0.9, (gamma, vig)
            assert rms <= 1.0, (gamma, vig, rms)
            assert false_ids == 0


class TestObliqueAngles:
    def test_tilted_tags(self):
        """Tags tilted 30-60 deg away from frontal must still detect with
        subpixel-ish corners (the planar-ambiguity danger zone)."""
        results = []
        for tilt in (30.0, 45.0, 60.0):
            tags = (
                TagConfig(id=0, position=np.array([0.0, 0.0, -50.0]),
                          rotation=np.array([0.0, tilt, 0.0])),
                TagConfig(id=1, position=np.array([20.0, 0.0, -50.0]),
                          rotation=np.array([tilt, 0.0, 0.0])),
            )
            cfg = SceneConfig(
                display_width=RES, display_height=RES, fov_y=45.0,
                near_clip=0.1, far_clip=300.0, size_scale=2.0,
                tag_size_inner_raw=5.0, tag_size_outer_raw=9.0,
                actual_size_in_mm=55.6, tags=tags, family="tagStandard41h12",
            )
            cam = PinholeCamera.from_fov(RES, RES, cfg.fov_y)
            scene = scene_tensors(cfg)
            pos = jnp.asarray([[5.0, 0.0, 10.0]], jnp.float32)
            rot = jnp.zeros((1, 3), jnp.float32)
            frames = render_frames(scene, pos, rot, jnp.asarray(cam.inv_matrix), RES, RES, 2)
            gt_uv, gt_valid = project_border_corners(scene, pos, rot, jnp.asarray(cam.matrix))
            det = TagDetector(cfg.family, DetectorParams(quad_decimate=1, min_cluster_pts=12))
            out = det.detect(frames)
            found, expected, rms, false_ids = _score(
                out, scene, np.asarray(gt_uv), np.asarray(gt_valid)
            )
            results.append((tilt, found, expected, rms, false_ids))
            assert false_ids == 0
        # 30/45 deg must fully detect with tight corners; 60 deg must detect
        # at least one tag.
        for tilt, found, expected, rms, _ in results[:2]:
            assert expected >= 2 and found == expected, (tilt, found, expected)
            assert rms <= 0.8, (tilt, rms)
        assert results[2][1] >= 1, results[2]


class TestCombinedDegradation:
    def test_realistic_sensor_stack(self, clean_scene):
        """Everything at once at moderate levels: the 'cheap webcam' case."""
        cfg, cam, scene, frames, gt_uv, gt_valid, det = clean_scene
        key = jax.random.PRNGKey(11)
        x = degrade.gaussian_blur(frames, 0.7)
        x = degrade.brightness_gradient(x, 0.25)
        x = degrade.vignette(x, 0.25)
        x = degrade.gamma_correct(x, 1.4)
        x = degrade.gaussian_noise(x, 0.03, key)
        out = det.detect(x)
        found, expected, rms, false_ids = _score(out, scene, gt_uv, gt_valid)
        assert found / expected >= 0.9, (found, expected)
        assert rms <= 1.2, rms
        assert false_ids == 0
