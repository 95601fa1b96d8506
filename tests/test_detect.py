"""Detection pipeline tests: stages against oracles, then end-to-end on
rendered scenes with analytic corner ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aprilslam_tpu.detect import (
    to_grayscale,
    adaptive_threshold,
    connected_components,
    quad_candidates,
    homography_from_corners,
    apply_homography,
    bilinear_sample,
    TagDetector,
    DetectorParams,
)
from aprilslam_tpu.geometry import PinholeCamera
from aprilslam_tpu.sim import (
    SceneConfig,
    scene_tensors,
    render_frames,
    project_border_corners,
)


class TestThreshold:
    def test_trinary_classes(self):
        img = np.full((1, 64, 64), 0.5, np.float32)
        img[0, 8:24, 8:24] = 0.05  # black square
        img[0, 8:24, 32:48] = 0.95  # white square
        tri = np.asarray(adaptive_threshold(jnp.asarray(img), tile=4, min_contrast=0.1))
        assert tri[0, 9, 9] == 0  # black near its edge
        assert tri[0, 9, 33] == 1  # white near its edge
        assert tri[0, 60, 60] == -1  # flat region -> unknown
        # deep interior of a LARGE uniform region is unknown too (no local
        # contrast) — matching the C detector's low-contrast skip semantics

    def test_grayscale_bgr(self):
        bgr = np.zeros((1, 4, 4, 3), np.uint8)
        bgr[..., 1] = 255  # pure green
        g = np.asarray(to_grayscale(jnp.asarray(bgr)))
        assert abs(g[0, 0, 0] - 0.587) < 1e-3


class TestCCL:
    def test_two_components(self):
        tri = -np.ones((1, 32, 32), np.int8)
        tri[0, 4:12, 4:12] = 0
        tri[0, 20:28, 20:28] = 0
        labels = np.asarray(connected_components(jnp.asarray(tri)))
        l1 = labels[0, 4:12, 4:12]
        l2 = labels[0, 20:28, 20:28]
        assert len(np.unique(l1)) == 1
        assert len(np.unique(l2)) == 1
        assert l1[0, 0] != l2[0, 0]
        assert labels[0, 0, 0] == 32 * 32  # unknown sentinel

    def test_ring_component(self):
        """An annulus (like a tag border ring) must become ONE component."""
        tri = -np.ones((1, 48, 48), np.int8)
        tri[0, 8:40, 8:40] = 0
        tri[0, 16:32, 16:32] = 1  # inner white square -> ring of black
        labels = np.asarray(connected_components(jnp.asarray(tri)))
        ring = (tri[0] == 0)
        assert len(np.unique(labels[0][ring])) == 1
        inner = (tri[0] == 1)
        assert len(np.unique(labels[0][inner])) == 1

    def test_different_colors_not_merged(self):
        tri = np.zeros((1, 16, 16), np.int8)
        tri[0, :, 8:] = 1
        labels = np.asarray(connected_components(jnp.asarray(tri)))
        assert labels[0, 0, 0] != labels[0, 0, 15]


class TestQuadFit:
    def _make_square(self, c=(32, 32), half=20, angle=0.0):
        """Synthetic trinary image with a rotated black square on white."""
        H = W = 64
        yy, xx = np.mgrid[0:H, 0:W]
        ca, sa = np.cos(angle), np.sin(angle)
        u = (xx + 0.5 - c[0]) * ca + (yy + 0.5 - c[1]) * sa
        v = -(xx + 0.5 - c[0]) * sa + (yy + 0.5 - c[1]) * ca
        inside = (np.abs(u) < half) & (np.abs(v) < half)
        tri = np.ones((1, H, W), np.int8)
        tri[0][inside] = 0
        gray = np.where(inside, 0.0, 1.0)[None].astype(np.float32)
        return tri, gray

    def test_axis_aligned_square(self):
        tri, gray = self._make_square()
        labels = connected_components(jnp.asarray(tri))
        quads = quad_candidates(
            jnp.asarray(tri), labels, jnp.asarray(gray), 1,
            min_cluster_pts=16, max_quads=8,
        )
        valid = np.asarray(quads.valid)[0]
        assert valid.sum() >= 1
        qi = np.argmax(valid)
        corners = np.asarray(quads.corners)[0, qi]
        expected = {(12.0, 12.0), (52.0, 12.0), (12.0, 52.0), (52.0, 52.0)}
        for corner in corners:
            best = min(expected, key=lambda e: np.hypot(e[0] - corner[0], e[1] - corner[1]))
            assert np.hypot(best[0] - corner[0], best[1] - corner[1]) < 1.0, corners

    def test_rotated_square_subpixel(self):
        tri, gray = self._make_square(angle=np.radians(25))
        labels = connected_components(jnp.asarray(tri))
        quads = quad_candidates(
            jnp.asarray(tri), labels, jnp.asarray(gray), 1,
            min_cluster_pts=16, max_quads=8,
        )
        valid = np.asarray(quads.valid)[0]
        assert valid.sum() >= 1
        qi = np.argmax(valid)
        corners = np.asarray(quads.corners)[0, qi]
        # True corners of the rotated square
        half, c = 20, (32, 32)
        ca, sa = np.cos(np.radians(25)), np.sin(np.radians(25))
        true = []
        for sx, sy in [(-1, -1), (1, -1), (1, 1), (-1, 1)]:
            u, v = sx * half, sy * half
            true.append((c[0] + u * ca - v * sa, c[1] + u * sa + v * ca))
        for corner in corners:
            d = min(np.hypot(t[0] - corner[0], t[1] - corner[1]) for t in true)
            assert d < 1.0, (corners, true)

    def test_corner_winding_descending_angle(self):
        tri, gray = self._make_square()
        labels = connected_components(jnp.asarray(tri))
        quads = quad_candidates(
            jnp.asarray(tri), labels, jnp.asarray(gray), 1,
            min_cluster_pts=16, max_quads=8,
        )
        qi = np.argmax(np.asarray(quads.valid)[0])
        corners = np.asarray(quads.corners)[0, qi]
        ctr = corners.mean(axis=0)
        ang = np.arctan2(corners[:, 1] - ctr[1], corners[:, 0] - ctr[0])
        diffs = np.diff(np.unwrap(ang))
        assert np.all(diffs < 0)  # descending = lb->rb->rt->lt handedness


class TestHomography:
    def test_dlt_roundtrip(self, rng):
        src = np.asarray([[-1, 1], [1, 1], [1, -1], [-1, -1]], np.float32)
        Htrue = np.array([[120, 8, 500], [-5, 110, 480], [0.0002, -0.0001, 1.0]], np.float32)

        def apply(H, p):
            q = H @ np.append(p, 1.0)
            return q[:2] / q[2]

        corners = np.stack([apply(Htrue, p) for p in src])
        H = np.asarray(homography_from_corners(jnp.asarray(corners[None]))[0])
        for p in [(-0.5, 0.3), (0.9, -0.9), (0.0, 0.0), (1.6, 1.6)]:
            got = np.asarray(apply_homography(jnp.asarray(H)[None], jnp.asarray([[p]], dtype=jnp.float32))[0, 0])
            want = apply(Htrue, np.asarray(p, np.float32))
            np.testing.assert_allclose(got, want, atol=0.05)

    def test_bilinear_sample(self):
        img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
        # pixel centres: value at (col+0.5, row+0.5)
        v = float(bilinear_sample(img, jnp.asarray([1.5, 2.5])))
        assert abs(v - img[2, 1]) < 1e-5
        v2 = float(bilinear_sample(img, jnp.asarray([2.0, 2.5])))
        assert abs(v2 - 0.5 * (img[2, 1] + img[2, 2])) < 1e-5


@pytest.fixture(scope="module")
def rendered_scene():
    cfg = SceneConfig.from_file()
    cam = PinholeCamera.from_fov(640, 640, cfg.fov_y)
    scene = scene_tensors(cfg)
    pos = jnp.asarray([[0.0, 0.0, 10.0], [10.0, 2.0, 0.0]], dtype=jnp.float32)
    rot = jnp.zeros((2, 3), jnp.float32)
    frames = render_frames(scene, pos, rot, jnp.asarray(cam.inv_matrix), 640, 640, 2)
    gt_uv, gt_valid = project_border_corners(scene, pos, rot, jnp.asarray(cam.matrix))
    return cfg, cam, scene, frames, np.asarray(gt_uv), np.asarray(gt_valid), pos


class TestEndToEnd:
    def test_detects_visible_tags_with_correct_ids(self, rendered_scene):
        cfg, cam, scene, frames, gt_uv, gt_valid, pos = rendered_scene
        det = TagDetector(cfg.family, DetectorParams(quad_decimate=1))
        out = det.detect(frames)
        ids = np.asarray(out.ids)
        valid = np.asarray(out.valid)
        # Determine which tags are actually fully in view for frame 0
        in_view = []
        for t in range(gt_uv.shape[1]):
            uv = gt_uv[0, t]
            if gt_valid[0, t] and uv.min() > 8 and uv.max() < 632:
                in_view.append(int(np.asarray(scene.tag_ids)[t]))
        got = sorted(ids[0][valid[0]].tolist())
        for tid in in_view:
            assert tid in got, f"tag {tid} not detected; got {got}"
        # No false ids
        scene_ids = set(np.asarray(scene.tag_ids).tolist())
        assert set(got) <= scene_ids

    def test_corner_accuracy_subpixel(self, rendered_scene):
        cfg, cam, scene, frames, gt_uv, gt_valid, pos = rendered_scene
        det = TagDetector(cfg.family, DetectorParams(quad_decimate=1))
        out = det.detect(frames)
        ids = np.asarray(out.ids)
        valid = np.asarray(out.valid)
        corners = np.asarray(out.corners)
        tag_ids = np.asarray(scene.tag_ids)
        errs = []
        for b in range(2):
            for d in range(ids.shape[1]):
                if not valid[b, d]:
                    continue
                t = int(np.where(tag_ids == ids[b, d])[0][0])
                if not gt_valid[b, t]:
                    continue
                err = np.linalg.norm(corners[b, d] - gt_uv[b, t], axis=-1)
                errs.append(err.max())
        assert errs, "no detections to check"
        errs = np.asarray(errs)
        # Corner error: subpixel on average, < 2 px worst-case
        assert errs.mean() < 1.0, errs
        assert errs.max() < 2.0, errs

    def test_decimate2_still_detects(self, rendered_scene):
        cfg, cam, scene, frames, gt_uv, gt_valid, pos = rendered_scene
        det = TagDetector(cfg.family, DetectorParams(quad_decimate=2, min_cluster_pts=12))
        out = det.detect(frames)
        assert int(np.asarray(out.count())[0]) >= 1

    def test_detections_sorted_by_id(self, rendered_scene):
        cfg, cam, scene, frames, *_ = rendered_scene
        det = TagDetector(cfg.family, DetectorParams(quad_decimate=1))
        out = det.detect(frames)
        ids = np.asarray(out.ids)
        valid = np.asarray(out.valid)
        for b in range(ids.shape[0]):
            vids = ids[b][valid[b]]
            assert np.all(np.diff(vids) > 0)

    def test_empty_scene_no_detections(self):
        frames = jnp.full((1, 256, 256), 0.3, jnp.float32)
        det = TagDetector("tagStandard41h12", DetectorParams(quad_decimate=1))
        out = det.detect(frames)
        assert int(np.asarray(out.count())[0]) == 0

    def test_tag36h11_roundtrip(self):
        """Render a tag36h11 scene and detect it with the same pipeline."""
        raw = {
            "display_width": 512, "display_height": 512, "fov_y": 45,
            "near_clip": 0.1, "far_clip": 300.0, "size_scale": 2,
            "tag_size_inner": 5, "tag_size_outer": 6.25, "actual_size_in_mm": 55.6,
            "family": "tag36h11",
            "tags": [
                {"id": 17, "position": [0, 0, -40], "rotation": [0, 0, 0]},
                {"id": 123, "position": [18, 4, -55], "rotation": [0, 15, 5]},
            ],
        }
        cfg = SceneConfig.from_dict(raw)
        cam = PinholeCamera.from_fov(512, 512, 45.0)
        scene = scene_tensors(cfg)
        frames = render_frames(
            scene, jnp.zeros((1, 3), jnp.float32), jnp.zeros((1, 3), jnp.float32),
            jnp.asarray(cam.inv_matrix), 512, 512, 2,
        )
        det = TagDetector("tag36h11", DetectorParams(quad_decimate=1))
        out = det.detect(frames)
        got = sorted(np.asarray(out.ids)[0][np.asarray(out.valid)[0]].tolist())
        assert got == [17, 123], got


class TestBoundaryCompaction:
    def test_two_level_search_matches_nonzero_reference(self, rng):
        """_compact (two-level bisect over the valid cumsum) must match
        first-k-valid semantics exactly, including overflow, empty, full,
        and N not a multiple of the coarse block (regression: one bisect
        step short returned block-boundary-minus-one indices)."""
        from aprilslam_tpu.detect.quads import _compact, _BIG

        for N, K, p in [(4999, 256, 0.02), (4999, 256, 0.5), (4999, 256, 0.0),
                        (4999, 256, 1.0), (100, 256, 0.3)]:
            valid = rng.random(N) < p
            ka = np.where(valid, rng.integers(0, 1000, N), int(_BIG)).astype(np.int32)
            kb = rng.integers(0, 1000, N).astype(np.int32)
            x = rng.random(N).astype(np.float32)
            y = rng.random(N).astype(np.float32)
            w = rng.random(N).astype(np.float32)
            got = [np.asarray(a) for a in _compact(
                *map(jnp.asarray, (ka, kb, x, y, w)), K)]
            idx = np.nonzero(valid)[0][:K]
            n = len(idx)
            exp_ka = np.full(K, int(_BIG), np.int32)
            exp_ka[:n] = ka[idx]
            exp_w = np.zeros(K, np.float32)
            exp_w[:n] = w[idx]
            np.testing.assert_array_equal(got[0], exp_ka, err_msg=f"{N},{K},{p}")
            np.testing.assert_array_equal(got[1][:n], kb[idx])
            assert np.allclose(got[2][:n], x[idx]) and np.allclose(got[3][:n], y[idx])
            assert np.allclose(got[4], exp_w)
