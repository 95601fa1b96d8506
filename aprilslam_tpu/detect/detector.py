"""TagDetector: the end-to-end batched detection pipeline.

Capability parity with the reference TagDetector.detect
(tag_detector.py:23-28: grayscale -> C-library detect -> detections sorted by
id) — but batched over frames and fully on-device: threshold -> connected
components -> boundary clustering -> quad fit -> decode, all inside one jit.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax

from ..families import TagFamily, get_family
from .threshold import to_grayscale, decimate, adaptive_threshold_with_levels
from .segment import connected_components, connected_components_auto
from .quads import quad_candidates
from .decode import decode_quads, Detections, FamilyTensors
from .refine import refine_corners


@dataclass(frozen=True)
class DetectorParams:
    """Static pipeline configuration (fixed at trace time)."""

    quad_decimate: int = 2
    tile: int = 4
    min_contrast: float = 0.08
    scan_iters: int = 4
    jump_iters: int = 2
    max_clusters: int = 128
    max_quads: int = 32
    pts_per_quad: int = 128
    min_cluster_pts: int = 20
    min_side: float = 3.0
    refine_iters: int = 2
    max_fit_err: float = 0.8
    max_hamming: int = 3
    min_level_contrast: float = 0.06
    max_detections: int = 32
    max_boundary: int = 16384
    refine_edges: bool = True
    refine_samples: int = 12
    refine_range: float = 2.0


def detect_fn(family: str | TagFamily = "tagStandard41h12",
              params: DetectorParams | None = None):
    """Build the detection function ``f(frames) -> Detections``.

    All family constants are baked in as jit constants; the returned function
    is jit-compatible and composes into larger jitted pipelines (e.g. the
    full render->detect->SLAM step).
    """
    fam = get_family(family) if isinstance(family, str) else family
    ft = FamilyTensors(fam)
    p = params or DetectorParams()

    def run(frames: jax.Array) -> Detections:
        # named_scope per stage: the scopes land in the HLO op_name
        # metadata, which is what tools/profile_step.py joins xprof device
        # time against — without them quads/decode/refine ops are
        # indistinguishable inside the fused program.
        with jax.named_scope("stage_threshold"):
            gray = to_grayscale(frames)
            dec = decimate(gray, p.quad_decimate)
            trinary, level = adaptive_threshold_with_levels(
                dec, tile=p.tile, min_contrast=p.min_contrast
            )
        with jax.named_scope("stage_ccl"):
            labels = connected_components_auto(trinary, p.scan_iters, p.jump_iters)
        with jax.named_scope("stage_quads"):
            quads = quad_candidates(
                trinary,
                labels,
                dec,
                p.quad_decimate,
                level,
                max_clusters=p.max_clusters,
                max_quads=p.max_quads,
                pts_per_quad=p.pts_per_quad,
                min_cluster_pts=p.min_cluster_pts,
                min_side=p.min_side,
                refine_iters=p.refine_iters,
                max_fit_err=p.max_fit_err,
                max_boundary=p.max_boundary,
            )
        with jax.named_scope("stage_decode"):
            det = decode_quads(
                gray,
                quads,
                ft,
                max_hamming=p.max_hamming,
                min_level_contrast=p.min_level_contrast,
                max_detections=p.max_detections,
            )
        if p.refine_edges and p.quad_decimate > 1:
            # Quad corners were fit at decimated resolution; re-localize the
            # edges on the full-res frame (apriltag's refine_edges stage).
            from dataclasses import replace as _dc_replace

            with jax.named_scope("stage_refine"):
                refined = refine_corners(
                    gray, det.corners, det.valid,
                    ns=p.refine_samples, half_range=p.refine_range,
                )
            det = _dc_replace(det, corners=refined)
        return det

    return run


class TagDetector:
    """Batched AprilTag detector for a single family.

    Usage::

        det = TagDetector("tagStandard41h12")
        detections = det.detect(frames)   # frames (B, H, W) or (B, H, W, 3)
    """

    def __init__(self, family: str | TagFamily = "tagStandard41h12",
                 params: DetectorParams | None = None):
        self.family = get_family(family) if isinstance(family, str) else family
        self.params = params or DetectorParams()
        self._fn = jax.jit(detect_fn(self.family, self.params))

    def detect(self, frames) -> Detections:
        """(B, H, W[, 3]) frames -> Detections sorted by id per frame."""
        return self._fn(frames)
