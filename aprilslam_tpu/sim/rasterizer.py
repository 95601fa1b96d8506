"""Batched on-device tag rasterizer: the TPU-native renderer + frame capture.

Replaces the reference's OpenGL fixed-function pipeline + glReadPixels
readback (renderer.py:197-274) — the measured bottleneck of the reference
(GPU->CPU readback per frame). Here frames never leave the device: the
renderer is a jittable function producing a whole batch of grayscale frames
directly in HBM, which the detector consumes in place.

Method: each tag is a textured plane; for every pixel ray the plane-induced
inverse homography ``G = [r0 r1 t]^-1 K^-1`` maps pixel homogeneous
coordinates straight to tag-local coordinates, the cell grid is point-sampled
(optionally supersampled for antialiasing), and a z-buffer test across tags
resolves occlusion (vs painter's algorithm at renderer.py:213). All math is in
the CV camera frame (y down, z forward); the GL->CV flip happens inside
camera_to_tag_transforms, so rendered frames match what the reference's
capture_frame() + BGR2GRAY would produce for the same scene.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..families import TagFamily, get_family
from ..geometry import PinholeCamera
from .config import SceneConfig
from .ground_truth import camera_to_tag_transforms


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["textures", "tag_pos", "tag_rot", "tag_ids"],
    meta_fields=["outer_half", "inner_size", "background", "near_clip", "far_clip"],
)
@dataclass(frozen=True)
class SceneTensors:
    """Device-ready scene arrays (static shapes; T = number of tags)."""

    textures: jax.Array  # (T, C, C) float32 cell grids in [0, 1]
    tag_pos: jax.Array  # (T, 3) GL world
    tag_rot: jax.Array  # (T, 3) degrees
    tag_ids: jax.Array  # (T,) int32 family ids
    outer_half: float  # rendered quad half-size (sim units)
    inner_size: float  # detected border square size (PnP tag_size)
    background: float
    near_clip: float
    far_clip: float

    @property
    def num_tags(self) -> int:
        return int(self.textures.shape[0])

    @property
    def cells(self) -> int:
        return int(self.textures.shape[1])


def scene_tensors(config: SceneConfig, family: TagFamily | None = None) -> SceneTensors:
    family = family or get_family(config.family)
    ids = config.tag_ids()
    textures = family.grids[ids].astype(np.float32)
    return SceneTensors(
        textures=jnp.asarray(textures),
        tag_pos=jnp.asarray(config.tag_positions()),
        tag_rot=jnp.asarray(config.tag_rotations()),
        tag_ids=jnp.asarray(ids),
        outer_half=config.tag_size_outer / 2.0,
        inner_size=config.tag_size_inner,
        background=config.background,
        near_clip=config.near_clip,
        far_clip=config.far_clip,
    )


@partial(jax.jit, static_argnames=("height", "width", "supersample"))
def render_frames(
    scene: SceneTensors,
    cam_pos: jax.Array,  # (B, 3) GL world
    cam_rot: jax.Array,  # (B, 3) [pitch, yaw, roll] deg
    K_inv: jax.Array,  # (3, 3)
    height: int,
    width: int,
    supersample: int = 2,
) -> jax.Array:
    """Render (B, height, width) float32 grayscale frames in [0, 1]."""
    B = cam_pos.shape[0]
    T = scene.num_tags
    C = scene.cells
    h = scene.outer_half
    dtype = jnp.float32
    cam_pos = cam_pos.astype(dtype)
    cam_rot = cam_rot.astype(dtype)
    K_inv = K_inv.astype(dtype)

    T_cam_tag = camera_to_tag_transforms(scene.tag_pos, scene.tag_rot, cam_pos, cam_rot)
    R = T_cam_tag[..., :3, :3]  # (B, T, 3, 3)
    t = T_cam_tag[..., :3, 3]  # (B, T, 3)
    # Plane-induced homography H = [r0 | r1 | t] maps (a, b, 1) -> ray dir.
    Hmat = jnp.stack([R[..., :, 0], R[..., :, 1], t], axis=-1)  # (B, T, 3, 3)
    G = jnp.linalg.inv(Hmat) @ K_inv  # (B, T, 3, 3) pixel -> tag local

    flat_tex = scene.textures.reshape(T, C * C)  # (T, C*C)

    row_v = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    col_u = jax.lax.broadcasted_iota(dtype, (height, width), 1)

    def sample_offset(du: float, dv: float) -> jax.Array:
        u = col_u + du
        v = row_v + dv

        def body(ti, carry):
            best_val, best_depth = carry
            Gt = G[:, ti]  # (B, 3, 3)
            q0 = Gt[:, 0, 0, None, None] * u + Gt[:, 0, 1, None, None] * v + Gt[:, 0, 2, None, None]
            q1 = Gt[:, 1, 0, None, None] * u + Gt[:, 1, 1, None, None] * v + Gt[:, 1, 2, None, None]
            q2 = Gt[:, 2, 0, None, None] * u + Gt[:, 2, 1, None, None] * v + Gt[:, 2, 2, None, None]
            inv_q2 = jnp.where(jnp.abs(q2) < 1e-12, 0.0, 1.0 / q2)
            a = q0 * inv_q2
            b = q1 * inv_q2
            Rt = R[:, ti]
            tt = t[:, ti]
            depth = (
                a * Rt[:, 2, 0, None, None] + b * Rt[:, 2, 1, None, None] + tt[:, 2, None, None]
            )
            inside = (jnp.abs(a) <= h) & (jnp.abs(b) <= h)
            valid = inside & (depth > scene.near_clip) & (depth < scene.far_clip) & (q2 != 0.0)
            # Tag-local -> cell index. Local +b (tag-frame y up) is grid row 0.
            colf = jnp.clip(jnp.floor((a + h) / (2 * h) * C), 0, C - 1)
            rowf = jnp.clip(jnp.floor((h - b) / (2 * h) * C), 0, C - 1)
            idx = (rowf * C + colf).astype(jnp.int32)
            val = jnp.take(flat_tex[ti], idx, axis=0)
            closer = valid & (depth < best_depth)
            return (
                jnp.where(closer, val, best_val),
                jnp.where(closer, depth, best_depth),
            )

        init = (
            jnp.full((B, height, width), scene.background, dtype),
            jnp.full((B, height, width), jnp.inf, dtype),
        )
        best_val, _ = jax.lax.fori_loop(0, T, body, init)
        return best_val

    ss = supersample
    acc = jnp.zeros((B, height, width), dtype)
    for i in range(ss):
        for j in range(ss):
            acc = acc + sample_offset((j + 0.5) / ss, (i + 0.5) / ss)
    return acc / (ss * ss)


def project_border_corners(
    scene: SceneTensors,
    cam_pos: jax.Array,  # (B, 3)
    cam_rot: jax.Array,  # (B, 3)
    K: jax.Array,  # (3, 3)
) -> tuple[jax.Array, jax.Array]:
    """Analytic pixel positions of each tag's detected-border corners.

    Returns (corners (B, T, 4, 2) in 'lb-rb-rt-lt' order, valid (B, T) bool).
    This is the oracle the detector's corner output is regression-tested
    against (what the C apriltag detector reports for a rendered frame).
    """
    half = scene.inner_size / 2.0
    local = jnp.asarray(
        [[-half, -half, 0.0], [half, -half, 0.0], [half, half, 0.0], [-half, half, 0.0]],
        dtype=jnp.float32,
    )
    T_cam_tag = camera_to_tag_transforms(scene.tag_pos, scene.tag_rot, cam_pos, cam_rot)
    R = T_cam_tag[..., :3, :3]
    t = T_cam_tag[..., :3, 3]
    pts = jnp.einsum("btij,cj->btci", R, local) + t[:, :, None, :]  # (B, T, 4, 3)
    z = pts[..., 2]
    uv = jnp.stack(
        [
            K[0, 0] * pts[..., 0] / z + K[0, 2],
            K[1, 1] * pts[..., 1] / z + K[1, 2],
        ],
        axis=-1,
    )
    valid = jnp.all(z > scene.near_clip, axis=-1)
    return uv, valid


def render_sequence(
    config: SceneConfig,
    positions: np.ndarray,
    rotations: np.ndarray,
    camera: PinholeCamera | None = None,
    batch: int = 8,
    supersample: int = 2,
):
    """Convenience host-side generator yielding rendered frame batches."""
    camera = camera or PinholeCamera.from_fov(
        config.display_width, config.display_height, config.fov_y
    )
    scene = scene_tensors(config)
    K_inv = jnp.asarray(camera.inv_matrix)
    n = (len(positions) // batch) * batch
    for s in range(0, n, batch):
        yield render_frames(
            scene,
            jnp.asarray(positions[s : s + batch]),
            jnp.asarray(rotations[s : s + batch]),
            K_inv,
            camera.height,
            camera.width,
            supersample,
        )
