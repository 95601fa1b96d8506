"""Analytic ground-truth oracle, batched over tags and camera poses.

Capability parity with the reference GroundTruthCalculator
(ground_truth.py:48-188: camera->tag transform with the OpenGL->CV flip,
inverse transform = camera pose in a tag's frame, tag distances/visibility),
generalized in two ways the reference lacks:

* fully batched: one call produces transforms for ALL tags x ALL camera poses;
* correct under camera *rotation* (the reference's GT silently assumes an
  unrotated camera: ground_truth.py:71 subtracts positions only; with zero
  rotation our formulas reduce to exactly the reference's).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import (
    camera_euler_to_matrix,
    euler_zyx_to_matrix,
    make_se3,
    se3_inverse,
)
from ..geometry.camera import GL_TO_CV_FLIP


def tag_world_rotations(tag_rot_deg: jax.Array) -> jax.Array:
    """Tag GL-world rotation matrices from config Euler [rx, ry, rz] degrees.

    The renderer applies Z then Y then X (renderer.py:232-237), i.e.
    ``R = Rz(rz) @ Ry(ry) @ Rx(rx)`` — identical to euler_zyx_to_matrix.
    """
    return euler_zyx_to_matrix(tag_rot_deg)


def camera_world_rotation(cam_rot_deg: jax.Array) -> jax.Array:
    """Camera GL-world rotation from [pitch, yaw, roll] degrees
    (camera_controller.py:163-194: ``Ry @ Rx @ Rz``)."""
    return camera_euler_to_matrix(cam_rot_deg)


def camera_to_tag_transforms(
    tag_pos: jax.Array,  # (T, 3) GL world
    tag_rot_deg: jax.Array,  # (T, 3)
    cam_pos: jax.Array,  # (..., 3) GL world
    cam_rot_deg: jax.Array | None = None,  # (..., 3) [pitch, yaw, roll]
) -> jax.Array:
    """T_cam_tag in the CV camera frame: (..., T, 4, 4).

    What PnP should estimate when viewing each tag (ground_truth.py:48-90,
    extended with camera rotation). Columns of R are the tag's axes in the CV
    camera frame; t is the tag centre.
    """
    flip = jnp.asarray(GL_TO_CV_FLIP, dtype=tag_pos.dtype)
    R_tag = tag_world_rotations(tag_rot_deg)  # (T, 3, 3)
    rel_gl = tag_pos - cam_pos[..., None, :]  # (..., T, 3)
    if cam_rot_deg is not None:
        R_cam = camera_world_rotation(cam_rot_deg)  # (..., 3, 3)
        rel_gl = jnp.einsum("...ji,...tj->...ti", R_cam, rel_gl)
        R_tag_eye = jnp.einsum("...ji,tjk->...tik", R_cam, R_tag)
    else:
        R_tag_eye = jnp.broadcast_to(R_tag, cam_pos.shape[:-1] + R_tag.shape)
    rel_cv = jnp.einsum("ij,...tj->...ti", flip, rel_gl)
    R_cv = jnp.einsum("ij,...tjk->...tik", flip, R_tag_eye)
    return make_se3(R_cv, rel_cv)


def camera_in_tag_frames(
    tag_pos: jax.Array,
    tag_rot_deg: jax.Array,
    cam_pos: jax.Array,
    cam_rot_deg: jax.Array | None = None,
) -> jax.Array:
    """Inverse transforms: camera pose in each tag's frame (..., T, 4, 4).

    This is the ground truth the SLAM pose estimate is compared against
    (ground_truth.py:146-188, used at simulation_engine.py:255-257).
    """
    return se3_inverse(camera_to_tag_transforms(tag_pos, tag_rot_deg, cam_pos, cam_rot_deg))


def tag_distances_from_camera(tag_pos: jax.Array, cam_pos: jax.Array) -> jax.Array:
    """(..., T) Euclidean distances (ground_truth.py:302-318)."""
    return jnp.linalg.norm(tag_pos - cam_pos[..., None, :], axis=-1)


def tag_to_tag_distance(tag_pos: jax.Array, i: int, j: int) -> jax.Array:
    """World distance between two tags (ground_truth.py:116-144; camera
    position cancels in the reference formula)."""
    return jnp.linalg.norm(tag_pos[i] - tag_pos[j], axis=-1)


def closest_tag(tag_pos: jax.Array, cam_pos: jax.Array) -> tuple[jax.Array, jax.Array]:
    d = tag_distances_from_camera(tag_pos, cam_pos)
    idx = jnp.argmin(d, axis=-1)
    return idx, jnp.take_along_axis(d, idx[..., None], axis=-1)[..., 0]


def visibility_by_distance(
    tag_pos: jax.Array, cam_pos: jax.Array, max_distance: float = 10.0
) -> jax.Array:
    """(..., T) bool visibility gate (ground_truth.py:340-359)."""
    return tag_distances_from_camera(tag_pos, cam_pos) <= max_distance


def tags_unoccluded(
    tag_pos: jax.Array,  # (T, 3) GL world
    tag_rot_deg: jax.Array,  # (T, 3)
    cam_pos: jax.Array,  # (B, 3)
    inner_size: float,
    outer_half: float,
    eps: float = 1e-3,
) -> jax.Array:
    """(B, T) bool: no OTHER tag's rendered quad blocks the camera's view of
    any of this tag's 5 sample points (inner-border corners + centre).

    The analytic corner oracle (project_border_corners) has no occlusion
    model, but the z-buffered rasterizer does — a test that scores detection
    against the raw oracle "expects" tags the renderer correctly hid behind
    nearer tags. This closes that gap analytically: segment-vs-quad
    intersection against every other tag's OUTER quad, batched.
    """
    T = tag_pos.shape[0]
    R_w_tag = tag_world_rotations(tag_rot_deg)  # (T, 3, 3)
    half = inner_size / 2.0
    local = jnp.asarray(
        [
            [-half, -half, 0.0],
            [half, -half, 0.0],
            [half, half, 0.0],
            [-half, half, 0.0],
            [0.0, 0.0, 0.0],
        ],
        dtype=tag_pos.dtype,
    )  # (5, 3)
    # Sample points on each tag, world frame: (T, 5, 3)
    P = jnp.einsum("tij,pj->tpi", R_w_tag, local) + tag_pos[:, None, :]

    n = R_w_tag[:, :, 2]  # (S, 3) occluder plane normals
    C = cam_pos  # (B, 3)
    # Ray C -> P[t, p]; occluder s: plane (tag_pos[s], n[s]).
    d = P[None, :, :, :] - C[:, None, None, :]  # (B, T, 5, 3)
    num = jnp.einsum("si,si->s", n, tag_pos)[None, :] - jnp.einsum(
        "si,bi->bs", n, C
    )  # (B, S): dot(n_s, p_s - C)
    den = jnp.einsum("si,btpi->btps", n, d)  # (B, T, 5, S)
    tau = num[:, None, None, :] / jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
    hit = C[:, None, None, None, :] + tau[..., None] * d[:, :, :, None, :]  # (B,T,5,S,3)
    # Local occluder coords need R^T (world->tag). The "sji" index order
    # already transposes, so the operand must be R itself — feeding the
    # pre-swapped R^T here double-transposed back to R and evaluated the
    # inside-quad test in the wrong frame for rotated occluders.
    q = jnp.einsum("sji,btpsj->btpsi", R_w_tag, hit - tag_pos[None, None, None, :, :])
    inside = (jnp.abs(q[..., 0]) <= outer_half) & (jnp.abs(q[..., 1]) <= outer_half)
    blocking = inside & (tau > eps) & (tau < 1.0 - eps) & (jnp.abs(den) >= 1e-9)
    # A tag never occludes itself.
    not_self = ~jnp.eye(T, dtype=bool)[None, :, None, :]
    blocked = jnp.any(blocking & not_self, axis=(-1, -2))  # (B, T)
    return ~blocked
