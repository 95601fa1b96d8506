"""Homography estimation + tag decoding (detector stages 4-5).

Decode is formulated as a single MXU matmul: each quad's sampled cell
intensities become a +-1 vector which is multiplied against the family's
(4 rotations x N codes) template matrix; the argmax IS the (id, rotation)
decision, and the max score encodes the Hamming distance
(score = D - 2 * hamming). This replaces the C library's per-candidate
rotate-and-lookup loop with one batched contraction over all quads in all
frames at once.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..families import TagFamily
from .quads import QuadCandidates

# Canonical quad-frame corners in lb, rb, rt, lt order (y DOWN, so 'bottom'
# is +y): matches the object-corner order of reference tag_detector.py:35-38.
CANON = np.array([[-1.0, 1.0], [1.0, 1.0], [1.0, -1.0], [-1.0, -1.0]], dtype=np.float32)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ids", "corners", "valid", "hamming", "margin", "homography"],
    meta_fields=[],
)
@dataclass(frozen=True)
class Detections:
    """Padded per-frame detections, sorted by tag id (tag_detector.py:27)."""

    ids: jax.Array  # (B, D) int32, -1 where invalid
    corners: jax.Array  # (B, D, 4, 2) pixel coords in lb-rb-rt-lt order
    valid: jax.Array  # (B, D) bool
    hamming: jax.Array  # (B, D) int32 decode bit errors
    margin: jax.Array  # (B, D) float32 best-vs-second decode margin (bits*2)
    homography: jax.Array  # (B, D, 3, 3) quad frame [-1,1]^2 -> pixels

    @property
    def max_detections(self) -> int:
        return int(self.ids.shape[1])

    def count(self) -> jax.Array:
        return jnp.sum(self.valid, axis=-1)


def homography_from_corners(corners: jax.Array) -> jax.Array:
    """DLT for the 4-point homography quad frame -> pixels.

    corners: (..., 4, 2) in cyclic order aligned with CANON. Returns
    (..., 3, 3) with H[2,2] = 1. Pixel coordinates are centred/scaled before
    solving for float32 conditioning.
    """
    mean = jnp.mean(corners, axis=-2, keepdims=True)
    scale = jnp.mean(jnp.abs(corners - mean), axis=(-2, -1), keepdims=True) + 1e-6
    cn = (corners - mean) / scale

    a = jnp.asarray(CANON[:, 0])
    b = jnp.asarray(CANON[:, 1])
    u = cn[..., 0]
    v = cn[..., 1]
    zeros = jnp.zeros_like(u)
    ones = jnp.ones_like(u)
    # Rows: [a b 1 0 0 0 -u*a -u*b] h = u ; [0 0 0 a b 1 -v*a -v*b] h = v
    r1 = jnp.stack([a * ones, b * ones, ones, zeros, zeros, zeros, -u * a, -u * b], axis=-1)
    r2 = jnp.stack([zeros, zeros, zeros, a * ones, b * ones, ones, -v * a, -v * b], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 8, 8)
    rhs = jnp.concatenate([u, v], axis=-1)[..., None]  # (..., 8, 1)
    h = jnp.linalg.solve(A, rhs)[..., 0]  # (..., 8)
    H = jnp.concatenate([h, jnp.ones_like(h[..., :1])], axis=-1).reshape(h.shape[:-1] + (3, 3))
    # Denormalize: H_px = T @ H where T = [[s,0,mx],[0,s,my],[0,0,1]]
    s = scale[..., 0, 0]
    mx = mean[..., 0, 0]
    my = mean[..., 0, 1]
    row0 = s[..., None] * H[..., 0, :] + mx[..., None] * H[..., 2, :]
    row1 = s[..., None] * H[..., 1, :] + my[..., None] * H[..., 2, :]
    return jnp.stack([row0, row1, H[..., 2, :]], axis=-2)


def apply_homography(H: jax.Array, pts: jax.Array) -> jax.Array:
    """(..., 3, 3) x (..., P, 2) -> (..., P, 2)."""
    p = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    q = jnp.einsum("...ij,...pj->...pi", H, p)
    return q[..., :2] / (q[..., 2:3] + 1e-12)


def bilinear_sample(image: jax.Array, uv: jax.Array) -> jax.Array:
    """Sample (H, W) image at continuous pixel coords (pixel centre at +0.5).

    uv: (..., 2). Returns (...,) values, clamped at borders.
    """
    H, W = image.shape
    x = uv[..., 0] - 0.5
    y = uv[..., 1] - 0.5
    x0 = jnp.clip(jnp.floor(x), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    # Two row-pair gathers instead of four element gathers: the x and x+1
    # neighbours are contiguous, so viewing the image as (H*W/2 - ...) is
    # not possible in general, but gathering 2-wide rows from a (H*W, 1)
    # layout is — pack neighbouring columns: pairs[i] = (flat[i], flat[i+1]).
    flat = image.reshape(-1)
    pairs = jnp.stack([flat, jnp.roll(flat, -1)], axis=-1)  # (H*W, 2)
    top = jnp.take(pairs, y0 * W + x0, axis=0)  # (..., 2) = (i00, i01)
    bot = jnp.take(pairs, (y0 + 1) * W + x0, axis=0)  # (..., 2) = (i10, i11)
    wx = jnp.stack([1 - fx, fx], axis=-1)
    return jnp.sum((top * (1 - fy)[..., None] + bot * fy[..., None]) * wx, axis=-1)


class FamilyTensors:
    """Device-side constants derived from a TagFamily (built once)."""

    def __init__(self, family: TagFamily):
        self.family = family
        tmpl, meta = family.codebook()
        self.templates = jnp.asarray(tmpl)  # (4N, D)
        self.meta = jnp.asarray(meta)  # (4N, 2) (id, rot)
        centers = family.cell_centers_quad_frame()  # (C, C, 2)
        mask = family.sample_mask()
        black, white = family.border_rings()
        self.sample_pts = jnp.asarray(centers.reshape(-1, 2))  # (C*C, 2)
        self.mask_flat = jnp.asarray(mask.reshape(-1).astype(np.float32))
        self.black_flat = jnp.asarray(black.reshape(-1).astype(np.float32))
        self.white_flat = jnp.asarray(white.reshape(-1).astype(np.float32))
        self.mask_idx = jnp.asarray(np.nonzero(mask.reshape(-1))[0].astype(np.int32))
        self.n_codes = family.n_codes
        self.d_bits = int(mask.sum())


def decode_quads(
    gray: jax.Array,  # (B, H, W) full-res grayscale
    quads: QuadCandidates,
    fam: FamilyTensors,
    max_hamming: int = 3,
    min_level_contrast: float = 0.06,
    max_detections: int = 32,
) -> Detections:
    B, Q = quads.valid.shape
    H = homography_from_corners(quads.corners)  # (B, Q, 3, 3)
    uv = apply_homography(H, jnp.broadcast_to(fam.sample_pts, (B, Q) + fam.sample_pts.shape))
    samples = jax.vmap(bilinear_sample)(gray, uv.reshape(B, -1, 2)).reshape(B, Q, -1)

    black = jnp.sum(samples * fam.black_flat, axis=-1) / jnp.sum(fam.black_flat)
    white = jnp.sum(samples * fam.white_flat, axis=-1) / jnp.sum(fam.white_flat)
    mid = 0.5 * (black + white)
    contrast_ok = (white - black) >= min_level_contrast

    bits_all = jnp.where(samples > mid[..., None], 1.0, -1.0)
    bits = jnp.take(bits_all, fam.mask_idx, axis=-1)  # (B, Q, D)
    # +-1 bit correlation: exact in bf16 up to ~256 summed bits of error-free
    # magnitude, and robust to rounding regardless — keep it on the fast MXU
    # path despite the package-wide "highest" matmul precision.
    scores = jnp.einsum(
        "bqd,nd->bqn", bits, fam.templates, precision=jax.lax.Precision.DEFAULT
    )  # (B, Q, 4N)
    top2, top2_idx = jax.lax.top_k(scores, 2)
    best = top2_idx[..., 0]
    margin = top2[..., 0] - top2[..., 1]
    ids = fam.meta[best, 0]
    rots = fam.meta[best, 1]
    hamming = ((fam.d_bits - top2[..., 0]) * 0.5).astype(jnp.int32)

    ok = quads.valid & contrast_ok & (hamming <= max_hamming)

    # Rotate corner order so entry j is the decoded tag's canonical corner j
    # (lb, rb, rt, lt): corner'_j = corner_{(j + rot) mod 4}.
    j = jnp.arange(4)[None, None, :]
    perm = (j + rots[..., None]) % 4
    corners = jnp.take_along_axis(quads.corners, perm[..., None].repeat(2, -1), axis=2)

    # Dedup: among same-id detections in a frame keep the best margin.
    same = (ids[:, :, None] == ids[:, None, :]) & ok[:, :, None] & ok[:, None, :]
    better = (margin[:, None, :] > margin[:, :, None]) | (
        (margin[:, None, :] == margin[:, :, None])
        & (jnp.arange(Q)[None, None, :] < jnp.arange(Q)[None, :, None])
    )
    dup = jnp.any(same & better, axis=-1)
    ok = ok & ~dup

    # Sort by id ascending (invalid last) and truncate to max_detections.
    key = jnp.where(ok, ids, jnp.int32(2**30))
    order = jnp.argsort(key, axis=-1)[:, :max_detections]

    def take(a):
        idx = order
        while idx.ndim < a.ndim:
            idx = idx[..., None]
        return jnp.take_along_axis(a, jnp.broadcast_to(idx, a.shape[:2][:1] + (order.shape[1],) + a.shape[2:]), axis=1)

    ids_o = jnp.take_along_axis(ids, order, axis=1)
    ok_o = jnp.take_along_axis(ok, order, axis=1)
    ham_o = jnp.take_along_axis(hamming, order, axis=1)
    mar_o = jnp.take_along_axis(margin, order, axis=1)
    cor_o = take(corners)
    H_o = take(H)
    return Detections(
        ids=jnp.where(ok_o, ids_o, -1),
        corners=cor_o,
        valid=ok_o,
        hamming=ham_o,
        margin=mar_o,
        homography=H_o,
    )
