"""Full-resolution edge refinement of detected tag corners.

The quad stage fits corners on the DECIMATED image (quads.py), which at
quad_decimate=2 carries ~2x the corner noise of the raw frame. The AprilTag C
library fixes this with ``refine_edges``: re-localize each quad edge on the
full-resolution image using the intensity gradient along the edge normal,
then re-fit the 4 edge lines and intersect them. This module is the batched
TPU formulation:

* sample ``ns`` points along each edge (away from the corners),
* for each, probe the full-res gray along the edge normal (fixed tap comb,
  bilinear gathers) and take the |gradient|-weighted mean offset — the
  subpixel edge crossing,
* weighted total-least-squares line per edge, corners = adjacent-line
  intersections. Fixed shapes, no data-dependent control flow: one vmap over
  (frame, detection).

Everything degrades gracefully: weak-gradient samples get ~zero weight, and
a refined corner that moved implausibly far falls back to the input corner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .decode import bilinear_sample


def refine_corners(
    gray: jax.Array,  # (B, H, W) full-resolution grayscale
    corners: jax.Array,  # (B, D, 4, 2) cyclic quad corners, full-res px
    valid: jax.Array,  # (B, D) bool
    ns: int = 12,
    half_range: float = 2.0,
    taps: int = 9,
    max_shift: float = 3.0,
) -> jax.Array:
    """Refine quad corners on the full-res image. Returns (B, D, 4, 2)."""
    u = jnp.linspace(0.12, 0.88, ns, dtype=gray.dtype)

    def edge_probe(g, pts, nrm, hr, ntaps):
        """|grad|-weighted subpixel edge offset along nrm at each pt."""
        t = jnp.linspace(-hr, hr, ntaps, dtype=gray.dtype)
        samp = pts[:, :, None, :] + nrm[:, None, None, :] * t[None, None, :, None]
        vals = bilinear_sample(g, samp)  # (4, ns, ntaps)
        grad = vals[..., 2:] - vals[..., :-2]  # central differences
        gw = jnp.abs(grad)
        tc = t[1:-1]
        wsum = jnp.sum(gw, axis=-1)
        toff = jnp.sum(gw * tc, axis=-1) / (wsum + 1e-9)  # (4, ns)
        return toff, wsum

    def per_quad(g, c4):
        p0 = c4  # (4, 2)
        p1 = jnp.roll(c4, -1, axis=0)
        e = p1 - p0
        elen = jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-9
        nrm = jnp.stack([-e[:, 1], e[:, 0]], axis=-1) / elen  # (4, 2)
        pts = p0[:, None, :] + e[:, None, :] * u[None, :, None]  # (4, ns, 2)
        # Two-pass probe: a coarse pass centres the comb on the edge, a fine
        # pass (quarter-pixel taps) measures it — comb-placement quantization
        # otherwise dominates the subpixel error.
        toff, _ = edge_probe(g, pts, nrm, half_range, taps)
        pts1 = pts + nrm[:, None, :] * toff[..., None]
        toff2, wsum = edge_probe(g, pts1, nrm, 0.75, 7)
        newpts = pts1 + nrm[:, None, :] * toff2[..., None]  # (4, ns, 2)
        sw = wsum  # sample weight = total gradient mass

        # Weighted TLS line fit per edge.
        swsum = jnp.sum(sw, axis=-1, keepdims=True) + 1e-9
        mu = jnp.sum(newpts * sw[..., None], axis=1) / swsum  # (4, 2)
        d = newpts - mu[:, None, :]
        a = jnp.sum(sw * d[..., 0] ** 2, axis=1)
        b = jnp.sum(sw * d[..., 0] * d[..., 1], axis=1)
        cc = jnp.sum(sw * d[..., 1] ** 2, axis=1)
        half = 0.5 * jnp.arctan2(2 * b, a - cc)
        dirs = jnp.stack([jnp.cos(half), jnp.sin(half)], axis=-1)  # (4, 2)
        lnrm = jnp.stack([-dirs[:, 1], dirs[:, 0]], axis=-1)
        offs = jnp.sum(lnrm * mu, axis=-1)

        # Corner k = intersection of edge k-1 and edge k.
        nk1 = jnp.roll(lnrm, 1, axis=0)
        ok1 = jnp.roll(offs, 1)
        det = nk1[:, 0] * lnrm[:, 1] - nk1[:, 1] * lnrm[:, 0]
        det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
        cx = (ok1 * lnrm[:, 1] - nk1[:, 1] * offs) / det
        cy = (nk1[:, 0] * offs - ok1 * lnrm[:, 0]) / det
        new_c = jnp.stack([cx, cy], axis=-1)

        # Sanity: fall back per corner if the refinement jumped too far or
        # the edge had no usable gradient mass.
        edge_okay = (swsum[:, 0] > 1e-3) & (jnp.roll(swsum[:, 0], 1) > 1e-3)
        shift = jnp.linalg.norm(new_c - c4, axis=-1)
        keep = edge_okay & (shift <= max_shift) & jnp.all(jnp.isfinite(new_c), axis=-1)
        return jnp.where(keep[:, None], new_c, c4)

    def per_frame(g, cds, vs):
        out = jax.vmap(lambda c: per_quad(g, c))(cds)
        return jnp.where(vs[:, None, None], out, cds)

    return jax.vmap(per_frame)(gray, corners, valid)
