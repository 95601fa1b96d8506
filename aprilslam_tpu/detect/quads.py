"""Quad extraction: boundary clustering + corner fitting (detector stage 3).

The C library walks black/white component boundaries with a hash map keyed by
(black id, white id), then splits each cluster into 4 line segments via a
sequential angular sweep. The TPU formulation replaces both data structures:

* **Clustering = sort.** Every black/white neighbouring pixel pair emits a
  boundary point keyed by its (black label, white label) pair; a batched
  lexicographic sort groups the points of each physical quad contiguously,
  and segment reductions produce per-cluster statistics. No hash map, fully
  batched over frames.
* **Corner finding = extremal geometry.** For a convex quad, the farthest
  point from the centroid, the farthest point from it, and the two extreme
  points off their diagonal are the 4 corners. Two rounds of
  assign-points-to-sides (by angle interval) + weighted total-least-squares
  line fits + line intersections give subpixel corners — fixed iteration
  count, pure matmul/VPU work.

Corners are returned in a consistent cyclic order (descending angle around
the centroid = the reference's lb->rb->rt->lt winding, tag_detector.py:32-38);
the decode stage resolves which corner is 'lb'.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2**30)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["corners", "valid", "fit_err", "cluster_size"],
    meta_fields=[],
)
@dataclass(frozen=True)
class QuadCandidates:
    corners: jax.Array  # (B, Q, 4, 2) full-res pixel coords, cyclic order
    valid: jax.Array  # (B, Q) bool
    fit_err: jax.Array  # (B, Q) rms line-fit residual (decimated px)
    cluster_size: jax.Array  # (B, Q) boundary point count


def _emit_boundaries(trinary: jax.Array, labels: jax.Array, gray: jax.Array, level: jax.Array):
    """Per frame: boundary points between black and white components.

    Edge positions are subpixel: along the neighbour axis the point is placed
    where the intensity crosses the local threshold ``level`` (linear
    interpolation between the two pixel centres) — recovering the antialiased
    edge position instead of the integer pixel-pair midpoint.

    Returns (key_black, key_white, x, y, w) flat arrays of length 2*H*W
    (padded; invalid entries keyed _BIG).
    """
    B, H, W = trinary.shape

    # All pair quantities are computed at FULL (H, W) shape with the
    # neighbour fetched by a roll and the seam column/row masked out:
    # the previous [:, :, :-1] / [:, :, 1:] formulation produced
    # (W-1)-lane arrays, and the resulting lane misalignment forced a
    # relayout of every operand (measured 1.34 ms/frame — the single
    # hottest thing in the whole detector; the aligned form is ~10x
    # cheaper for identical output).
    def pairs(c0, l0, g0, axis, x0, y0, dx, dy, lvl_pair, edge_ok):
        c1 = jnp.roll(c0, -1, axis=axis)
        l1 = jnp.roll(l0, -1, axis=axis)
        g1 = jnp.roll(g0, -1, axis=axis)
        boundary = edge_ok & (c0 >= 0) & (c1 >= 0) & (c0 != c1)
        black = jnp.where(c0 == 0, l0, l1)
        white = jnp.where(c0 == 0, l1, l0)
        ka = jnp.where(boundary, black, _BIG)
        kb = jnp.where(boundary, white, _BIG)
        w = jnp.where(boundary, jnp.abs(g0 - g1), 0.0)
        denom = g1 - g0
        t = jnp.where(jnp.abs(denom) < 1e-6, 0.5,
                      (lvl_pair - g0) / jnp.where(jnp.abs(denom) < 1e-6, 1.0, denom))
        t = jnp.clip(t, 0.0, 1.0)
        return ka, kb, x0 + t * dx, y0 + t * dy, w

    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    xs = jnp.broadcast_to(xs, (B, H, W))
    ys = jnp.broadcast_to(ys, (B, H, W))
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)

    # Right neighbours: pixel centres (col+0.5, row+0.5) and (col+1.5, row+0.5).
    lvl_r = 0.5 * (level + jnp.roll(level, -1, axis=2))
    ka_r, kb_r, x_r, y_r, w_r = pairs(
        trinary, labels, gray, 2, xs, ys, 1.0, 0.0, lvl_r,
        (col < W - 1)[None],
    )
    # Down neighbours.
    lvl_d = 0.5 * (level + jnp.roll(level, -1, axis=1))
    ka_d, kb_d, x_d, y_d, w_d = pairs(
        trinary, labels, gray, 1, xs, ys, 0.0, 1.0, lvl_d,
        (row < H - 1)[None],
    )

    ka = jnp.concatenate([ka_r.reshape(B, -1), ka_d.reshape(B, -1)], axis=1)
    kb = jnp.concatenate([kb_r.reshape(B, -1), kb_d.reshape(B, -1)], axis=1)
    x = jnp.concatenate([x_r.reshape(B, -1), x_d.reshape(B, -1)], axis=1)
    y = jnp.concatenate([y_r.reshape(B, -1), y_d.reshape(B, -1)], axis=1)
    w = jnp.concatenate([w_r.reshape(B, -1), w_d.reshape(B, -1)], axis=1)
    return ka, kb, x, y, w


def _compact(ka, kb, x, y, w, max_boundary: int):
    """Compact sparse boundary entries to a fixed-size prefix.

    Boundary pixels are a few percent of the frame; compacting before
    sorting shrinks the expensive multi-operand sort by ~16x, which is what
    keeps the TPU compile and runtime tractable at 1000x1000.

    The selection is a two-level binary search over the valid-count cumsum,
    NOT nonzero(size=...): nonzero lowers to a scatter, which serializes on
    TPU and alone cost ~6 ms/frame — half the whole detection step (probe
    2026-08-21, tools/probe_quads_tpu.py). A flat searchsorted was the next
    bottleneck (xprof: 2.5 ms/frame of big-operand gathers in its 19-step
    loop): random gathers from the 500k-element cumsum cost ~15 ns each, so
    the search first runs on the 64x smaller block-end cumsum (a VMEM-sized
    operand) and only log2(64) = 6 of the expensive big-operand gathers
    remain to resolve the position inside the block.
    """
    N = ka.shape[0]
    valid = ka < _BIG
    tgt = jnp.arange(1, max_boundary + 1, dtype=jnp.int32)
    BS = 64
    nb = -(-N // BS)
    # Block-level cumsum ONLY: the elementwise (N,) cumsum this used to
    # materialize costs a 2 MB write plus 4-byte-per-lane row gathers; the
    # in-block ordinal is recovered instead from the gathered BOOLEAN
    # valid rows (1 byte/lane) with an in-register 64-lane cumsum.
    v_pad = jnp.concatenate([valid, jnp.zeros((nb * BS - N,), bool)])
    v_rows = v_pad.reshape(nb, BS)
    blk_cnt = jnp.sum(v_rows, axis=1, dtype=jnp.int32)  # (nb,)
    coarse = jnp.cumsum(blk_cnt)  # (nb,) valid count at block ends
    count = coarse[-1]

    # Two recursive levels of [row-contiguous gather + lane-wise
    # compare-sum] replace every random-gather bisect: each gathered row
    # moves as one vector access, so locating 16k targets costs two row
    # gathers plus a tiny 7-step bisect over the ~128-entry top level.
    def row_locate(arr, tgt_v):
        """arr (M,) nondecreasing -> first index with arr >= tgt, via one
        (64-wide) row gather per query + a dense compare-sum over the ~M/64
        row ends. The compare-sum replaces jnp.searchsorted: the ends array
        is tiny (~128 entries), so K x 128 vectorized compares are near-free
        on the VPU, while searchsorted's while-loop lowering serialized and
        alone cost ~1.4 ms/frame (probe 2026-08-21, /tmp/probe_compact)."""
        M = arr.shape[0]
        nr = -(-M // BS)
        a_pad = jnp.concatenate([arr, jnp.full((nr * BS - M,), arr[-1], arr.dtype)])
        a_rows = a_pad.reshape(nr, BS)
        ends = a_rows[:, -1]
        r = jnp.sum((ends[None, :] < tgt_v[:, None]).astype(jnp.int32), axis=-1)
        rows = jnp.take(a_rows, jnp.minimum(r, nr - 1), axis=0)
        pos = jnp.sum((rows < tgt_v[:, None]).astype(jnp.int32), axis=-1)
        return r * BS + pos

    blk = row_locate(coarse, tgt)  # block containing the target
    blk_c = jnp.minimum(blk, nb - 1)
    before = jnp.where(blk_c > 0, jnp.take(coarse, blk_c - 1), 0)
    o = tgt - before  # 1-based ordinal of the target within its block
    rows = jnp.take(v_rows, blk_c, axis=0)  # (K, BS) bool
    loc_cum = jnp.cumsum(rows.astype(jnp.int32), axis=1)
    pos = jnp.sum((loc_cum < o[:, None]).astype(jnp.int32), axis=-1)
    idx = jnp.minimum(blk * BS + pos, N - 1)
    slot = tgt - 1
    live = slot < count
    # Row-contiguous payload gathers: 5 independent random element-gathers
    # cost ~15 ns each on TPU; packing the columns lets each gathered row
    # move as one contiguous vector access (2 gathers instead of 5).
    ints = jnp.take(jnp.stack([ka, kb], axis=-1), idx, axis=0)  # (K, 2)
    flts = jnp.take(jnp.stack([x, y, w], axis=-1), idx, axis=0)  # (K, 3)
    ka_c = jnp.where(live, ints[:, 0], _BIG)
    kb_c = jnp.where(live, ints[:, 1], _BIG)
    x_c = flts[:, 0]
    y_c = flts[:, 1]
    w_c = jnp.where(live, flts[:, 2], 0.0)
    return ka_c, kb_c, x_c, y_c, w_c


def _cluster(ka, kb, x, y, w, max_clusters: int, min_pts: int = 1):
    """Sort by (black, white) key pair and compute per-cluster stats.

    All inputs (N,) for one frame. Returns sorted point arrays plus per-
    cluster (count, start, bbox) over max_clusters slots.

    Cluster slots are assigned BY SIZE (top-k of the per-segment point
    counts), not by key order: a noisy frame can produce thousands of tiny
    speck clusters, and first-come slot assignment would evict the real tag
    boundaries. Ranking by size keeps the detector's fixed capacity while
    making eviction hit the specks first.

    SCATTER-FREE: after the sort every cluster is a contiguous run, so
    per-run statistics come from segmented forward scans evaluated at the
    run's last element (log-depth associative scans + tiny gathers) —
    jax.ops.segment_* would lower to six serialized 16k-element scatters
    on TPU (xprof 2026-08-21).
    """
    n = ka.shape[0]
    # Sort only (keys, iota): payload floats would otherwise ride through
    # every compare-exchange of the bitonic network; one packed row-gather
    # reorders them afterwards instead.
    ka_s, kb_s, perm = jax.lax.sort(
        (ka, kb, jnp.arange(n, dtype=jnp.int32)), num_keys=2, is_stable=False
    )
    pay = jnp.take(jnp.stack([x, y, w], axis=-1), perm, axis=0)  # (n, 3)
    x_s, y_s, w_s = pay[:, 0], pay[:, 1], pay[:, 2]
    valid = ka_s < _BIG
    new_seg = jnp.ones((n,), dtype=bool)
    new_seg = new_seg.at[1:].set((ka_s[1:] != ka_s[:-1]) | (kb_s[1:] != kb_s[:-1]))
    idx = jnp.arange(n, dtype=jnp.int32)

    # Run extent per element: start via forward max-scan of start markers;
    # end (exclusive) via the next run's start (reverse min-scan).
    start_elt = jax.lax.associative_scan(jnp.maximum, jnp.where(new_seg, idx, 0))
    nxt = jnp.where(new_seg, idx, n)
    next_start = jnp.flip(
        jax.lax.associative_scan(jnp.minimum, jnp.flip(jnp.roll(nxt, -1).at[-1].set(n)))
    )
    size_elt = next_start - start_elt  # (n,) run length at every element

    # Segmented forward min/max scans for the bbox (reset at run starts).
    def seg_scan(vals, op, init):
        def combine(a, b):
            av, ar = a
            bv, br = b
            return jnp.where(br, op(av, bv), bv), ar & br
        out, _ = jax.lax.associative_scan(combine, (vals, ~new_seg))
        return out

    xmin_s = seg_scan(x_s, jnp.minimum, None)
    xmax_s = seg_scan(x_s, jnp.maximum, None)
    ymin_s = seg_scan(y_s, jnp.minimum, None)
    ymax_s = seg_scan(y_s, jnp.maximum, None)

    # Rank runs by size: only a run's FIRST element scores (others -1), so
    # top_k over elements yields run starts directly, largest first.
    score = jnp.where(new_seg & valid & (size_elt >= min_pts),
                      size_elt.astype(jnp.float32), -1.0)
    top_sz, top_pos = jax.lax.top_k(score, max_clusters)
    sel = top_sz > 0
    start = jnp.where(sel, top_pos, n)
    last = jnp.clip(jnp.where(sel, top_pos + top_sz.astype(jnp.int32) - 1, 0), 0, n - 1)
    inf = jnp.float32(jnp.inf)
    return (x_s, y_s, w_s), dict(
        count=jnp.where(sel, top_sz, 0.0),
        start=start,
        xmin=jnp.where(sel, jnp.take(xmin_s, last), inf),
        xmax=jnp.where(sel, jnp.take(xmax_s, last), -inf),
        ymin=jnp.where(sel, jnp.take(ymin_s, last), inf),
        ymax=jnp.where(sel, jnp.take(ymax_s, last), -inf),
    )


def _fit_quad(pts: jax.Array, w: jax.Array, refine_iters: int):
    """Fit 4 corners to one cluster's boundary points.

    pts (P, 2), w (P,) weights (0 for padding). Returns (corners (4, 2) in
    descending-angle cyclic order, rms residual).
    """
    wsum = jnp.sum(w) + 1e-9
    c = jnp.sum(pts * w[:, None], axis=0) / wsum

    live = w > 0
    d2 = jnp.where(live, jnp.sum((pts - c) ** 2, axis=-1), -1.0)
    p1 = pts[jnp.argmax(d2)]
    d2b = jnp.where(live, jnp.sum((pts - p1) ** 2, axis=-1), -1.0)
    p2 = pts[jnp.argmax(d2b)]
    diag = p2 - p1
    nrm = jnp.stack([-diag[1], diag[0]])
    nrm = nrm / (jnp.linalg.norm(nrm) + 1e-9)
    s = jnp.sum((pts - p1) * nrm, axis=-1)
    p3 = pts[jnp.argmax(jnp.where(live, s, -jnp.inf))]
    p4 = pts[jnp.argmax(jnp.where(live, -s, -jnp.inf))]

    corners = jnp.stack([p1, p2, p3, p4])
    ang = jnp.arctan2(corners[:, 1] - c[1], corners[:, 0] - c[0])
    order = jnp.argsort(-ang)
    corners = corners[order]

    theta = jnp.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])

    def refine(corners):
        phi = jnp.arctan2(corners[:, 1] - c[1], corners[:, 0] - c[0])
        beta = jnp.mod(phi[0] - phi, 2 * jnp.pi)  # ascending, beta[0] = 0
        alpha = jnp.mod(phi[0] - theta, 2 * jnp.pi)
        side = jnp.sum(alpha[:, None] >= beta[None, :], axis=1) - 1  # (P,) in 0..3
        onehot = (side[:, None] == jnp.arange(4)[None, :]).astype(jnp.float32) * w[:, None]
        sw = jnp.sum(onehot, axis=0) + 1e-9  # (4,)
        mu = (onehot.T @ pts) / sw[:, None]  # (4, 2)
        dxy = pts[:, None, :] - mu[None, :, :]  # (P, 4, 2)
        a = jnp.sum(onehot * dxy[..., 0] ** 2, axis=0)
        bcv = jnp.sum(onehot * dxy[..., 0] * dxy[..., 1], axis=0)
        cc = jnp.sum(onehot * dxy[..., 1] ** 2, axis=0)
        half = 0.5 * jnp.arctan2(2 * bcv, a - cc)
        dirs = jnp.stack([jnp.cos(half), jnp.sin(half)], axis=-1)  # (4, 2)
        normals = jnp.stack([-dirs[:, 1], dirs[:, 0]], axis=-1)
        offs = jnp.sum(normals * mu, axis=-1)  # (4,)
        # corner k = intersection of side k-1 and side k
        nk1 = jnp.roll(normals, 1, axis=0)
        ok1 = jnp.roll(offs, 1)
        det = nk1[:, 0] * normals[:, 1] - nk1[:, 1] * normals[:, 0]
        det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
        cx = (ok1 * normals[:, 1] - nk1[:, 1] * offs) / det
        cy = (nk1[:, 0] * offs - ok1 * normals[:, 0]) / det
        new_corners = jnp.stack([cx, cy], axis=-1)
        resid = jnp.sum(normals[side] * pts, axis=-1) - offs[side]
        rms = jnp.sqrt(jnp.sum(w * resid**2) / wsum)
        return new_corners, rms

    rms = jnp.float32(jnp.inf)
    for _ in range(refine_iters):
        corners, rms = refine(corners)
    # Re-sort to descending angle in case refinement reordered anything.
    ang = jnp.arctan2(corners[:, 1] - c[1], corners[:, 0] - c[0])
    corners = corners[jnp.argsort(-ang)]
    return corners, rms


def quad_candidates(
    trinary: jax.Array,  # (B, H, W) int8 (decimated resolution)
    labels: jax.Array,  # (B, H, W) int32
    gray: jax.Array,  # (B, H, W) float32 (decimated resolution)
    decimate_factor: int,
    level: jax.Array | None = None,  # (B, H, W) local threshold level
    max_clusters: int = 256,
    max_quads: int = 48,
    pts_per_quad: int = 256,
    min_cluster_pts: int = 24,
    min_side: float = 4.0,
    refine_iters: int = 2,
    max_fit_err: float = 0.8,
    max_boundary: int = 32768,
) -> QuadCandidates:
    B, H, W = trinary.shape
    if level is None:
        level = jnp.full_like(gray, 0.5)
    ka, kb, x, y, w = _emit_boundaries(trinary, labels, gray, level)

    def per_frame(ka, kb, x, y, w):
        ka, kb, x, y, w = _compact(ka, kb, x, y, w, max_boundary)
        (x_s, y_s, w_s), st = _cluster(ka, kb, x, y, w, max_clusters, min_cluster_pts)
        count, start = st["count"], st["start"]
        bw = st["xmax"] - st["xmin"]
        bh = st["ymax"] - st["ymin"]
        ok = (
            (count >= min_cluster_pts)
            & (bw >= min_side)
            & (bh >= min_side)
            & (count <= 3.0 * (bw + bh) + 32.0)
        )
        score = jnp.where(ok, count, -1.0)
        top_score, top_idx = jax.lax.top_k(score, max_quads)
        q_valid = top_score > 0
        q_start = start[top_idx]
        q_count = count[top_idx].astype(jnp.int32)

        # One packed row-gather for all quads' sample points: (Q*P)
        # contiguous 12-byte rows instead of 3 independent random
        # element-gathers per point (TPU gathers are latency-bound).
        xyw = jnp.stack([x_s, y_s, w_s], axis=-1)  # (n, 3)

        def quad_indices(s, n):
            k = jnp.arange(pts_per_quad, dtype=jnp.int32)
            idx = s + (k * jnp.maximum(n, 1)) // pts_per_quad
            return jnp.minimum(idx, x_s.shape[0] - 1)

        qidx = jax.vmap(quad_indices)(q_start, q_count)  # (Q, P)
        g = jnp.take(xyw, qidx.reshape(-1), axis=0).reshape(
            qidx.shape[0], pts_per_quad, 3
        )
        pts = g[..., :2]
        wq = g[..., 2] * q_valid.astype(jnp.float32)[:, None]
        corners, rms = jax.vmap(lambda p, ww: _fit_quad(p, ww, refine_iters))(pts, wq)

        # Geometry screens: convexity + area + containment.
        e = jnp.roll(corners, -1, axis=1) - corners  # (Q, 4, 2) edge vectors
        cross = e[:, :, 0] * jnp.roll(e, -1, axis=1)[:, :, 1] - e[:, :, 1] * jnp.roll(e, -1, axis=1)[:, :, 0]
        convex = jnp.all(cross > 0, axis=1) | jnp.all(cross < 0, axis=1)
        area = 0.5 * jnp.abs(
            jnp.sum(corners[:, :, 0] * jnp.roll(corners, -1, axis=1)[:, :, 1]
                    - corners[:, :, 1] * jnp.roll(corners, -1, axis=1)[:, :, 0], axis=1)
        )
        inb = jnp.all(
            (corners[..., 0] >= -4) & (corners[..., 0] <= W + 4)
            & (corners[..., 1] >= -4) & (corners[..., 1] <= H + 4),
            axis=1,
        )
        good = q_valid & convex & (area >= min_side * min_side) & inb & (rms <= max_fit_err)
        return corners * decimate_factor, good, rms, q_count

    corners, valid, fit_err, csize = jax.vmap(per_frame)(ka, kb, x, y, w)
    return QuadCandidates(corners=corners, valid=valid, fit_err=fit_err, cluster_size=csize)
