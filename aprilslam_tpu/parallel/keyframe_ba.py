"""Keyframe-axis sharded bundle adjustment for one LONG trajectory.

The reference processes its frame stream strictly one frame at a time with
O(1) state (simulation_engine.py:161-184; slam_graph.py:22) — a trajectory
can never outgrow one host. This module is the long-context analog the
SURVEY §5 row calls for: ONE trajectory of up to tens of thousands of
keyframes partitioned into contiguous windows across devices, with the seam
factors between windows exchanged via collectives.

Why this is NOT the landmark-sharded solver (distributed_ba.py) transposed:
in tag SLAM the cardinalities invert. Landmarks (tags) number tens-to-
hundreds; keyframes number thousands-to-tens-of-thousands. Eliminating the
LANDMARK blocks (ba.py / distributed_ba.py) leaves a reduced CAMERA system
that is dense over keyframe pairs sharing a tag — 6K x 6K with K = 10k is
unsolvable. So here the elimination flips:

* **Keyframes are the eliminated side.** Every reprojection factor touches
  one keyframe + one landmark, and every odometry factor touches two
  CONSECUTIVE keyframes, so the camera Hessian H_cc is block-TRIDIAGONAL
  (6x6 blocks): diagonal from reprojection + odometry, one off-diagonal
  band E_k from the odometry chain.
* **The implicit Schur operator is applied matrix-free.** The reduced
  system over camera deltas, S = H_cc - W H_ll^-1 W^T, is never formed.
  S @ x costs: a local banded product (the tridiagonal part, with the two
  seam halo terms fetched by ``ppermute``), plus the landmark coupling —
  a local segment-sum into an (M, 6) vector, one ``psum`` (landmarks are
  replicated: M is small), a batched 6x6 apply of H_ll^-1, and a local
  scatter back. Per-application communication: one psum of 6M floats and
  two ppermutes of 6 floats — independent of trajectory length.
* **PCG with a block-Jacobi preconditioner** (exact 6x6 diagonal blocks of
  S — exact because each keyframe observes a landmark at most once, so the
  diagonal of W H_ll^-1 W^T is a plain per-observation sum) solves the
  reduced system in a fixed number of iterations; global dot products are
  scalar psums.
* **Landmark back-substitution** is one more psum; the landmark update is
  computed identically on every device (replicated, tiny).

Factor ownership: every reprojection observation lives with its keyframe's
owner; odometry factor (k, k+1) is linearized by BOTH the owner of k and
the owner of k+1 when the pair spans a seam (one duplicated 6-dof factor
per seam — the halo pose crosses in a ppermute), so every H_cc diagonal
block assembles fully locally and nothing is psum'd over the kf axis
except 6M-float landmark partials and scalars.

Outer loop: Levenberg-Marquardt with Huber-IRLS reprojection weighting,
rotation-weighted odometry residuals (cf. slam/pgo.py), Marquardt damping,
accept/reject on the true robust cost (all psum'd scalars), and the global
gauge fixed by a strong prior on keyframe 0.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..geometry import se3_exp, se3_log, se3_inverse, tag_object_corners
from ..slam.ba import _obs_residual, _huber_sqrt_weights, _damp_blocks


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "kf_pose", "kf_active",
        "lm_pose", "lm_active",
        "obs_kf", "obs_lm", "obs_uv", "obs_ok",
        "odom_T", "odom_ok", "odom_weight",
    ],
    meta_fields=[],
)
@dataclass(frozen=True)
class KeyframeBAProblem:
    """One long-trajectory BA problem (global, host-built).

    Observations must be grouped by keyframe OWNER into equal contiguous
    blocks (``partition_obs_by_keyframe``) before the sharded solve.
    """

    kf_pose: jax.Array  # (K, 4, 4) camera->world
    kf_active: jax.Array  # (K,) bool
    lm_pose: jax.Array  # (M, 4, 4) tag->world (replicated over the mesh)
    lm_active: jax.Array  # (M,) bool
    obs_kf: jax.Array  # (O,) int32 GLOBAL keyframe index
    obs_lm: jax.Array  # (O,) int32 landmark slot
    obs_uv: jax.Array  # (O, 4, 2) pixel corners
    obs_ok: jax.Array  # (O,) bool
    odom_T: jax.Array  # (K, 4, 4) measured T_k^-1 T_{k+1}; row K-1 unused
    odom_ok: jax.Array  # (K,) bool (forced False at K-1)
    odom_weight: jax.Array  # (K,) sqrt-information scale of each odom factor

    @property
    def n_keyframes(self) -> int:
        return int(self.kf_pose.shape[0])

    @property
    def n_landmarks(self) -> int:
        return int(self.lm_pose.shape[0])


def partition_obs_by_keyframe(
    obs_kf: np.ndarray,
    obs_lm: np.ndarray,
    obs_uv: np.ndarray,
    obs_ok: np.ndarray,
    n_keyframes: int,
    n_shards: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Bucket observations by keyframe owner into equal contiguous blocks.

    Device d owns keyframes [d*K/n, (d+1)*K/n). The output arrays have
    length per*n where per = max bucket size rounded up to a multiple of 8 —
    nothing is ever dropped (cf. shard_observations_by_owner fit=True).

    ``n_keyframes`` must divide evenly into ``n_shards`` blocks: with a
    ragged split the trailing keyframes' owner index would land past the
    last shard and their observations would be dropped silently.
    """
    if n_keyframes % n_shards != 0:
        raise ValueError(
            f"n_keyframes={n_keyframes} must be divisible by "
            f"n_shards={n_shards} (a ragged split would drop the trailing "
            f"keyframes' observations)"
        )
    kl = n_keyframes // n_shards
    ok = np.asarray(obs_ok, bool)
    owner = np.asarray(obs_kf) // max(kl, 1)
    counts = np.bincount(owner[ok], minlength=n_shards)
    per = max(8, int(-8 * (-(counts.max() if counts.size else 1) // 8)))
    O = per * n_shards
    new_kf = np.zeros(O, np.int32)
    new_lm = np.zeros(O, np.int32)
    new_uv = np.zeros((O, 4, 2), np.asarray(obs_uv).dtype)
    new_ok = np.zeros(O, bool)
    for s in range(n_shards):
        idx = np.nonzero(ok & (owner == s))[0]
        dst = slice(s * per, s * per + len(idx))
        new_kf[dst] = np.asarray(obs_kf)[idx]
        new_lm[dst] = np.asarray(obs_lm)[idx]
        new_uv[dst] = np.asarray(obs_uv)[idx]
        new_ok[dst] = True
        # padding rows keep obs_kf inside the owner's range so the local
        # index stays in [0, kl) even for dead slots
        new_kf[s * per + len(idx) : (s + 1) * per] = s * kl
    return new_kf, new_lm, new_uv, new_ok


def synthesize_trajectory_problem(
    n_keyframes: int,
    n_landmarks: int,
    n_shards: int,
    obs_per_kf: int = 4,
    corner_px_noise: float = 0.3,
    odom_rot_noise: float = 0.002,
    odom_trans_noise: float = 0.05,
    lm_init_noise: float = 0.5,
    tag_size: float = 10.0,
    image_wh: int = 1000,
    fov_y: float = 45.0,
    seed: int = 0,
):
    """Long-trajectory fixture: a camera sweep over a tag grid with noisy
    odometry INTEGRATED into the initial keyframe guesses (so the initial
    trajectory drifts like a real dead-reckoned front end) and noisy
    landmark seeds. Returns (problem, gt_kf_pose, Kmat).

    The camera flies a serpentine sweep at constant height looking straight
    down (the scaling_bench camera convention), observing its
    ``obs_per_kf`` nearest tags per keyframe.
    """
    from ..geometry import PinholeCamera

    rng = np.random.default_rng(seed)
    K, M = n_keyframes, n_landmarks
    cam = PinholeCamera.from_fov(image_wh, image_wh, fov_y)
    Kmat = np.asarray(cam.matrix, np.float32)
    obj = np.asarray(tag_object_corners(tag_size), np.float32)

    side = int(np.ceil(np.sqrt(M)))
    extent = side * 30.0
    lm_gt = np.broadcast_to(np.eye(4, dtype=np.float32), (M, 4, 4)).copy()
    for m in range(M):
        lm_gt[m][:3, 3] = [(m % side) * 30.0, (m // side) * 30.0, 0.0]

    # Serpentine ground-truth sweep at constant height, looking down.
    kf_gt = np.broadcast_to(np.eye(4, dtype=np.float32), (K, 4, 4)).copy()
    n_rows = max(2, side)
    for k in range(K):
        f = k / max(K - 1, 1)
        row = f * (n_rows - 1)
        r_i = int(row)
        along = row - r_i
        x = (along if r_i % 2 == 0 else 1.0 - along) * extent
        y = f * extent
        kf_gt[k][:3, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
        kf_gt[k][:3, 3] = [x, y, 130.0]

    # Observations: nearest tags, projected with pixel noise.
    obs_kf = np.zeros(K * obs_per_kf, np.int32)
    obs_lm = np.zeros(K * obs_per_kf, np.int32)
    obs_uv = np.zeros((K * obs_per_kf, 4, 2), np.float32)
    i = 0
    for k in range(K):
        d = np.linalg.norm(lm_gt[:, :3, 3] - kf_gt[k][:3, 3], axis=-1)
        for m in np.argsort(d)[:obs_per_kf]:
            T_ct = np.linalg.inv(kf_gt[k]) @ lm_gt[m]
            p = obj @ T_ct[:3, :3].T + T_ct[:3, 3]
            uv = p[:, :2] / p[:, 2:3]
            obs_uv[i] = np.stack(
                [Kmat[0, 0] * uv[:, 0] + Kmat[0, 2], Kmat[1, 1] * uv[:, 1] + Kmat[1, 2]],
                -1,
            ) + rng.normal(scale=corner_px_noise, size=(4, 2))
            obs_kf[i] = k
            obs_lm[i] = m
            i += 1
    obs_ok = np.ones(K * obs_per_kf, bool)

    # Noisy odometry; the initial guess INTEGRATES it (dead-reckoning drift).
    odom_T = np.broadcast_to(np.eye(4, dtype=np.float32), (K, 4, 4)).copy()
    kf_init = kf_gt.copy()
    for k in range(K - 1):
        rel = np.linalg.inv(kf_gt[k]) @ kf_gt[k + 1]
        xi = np.concatenate([
            rng.normal(scale=odom_rot_noise, size=3),
            rng.normal(scale=odom_trans_noise, size=3),
        ])
        odom_T[k] = (np.asarray(se3_exp(jnp.asarray(xi, jnp.float32))) @ rel).astype(
            np.float32
        )
        kf_init[k + 1] = kf_init[k] @ odom_T[k]

    lm_init = np.stack([
        np.asarray(se3_exp(jnp.asarray(np.concatenate([
            rng.normal(scale=0.01, size=3),
            rng.normal(scale=lm_init_noise, size=3),
        ]), jnp.float32))) @ lm_gt[m]
        for m in range(M)
    ]).astype(np.float32)

    p_kf, p_lm, p_uv, p_ok = partition_obs_by_keyframe(
        obs_kf, obs_lm, obs_uv, obs_ok, K, n_shards
    )
    prob = KeyframeBAProblem(
        kf_pose=jnp.asarray(kf_init),
        kf_active=jnp.ones((K,), bool),
        lm_pose=jnp.asarray(lm_init),
        lm_active=jnp.ones((M,), bool),
        obs_kf=jnp.asarray(p_kf),
        obs_lm=jnp.asarray(p_lm),
        obs_uv=jnp.asarray(p_uv),
        obs_ok=jnp.asarray(p_ok),
        odom_T=jnp.asarray(odom_T),
        odom_ok=jnp.asarray(np.arange(K) < K - 1),
        # Statistically consistent relative weighting: reprojection enters
        # the cost at weight 1 per pixel (sigma = corner_px_noise), so the
        # odometry sqrt-information in those units is sigma_px / sigma_odom.
        odom_weight=jnp.full(
            (K,),
            max(corner_px_noise, 0.1) / max(odom_trans_noise, 1e-6),
            jnp.float32,
        ),
    )
    return prob, kf_gt, jnp.asarray(Kmat)


def _odom_residual(xi_i, xi_j, T_wi, T_wj, T_meas, scale):
    """Weighted 6-vector odometry residual with tangent perturbations."""
    Ti = se3_exp(xi_i) @ T_wi
    Tj = se3_exp(xi_j) @ T_wj
    return se3_log(se3_inverse(T_meas) @ (se3_inverse(Ti) @ Tj)) * scale


def build_keyframe_ba(
    mesh: Mesh,
    n_keyframes: int,
    n_landmarks: int,
    n_obs: int,
    tag_size: float,
    axis: str = "kf",
    iters: int = 8,
    cg_iters: int = 32,
    damping: float = 1e-2,
    huber_px: float = 4.0,
    odom_rot_weight: float = 25.0,
    gauge_weight: float = 1e6,
):
    """Returns jitted ``run(problem, Kmat) -> (problem', cost)`` solving
    LM-BA with keyframes + observations + odometry sharded over ``axis``.

    ``n_obs`` is the TOTAL (already partitioned) observation count; both K
    and n_obs must divide by the mesh's ``axis`` size.
    """
    n_dev = mesh.shape[axis]
    K, M = n_keyframes, n_landmarks
    if K % n_dev or n_obs % n_dev:
        raise ValueError(f"K={K} and n_obs={n_obs} must divide by {n_dev}")
    Kl = K // n_dev

    # d receives from d+1 (right halo) / from d-1 (left halo). The wrap
    # entries feed factors whose ok flag is False at the global ends.
    perm_from_right = [((d + 1) % n_dev, d) for d in range(n_dev)]
    perm_from_left = [((d - 1) % n_dev, d) for d in range(n_dev)]

    def from_right(x):
        return jax.lax.ppermute(x[None], axis, perm_from_right)[0]

    def from_left(x):
        return jax.lax.ppermute(x[None], axis, perm_from_left)[0]

    def local_solve(
        kf_pose,  # (Kl, 4, 4)
        kf_active,  # (Kl,)
        lm_pose,  # (M, 4, 4) replicated
        lm_active,  # (M,)
        obs_kf,  # (Ol,) GLOBAL keyframe ids (this shard's block)
        obs_lm,  # (Ol,)
        obs_uv,  # (Ol, 4, 2)
        obs_ok,  # (Ol,)
        odom_T,  # (Kl, 4, 4)
        odom_ok,  # (Kl,)
        odom_w,  # (Kl,)
        Kmat,  # (3, 3) replicated
    ):
        dtype = kf_pose.dtype
        me = jax.lax.axis_index(axis)
        obs_k = jnp.clip(obs_kf - me * Kl, 0, Kl - 1)
        # The global last keyframe has no outgoing factor. Masked HERE (not
        # in the host wrapper): an eager op on the global array would fail
        # under multi-process meshes where shards are non-addressable.
        odom_ok = odom_ok & (me * Kl + jnp.arange(Kl) < K - 1)
        obj = tag_object_corners(tag_size, dtype=dtype)
        z6 = jnp.zeros(6, dtype)
        w_obs = obs_ok.astype(dtype)
        oscale = jnp.asarray(
            [odom_rot_weight] * 3 + [1.0] * 3, dtype
        )
        local_idx = jnp.arange(Kl)
        gauge_mask = (me == 0) & (local_idx == 0)  # global keyframe 0
        gauge = gauge_mask.astype(dtype) * gauge_weight
        kf_prior = (1.0 - kf_active.astype(dtype)) * 1e4 + gauge
        lm_prior = (1.0 - lm_active.astype(dtype)) * 1e4

        def halo_poses(kf_p):
            """(pose of right neighbour's first kf, pose of left's last)."""
            return from_right(kf_p[0]), from_left(kf_p[-1])

        # The seam factor owned by the LEFT neighbour, re-linearized here for
        # this block's first diagonal/bc contribution: its measurement, ok
        # flag and weight cross once (they are constants of the problem).
        T_in = from_left(odom_T[-1])
        ok_in = from_left(odom_ok[-1])
        w_in = from_left(odom_w[-1])

        def robust_cost(kf_p, lm_p):
            # Reprojection (Huber) — every obs owned exactly once.
            def rho_one(k, lm, uv, ww):
                rr = _obs_residual(z6, z6, kf_p[k], lm_p[lm], uv, obj, Kmat)
                a = jnp.abs(rr)
                rho = jnp.where(a <= huber_px, rr * rr, huber_px * (2.0 * a - huber_px))
                return jnp.sum(rho) * ww

            c_obs = jnp.sum(jax.vmap(rho_one)(obs_k, obs_lm, obs_uv, w_obs))
            # Odometry — factor k owned by owner of k (seams counted once).
            p_right, _ = halo_poses(kf_p)
            T_next = jnp.concatenate([kf_p[1:], p_right[None]], axis=0)
            r_od = jax.vmap(
                lambda Ti, Tj, Tm, w, ok: _odom_residual(z6, z6, Ti, Tj, Tm, oscale)
                * w * ok.astype(dtype)
            )(kf_p, T_next, odom_T, odom_w, odom_ok)
            return jax.lax.psum(c_obs + jnp.sum(r_od * r_od), axis)

        def linearize(kf_p, lm_p):
            # ---- reprojection factors ----
            def one(k, lm, uv, ww):
                Twc = kf_p[k]
                Twt = lm_p[lm]
                r = _obs_residual(z6, z6, Twc, Twt, uv, obj, Kmat)
                Jc = jax.jacfwd(_obs_residual, argnums=0)(z6, z6, Twc, Twt, uv, obj, Kmat)
                Jl = jax.jacfwd(_obs_residual, argnums=1)(z6, z6, Twc, Twt, uv, obj, Kmat)
                wh = _huber_sqrt_weights(r, huber_px) * ww
                return r * wh, Jc * wh[:, None], Jl * wh[:, None]

            r, Jc, Jl = jax.vmap(one)(obs_k, obs_lm, obs_uv, w_obs)
            Hcc = jax.ops.segment_sum(
                jnp.einsum("ori,orj->oij", Jc, Jc), obs_k, num_segments=Kl
            )
            bc = jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jc, r), obs_k, num_segments=Kl)
            Hll = jax.ops.segment_sum(
                jnp.einsum("ori,orj->oij", Jl, Jl), obs_lm, num_segments=M
            )
            bl = jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jl, r), obs_lm, num_segments=M)
            A = jnp.einsum("ori,orj->oij", Jc, Jl)  # (Ol, 6, 6) coupling

            # ---- odometry factors k -> k+1 (owned at k) ----
            p_right, p_left = halo_poses(kf_p)
            T_next = jnp.concatenate([kf_p[1:], p_right[None]], axis=0)

            def od(Ti, Tj, Tm, w, ok):
                wk = w * ok.astype(dtype)
                r = _odom_residual(z6, z6, Ti, Tj, Tm, oscale) * wk
                Ji = jax.jacfwd(_odom_residual, argnums=0)(z6, z6, Ti, Tj, Tm, oscale) * wk
                Jj = jax.jacfwd(_odom_residual, argnums=1)(z6, z6, Ti, Tj, Tm, oscale) * wk
                return r, Ji, Jj

            r_od, Ji, Jj = jax.vmap(od)(kf_p, T_next, odom_T, odom_w, odom_ok)
            # Source-side contributions land on the owner's diagonal.
            Hcc = Hcc + jnp.einsum("kri,krj->kij", Ji, Ji)
            bc = bc + jnp.einsum("kri,kr->ki", Ji, r_od)
            E = jnp.einsum("kri,krj->kij", Ji, Jj)  # couples k -> k+1
            # Target-side contributions of LOCAL factors (k+1 local too).
            HJJ = jnp.einsum("kri,krj->kij", Jj, Jj)
            bJ = jnp.einsum("kri,kr->ki", Jj, r_od)
            Hcc = Hcc.at[1:].add(HJJ[:-1])
            bc = bc.at[1:].add(bJ[:-1])
            # Target side of the INCOMING seam factor ((left's last) -> my 0):
            # re-linearized here so diagonal block 0 assembles locally.
            w_seam = w_in * ok_in.astype(dtype)
            r_s = _odom_residual(z6, z6, p_left, kf_p[0], T_in, oscale) * w_seam
            Ji_s = jax.jacfwd(_odom_residual, argnums=0)(
                z6, z6, p_left, kf_p[0], T_in, oscale
            ) * w_seam
            Jj_s = jax.jacfwd(_odom_residual, argnums=1)(
                z6, z6, p_left, kf_p[0], T_in, oscale
            ) * w_seam
            Hcc = Hcc.at[0].add(Jj_s.T @ Jj_s)
            bc = bc.at[0].add(Jj_s.T @ r_s)
            E_in = Ji_s.T @ Jj_s  # couples (left's last) -> my 0
            return Hcc, bc, Hll, bl, A, E, E_in

        def lm_step(carry, _):
            kf_p, lm_p, lam = carry
            cost0 = robust_cost(kf_p, lm_p)
            Hcc, bc, Hll_part, bl_part, A, E, E_in = linearize(kf_p, lm_p)

            Hll = jax.lax.psum(Hll_part, axis)
            bl = jax.lax.psum(bl_part, axis)
            Hll_d = _damp_blocks(Hll, lam, lm_prior)
            Hll_inv = jnp.linalg.inv(Hll_d)  # (M, 6, 6) replicated compute
            Hcc_d = _damp_blocks(Hcc, lam, kf_prior)

            # rhs of the reduced camera system: bc - W Hll_inv bl (local).
            Hb = jnp.einsum("mab,mb->ma", Hll_inv, bl)  # (M, 6) replicated
            rhs = bc - jax.ops.segment_sum(
                jnp.einsum("oab,ob->oa", A, Hb[obs_lm]), obs_k, num_segments=Kl
            )

            def S_apply(x):  # x (Kl, 6) local block of the global vector
                x_right = from_right(x[0])
                x_left = from_left(x[-1])
                x_next = jnp.concatenate([x[1:], x_right[None]], axis=0)
                x_prev = jnp.concatenate([x_left[None], x[:-1]], axis=0)
                y = jnp.einsum("kab,kb->ka", Hcc_d, x)
                # banded odometry coupling: E_k x_{k+1} and E_{k-1}^T x_{k-1}
                y = y + jnp.einsum("kab,kb->ka", E, x_next)
                E_prev = jnp.concatenate([E_in[None], E[:-1]], axis=0)
                y = y + jnp.einsum("kba,kb->ka", E_prev, x_prev)
                # landmark coupling: W Hll_inv W^T x, one psum of (M, 6)
                u = jax.ops.segment_sum(
                    jnp.einsum("oab,oa->ob", A, x[obs_k]), obs_lm, num_segments=M
                )
                u = jax.lax.psum(u, axis)
                v = jnp.einsum("mab,mb->ma", Hll_inv, u)
                y = y - jax.ops.segment_sum(
                    jnp.einsum("oab,ob->oa", A, v[obs_lm]), obs_k, num_segments=Kl
                )
                return y

            # Exact block-Jacobi preconditioner: each keyframe sees a
            # landmark at most once, so diag(W Hll_inv W^T) is a plain
            # per-observation sum — no pair terms.
            Bd = jnp.einsum("oab,obc,odc->oad", A, Hll_inv[obs_lm], A)
            Sdiag = Hcc_d - jax.ops.segment_sum(Bd, obs_k, num_segments=Kl)
            eye6 = jnp.eye(6, dtype=dtype)
            Pinv = jnp.linalg.inv(Sdiag + 1e-6 * eye6)

            def pdot(a, b):
                return jax.lax.psum(jnp.sum(a * b), axis)

            def cg_body(carry, _):
                x, r, p, rz = carry
                Sp = S_apply(p)
                alpha = rz / (pdot(p, Sp) + 1e-30)
                x = x + alpha * p
                r = r - alpha * Sp
                z = jnp.einsum("kab,kb->ka", Pinv, r)
                rz_new = pdot(r, z)
                beta = rz_new / (rz + 1e-30)
                p = z + beta * p
                return (x, r, p, rz_new), None

            r0 = rhs
            z0 = jnp.einsum("kab,kb->ka", Pinv, r0)
            (y_sol, _, _, _), _ = jax.lax.scan(
                cg_body, (jnp.zeros_like(rhs), r0, z0, pdot(r0, z0)),
                None, length=cg_iters,
            )
            # The prior keeps S nonsingular; zeroing the gauge keyframe's
            # update makes the pin EXACT (a 1e6 prior alone still lets
            # gradient/prior ~ 1e-2-unit drift leak in per iteration).
            dc = -y_sol * (1.0 - gauge_mask.astype(dtype))[:, None]

            # Landmark back-substitution (replicated result).
            Wtdc = jax.lax.psum(
                jax.ops.segment_sum(
                    jnp.einsum("oab,oa->ob", A, dc[obs_k]), obs_lm, num_segments=M
                ),
                axis,
            )
            dl = -jnp.einsum("mab,mb->ma", Hll_inv, bl + Wtdc)

            kf_new = jax.vmap(lambda d, T: se3_exp(d) @ T)(dc, kf_p)
            kf_new = jnp.where(kf_active[:, None, None], kf_new, kf_p)
            lm_new = jax.vmap(lambda d, T: se3_exp(d) @ T)(dl, lm_p)
            lm_new = jnp.where(lm_active[:, None, None], lm_new, lm_p)

            cost1 = robust_cost(kf_new, lm_new)
            accept = (cost1 < cost0) & jnp.isfinite(cost1)
            kf_p = jnp.where(accept, kf_new, kf_p)
            lm_p = jnp.where(accept, lm_new, lm_p)
            lam = jnp.clip(
                jnp.where(accept, lam * 0.3, lam * 5.0), 1e-7, 1e6
            )
            return (kf_p, lm_p, lam), jnp.where(accept, cost1, cost0)

        init = (kf_pose, lm_pose, jnp.asarray(damping, dtype))
        (kf_p, lm_p, _), costs = jax.lax.scan(lm_step, init, None, length=iters)
        return kf_p, lm_p, costs[-1]

    kf_spec = P(axis)
    rep = P()
    fn = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(
            kf_spec, kf_spec,  # kf_pose, kf_active
            rep, rep,  # lm_pose, lm_active
            kf_spec, kf_spec, kf_spec, kf_spec,  # obs blocks (by owner)
            kf_spec, kf_spec, kf_spec,  # odom_T, odom_ok, odom_weight
            rep,  # Kmat
        ),
        out_specs=(kf_spec, rep, rep),
        check_vma=False,
    )
    jfn = jax.jit(fn)

    def run(prob: KeyframeBAProblem, Kmat):
        kf, lm, cost = jfn(
            prob.kf_pose, prob.kf_active,
            prob.lm_pose, prob.lm_active,
            prob.obs_kf, prob.obs_lm, prob.obs_uv, prob.obs_ok,
            prob.odom_T, prob.odom_ok, prob.odom_weight,
            Kmat,
        )
        return replace(prob, kf_pose=kf, lm_pose=lm), cost

    def lower_args(prob: KeyframeBAProblem, Kmat):
        return (
            prob.kf_pose, prob.kf_active, prob.lm_pose, prob.lm_active,
            prob.obs_kf, prob.obs_lm, prob.obs_uv, prob.obs_ok,
            prob.odom_T, prob.odom_ok, prob.odom_weight, Kmat,
        )

    run.jitted = jfn
    run.lower_args = lower_args
    return run


def keyframe_ba_cost(prob: KeyframeBAProblem, Kmat, tag_size: float,
                     huber_px: float = 4.0, odom_rot_weight: float = 25.0):
    """Host-side (unsharded) robust cost of a problem — the parity check
    between single-device and sharded solves."""
    dtype = prob.kf_pose.dtype
    obj = tag_object_corners(tag_size, dtype=dtype)
    z6 = jnp.zeros(6, dtype)
    oscale = jnp.asarray([odom_rot_weight] * 3 + [1.0] * 3, dtype)

    def rho_one(k, lm, uv, ok):
        rr = _obs_residual(z6, z6, prob.kf_pose[k], prob.lm_pose[lm], uv, obj,
                           jnp.asarray(Kmat, dtype))
        a = jnp.abs(rr)
        rho = jnp.where(a <= huber_px, rr * rr, huber_px * (2.0 * a - huber_px))
        return jnp.sum(rho) * ok.astype(dtype)

    c_obs = jnp.sum(jax.vmap(rho_one)(prob.obs_kf, prob.obs_lm, prob.obs_uv, prob.obs_ok))
    K = prob.n_keyframes
    odom_ok = prob.odom_ok & (jnp.arange(K) < K - 1)
    nxt = jnp.minimum(jnp.arange(K) + 1, K - 1)

    def od_one(k):
        r = _odom_residual(
            z6, z6, prob.kf_pose[k], prob.kf_pose[nxt[k]], prob.odom_T[k], oscale
        ) * prob.odom_weight[k] * odom_ok[k].astype(dtype)
        return jnp.sum(r * r)

    return c_obs + jnp.sum(jax.vmap(od_one)(jnp.arange(K)))
