"""Sliding-window bundle adjustment with Schur-complement elimination.

The reference has no optimizer at all — its backend is one-shot transform
chaining plus matrix averaging, with covariance and `update_world` left as
TODOs (slam_graph.py:3, 72-76). This module is the real factor-graph backend
the BASELINE north star requires:

* **State**: fixed-capacity keyframe window (ring buffer), tag-landmark
  poses, and an observation ring — all static shapes, jit-native.
* **Factors**: tag-corner reprojection (8 residuals per observation: 4
  corners x 2), camera pose + landmark pose both optimized.
* **Solver**: Levenberg-Marquardt with Huber-IRLS robust weighting. The
  normal equations are built with segment-sums (pure einsum/scatter work ->
  MXU/VPU), the landmark block is eliminated via the Schur complement
  (landmark blocks are 6x6, inverted batched), and the reduced camera system
  (6K x 6K, small) is solved dense with Jacobi preconditioning — required
  for float32 on TPU, where the raw reduced system's condition number
  (~1e10: rotation/translation scale mismatch x weak planar depth) makes an
  unpreconditioned solve return garbage steps that LM then rejects forever.
  Damping is Marquardt-style (lambda * diag(H)), and lambda is carried in
  the state so per-frame incremental calls resume the schedule instead of
  restarting it. Gauge freedom is fixed EXACTLY by treating the anchor
  landmark as a constant (its Jacobian is zeroed).
* **Distribution**: landmark blocks shard over devices; the reduced camera
  system is psum-reduced across the mesh (parallel/distributed_ba.py).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3_exp, se3_inverse, tag_object_corners


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "kf_pose", "kf_active", "kf_ptr",
        "lm_pose", "lm_active",
        "obs_kf", "obs_lm", "obs_uv", "obs_ok", "obs_ptr",
        "anchor", "lam", "frame_count",
    ],
    meta_fields=[],
)
@dataclass(frozen=True)
class BAState:
    kf_pose: jax.Array  # (K, 4, 4) camera->world (T_wc)
    kf_active: jax.Array  # (K,) bool
    kf_ptr: jax.Array  # () int32 next write slot
    lm_pose: jax.Array  # (M, 4, 4) tag->world (slot = tag id)
    lm_active: jax.Array  # (M,) bool
    obs_kf: jax.Array  # (O,) int32
    obs_lm: jax.Array  # (O,) int32
    obs_uv: jax.Array  # (O, 4, 2)
    obs_ok: jax.Array  # (O,) bool
    obs_ptr: jax.Array  # () int32
    anchor: jax.Array  # () int32 gauge landmark slot (-1 = none yet)
    lam: jax.Array  # () LM damping, persisted across incremental calls
    # Total frames processed (not keyframes adopted). Keyframe cadence
    # (pipeline kf_every) must be driven by a PERSISTENT counter: a
    # chunk-local scan index resets its phase at every chunk boundary, so
    # kf_every > chunk length degenerates to one adoption per chunk.
    frame_count: jax.Array  # () int32

    @property
    def n_keyframes(self) -> int:
        return int(self.kf_pose.shape[0])

    @property
    def n_landmarks(self) -> int:
        return int(self.lm_pose.shape[0])

    @property
    def n_obs_capacity(self) -> int:
        return int(self.obs_kf.shape[0])


def ba_init(n_keyframes: int = 16, n_landmarks: int = 64, n_obs: int = 512,
            dtype=jnp.float32) -> BAState:
    eyeK = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (n_keyframes, 4, 4))
    eyeM = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (n_landmarks, 4, 4))
    return BAState(
        kf_pose=eyeK,
        kf_active=jnp.zeros((n_keyframes,), bool),
        kf_ptr=jnp.int32(0),
        lm_pose=eyeM,
        lm_active=jnp.zeros((n_landmarks,), bool),
        obs_kf=jnp.zeros((n_obs,), jnp.int32),
        obs_lm=jnp.zeros((n_obs,), jnp.int32),
        obs_uv=jnp.zeros((n_obs, 4, 2), dtype),
        obs_ok=jnp.zeros((n_obs,), bool),
        obs_ptr=jnp.int32(0),
        anchor=jnp.int32(-1),
        lam=jnp.asarray(1e-2, dtype),
        frame_count=jnp.int32(0),
    )


def ba_add_frame(
    state: BAState,
    ids: jax.Array,  # (D,) int32 detection tag ids
    corners: jax.Array,  # (D, 4, 2)
    ok: jax.Array,  # (D,) bool
    T_wc: jax.Array,  # (4, 4) initial camera pose in world frame
    T_cam_tag: jax.Array,  # (D, 4, 4) per-detection PnP poses (for new lms)
    seed_ok: jax.Array | None = None,  # (D,) bool: pose reliable for lm init
) -> BAState:
    """Insert a keyframe + its observations; initialize unseen landmarks.

    The keyframe ring overwrites the oldest slot (fixed-lag window); its old
    observations are invalidated by slot match.

    ``seed_ok`` gates LANDMARK INITIALIZATION (and the observations of a
    still-uninitialized landmark) separately from plain observation validity:
    corner observations are pose-branch-agnostic, but a landmark seeded from
    a planar-ambiguous PnP pose (pose/pnp.py ambiguity ratio near 1) lands on
    the wrong side of the camera and becomes a poisoned local minimum.
    """
    K = state.n_keyframes
    M = state.n_landmarks
    O = state.n_obs_capacity
    D = ids.shape[0]
    T_wc = T_wc.astype(state.kf_pose.dtype)
    T_cam_tag = T_cam_tag.astype(state.kf_pose.dtype)

    slot = state.kf_ptr % K
    kf_pose = state.kf_pose.at[slot].set(T_wc)
    kf_active = state.kf_active.at[slot].set(True)
    # Drop observations that referenced the recycled keyframe slot.
    obs_ok = state.obs_ok & (state.obs_kf != slot)

    if seed_ok is None:
        seed_ok = ok
    in_range = ok & (ids >= 0) & (ids < M)
    # Invalid entries scatter out of bounds and are dropped — clipping them
    # into range would make them race with valid writes to the same slot.
    lm_slot = jnp.where(in_range, jnp.clip(ids, 0, M - 1), M)
    # Accept an observation only if its landmark is (or is being) initialized
    # from a reliable pose — an active landmark, or a seedable detection.
    in_range = in_range & (state.lm_active[jnp.clip(lm_slot, 0, M - 1)] | seed_ok)
    lm_slot = jnp.where(in_range, jnp.clip(ids, 0, M - 1), M)

    # Anchor: lowest id ever seen (parity with the chaining graph's world
    # frame so GT comparison stays in the same frame).
    min_id = jnp.min(jnp.where(in_range, ids, jnp.int32(2**30)))
    anchor = jnp.where(
        state.anchor < 0,
        jnp.where(min_id < 2**30, min_id, jnp.int32(-1)),
        state.anchor,
    ).astype(jnp.int32)

    # New landmarks: T_wt = T_wc @ T_cam_tag.
    lm_init = jnp.einsum("ij,djk->dik", T_wc, T_cam_tag)
    is_new = in_range & ~state.lm_active[lm_slot]
    lm_pose = state.lm_pose.at[lm_slot].set(
        jnp.where(is_new[:, None, None], lm_init, state.lm_pose[lm_slot]), mode="drop"
    )
    lm_active = state.lm_active.at[lm_slot].set(
        state.lm_active[lm_slot] | in_range, mode="drop"
    )

    # Append observations at the ring pointer.
    idx = (state.obs_ptr + jnp.arange(D, dtype=jnp.int32)) % O
    obs_kf = state.obs_kf.at[idx].set(jnp.where(in_range, slot, state.obs_kf[idx]))
    obs_lm = state.obs_lm.at[idx].set(jnp.where(in_range, lm_slot, state.obs_lm[idx]))
    obs_uv = state.obs_uv.at[idx].set(
        jnp.where(in_range[:, None, None], corners.astype(state.obs_uv.dtype), state.obs_uv[idx])
    )
    obs_ok = obs_ok.at[idx].set(jnp.where(in_range, True, obs_ok[idx]))
    # Advance pointer only past written entries to avoid holes: advance by D
    # regardless (invalid entries stay marked not-ok).
    return replace(
        state,
        kf_pose=kf_pose,
        kf_active=kf_active,
        kf_ptr=state.kf_ptr + 1,
        lm_pose=lm_pose,
        lm_active=lm_active,
        obs_kf=obs_kf,
        obs_lm=obs_lm,
        obs_uv=obs_uv,
        obs_ok=obs_ok,
        obs_ptr=(state.obs_ptr + D) % O,
        anchor=anchor,
    )


def _obs_residual(xi_c, xi_l, T_wc, T_wt, uv, obj, Kmat):
    """8-vector reprojection residual for one observation with tangent
    perturbations xi_c (camera) and xi_l (landmark)."""
    T_wc = se3_exp(xi_c) @ T_wc
    T_wt = se3_exp(xi_l) @ T_wt
    T_ct = se3_inverse(T_wc) @ T_wt
    p = obj @ T_ct[:3, :3].T + T_ct[:3, 3]
    z = jnp.where(jnp.abs(p[:, 2:3]) < 1e-6, 1e-6, p[:, 2:3])
    xy = p[:, :2] / z
    proj = jnp.stack(
        [Kmat[0, 0] * xy[:, 0] + Kmat[0, 2], Kmat[1, 1] * xy[:, 1] + Kmat[1, 2]], axis=-1
    )
    return (proj - uv).reshape(-1)


def ba_cost(state: BAState, Kmat: jax.Array, tag_size: float) -> jax.Array:
    obj = tag_object_corners(tag_size, dtype=state.kf_pose.dtype)
    z6 = jnp.zeros(6, dtype=state.kf_pose.dtype)

    def one(kf, lm, uv, okf):
        r = _obs_residual(z6, z6, state.kf_pose[kf], state.lm_pose[lm], uv, obj, Kmat)
        return jnp.sum(r * r) * okf

    costs = jax.vmap(one)(state.obs_kf, state.obs_lm, state.obs_uv,
                          state.obs_ok.astype(state.kf_pose.dtype))
    return jnp.sum(costs)


def _huber_sqrt_weights(r: jax.Array, delta: float) -> jax.Array:
    """Per-residual sqrt(IRLS weight) for a Huber loss with threshold delta."""
    a = jnp.abs(r)
    return jnp.sqrt(jnp.minimum(1.0, delta / jnp.maximum(a, 1e-12)))


def _damp_blocks(H: jax.Array, lam: jax.Array, prior: jax.Array) -> jax.Array:
    """Marquardt damping on (N, 6, 6) blocks: H + lam*diag(H) + prior*I.

    Per-coordinate diag scaling handles the rotation/translation (and
    strong/weak direction) scale mismatch that a scalar lam*I cannot.
    """
    dg = jnp.clip(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-4, None)  # (N, 6)
    eye6 = jnp.eye(6, dtype=H.dtype)
    return (
        H
        + lam * dg[..., None] * eye6
        + (prior[:, None, None] + 1e-6) * eye6
    )


def _solve_jacobi(Sd: jax.Array, rhs: jax.Array) -> jax.Array:
    """Solve Sd x = rhs with Jacobi (diagonal) preconditioning.

    float32 on TPU cannot solve the raw reduced camera system (condition
    ~1e10 from mixed rotation/translation scales); symmetric diagonal
    scaling brings it into range.
    """
    d = jnp.clip(jnp.abs(jnp.diagonal(Sd)), 1e-8, None)
    m = 1.0 / jnp.sqrt(d)
    Ss = Sd * m[:, None] * m[None, :]
    y = jnp.linalg.solve(Ss, rhs * m)
    return y * m


def lm_obs_grid(obs_lm: jax.Array, obs_ok: jax.Array, M: int, P: int):
    """Group observation indices by landmark into a static (M, P) grid.

    Returns ``(grid, overflow)`` where ``grid[m, p]`` is the index of the
    p-th observation of landmark m (sentinel O = "empty"; gather a zero
    padding row there) and ``overflow`` counts valid observations beyond P
    per landmark that did NOT fit (the caller should size P generously and
    surface the count — silent truncation is a correctness bug).

    This is the sparsity structure of the Schur coupling: keyframes i and j
    interact only through landmarks both observe, so all pair work is
    O(M * P^2) instead of the dense O(K^2 * M).
    """
    O = obs_lm.shape[0]
    key = jnp.where(obs_ok, obs_lm, M).astype(jnp.int32)
    order = jnp.argsort(key).astype(jnp.int32)
    slm = key[order]
    idx = jnp.arange(O, dtype=jnp.int32)
    # rank within each run of equal landmark ids: idx - start-of-run,
    # where start-of-run propagates via a running max.
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), slm[1:] != slm[:-1]]
    )
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, idx, 0))
    rank = idx - run_start
    valid = slm < M
    m_idx = jnp.where(valid & (rank < P), slm, M)
    p_idx = jnp.minimum(rank, P - 1)
    grid = jnp.full((M, P), O, jnp.int32)
    grid = grid.at[m_idx, p_idx].set(order, mode="drop")
    overflow = jnp.sum(valid & (rank >= P))
    return grid, overflow


def schur_sparse(grid, A, obs_kf, obs_lm, Hll_inv, Hcc_d, bc, bl, K):
    """Assemble the reduced camera system from per-observation coupling
    blocks A_o = Jc_o^T Jl_o without materializing the (K, M, 6, 6) W.

    S = blockdiag(Hcc_d) - sum_m sum_{p,q in obs(m)} A_p Hll_inv_m A_q^T
    rhs = bc - sum_o A_o (Hll_inv_{m_o} bl_{m_o})

    Invalid observations carry A_o = 0 (the Jacobians are weighted by the
    ok mask), so no extra masking is needed beyond the grid's drop-scatter.
    """
    O = A.shape[0]
    Mi, P = grid.shape
    Ap = jnp.concatenate([A, jnp.zeros((1, 6, 6), A.dtype)])  # zero padding row
    kfp = jnp.concatenate([obs_kf.astype(jnp.int32), jnp.zeros((1,), jnp.int32)])
    G = Ap[grid]  # (M, P, 6, 6)
    kf_g = jnp.where(grid < O, kfp[grid], K)  # out-of-range -> dropped
    GH = jnp.einsum("mpab,mbc->mpac", G, Hll_inv)
    pair = jnp.einsum("mpac,mqdc->mpqad", GH, G)  # (M, P, P, 6, 6)
    ki = jnp.broadcast_to(kf_g[:, :, None], (Mi, P, P)).reshape(-1)
    kj = jnp.broadcast_to(kf_g[:, None, :], (Mi, P, P)).reshape(-1)
    S = jnp.zeros((K, K, 6, 6), A.dtype)
    S = S.at[ki, kj].add(-pair.reshape(-1, 6, 6), mode="drop")
    S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc_d)
    Hb = jnp.einsum("mab,mb->ma", Hll_inv, bl)  # (M, 6)
    rhs = bc - jax.ops.segment_sum(
        jnp.einsum("oab,ob->oa", A, Hb[obs_lm]), obs_kf, num_segments=K
    )
    return S, rhs


def backsub_sparse(A, obs_kf, obs_lm, Hll_inv, bl, dc, M):
    """Landmark back-substitution dl = -Hll_inv (bl + W^T dc) from
    per-observation blocks: W_m^T dc = sum_{o in m} A_o^T dc_{k_o}."""
    Wtdc = jax.ops.segment_sum(
        jnp.einsum("oab,oa->ob", A, dc[obs_kf]), obs_lm, num_segments=M
    )
    return -jnp.einsum("mab,mb->ma", Hll_inv, bl + Wtdc)


@partial(jax.jit, static_argnames=("iters", "tag_size", "coupling", "max_obs_per_lm"))
def ba_optimize(
    state: BAState,
    Kmat: jax.Array,
    tag_size: float,
    iters: int = 8,
    huber_px: float = 4.0,
    coupling: str = "auto",
    max_obs_per_lm: int = 0,
) -> BAState:
    """Levenberg-Marquardt over keyframe + landmark poses (Schur-eliminated).

    The LM damping lambda is read from and written back to the state, so
    incremental per-frame calls continue the schedule.

    ``coupling`` selects how the reduced camera system is assembled:
    "dense" materializes the (K, M, 6, 6) W (fine for the sliding window),
    "sparse" uses per-observation Schur contributions grouped by landmark
    (O(M P^2) instead of O(K^2 M) — required for big maps), "auto" picks
    sparse once K*M blocks would exceed the window-scale regime.
    ``max_obs_per_lm`` caps P for the sparse grid (0 = use K, always safe
    for the keyframe ring since a landmark has at most one obs per slot).
    """
    K = state.n_keyframes
    M = state.n_landmarks
    dtype = state.kf_pose.dtype
    obj = tag_object_corners(tag_size, dtype=dtype)
    z6 = jnp.zeros(6, dtype=dtype)
    Kmat = Kmat.astype(dtype)

    if coupling == "auto":
        coupling = "sparse" if K * M > 4096 else "dense"
    use_sparse = coupling == "sparse"
    P = max_obs_per_lm or K
    if use_sparse:
        # Structure is fixed across LM iterations (poses change, the obs
        # pattern does not) — build the landmark-grouped grid once.
        grid, _overflow = lm_obs_grid(state.obs_lm, state.obs_ok, M, P)

    okf = state.obs_ok.astype(dtype)
    # Gauge: the 6-dof world-frame freedom is left to the Marquardt damping
    # (the null-space direction has zero curvature, so its damped step is
    # zero). Hard-freezing the anchor landmark instead would pin the whole
    # map to the anchor's single-observation seed pose; consumers that need
    # an anchor-relative pose conjugate by the anchor's REFINED pose, so the
    # residual gauge drift cancels exactly (slam/pipeline.py BA branch).
    lm_free = jnp.ones_like(okf)

    def robust_cost(kf_p, lm_p):
        def one(kf, lm, uv, w):
            rr = _obs_residual(z6, z6, kf_p[kf], lm_p[lm], uv, obj, Kmat)
            a = jnp.abs(rr)
            # Huber loss value (not the IRLS quadratic): rho(a).
            rho = jnp.where(a <= huber_px, rr * rr, huber_px * (2.0 * a - huber_px))
            return jnp.sum(rho) * w
        return jnp.sum(jax.vmap(one)(state.obs_kf, state.obs_lm, state.obs_uv, okf))

    def linearize(kf_pose, lm_pose):
        def one(kf, lm, uv, w, wl):
            Twc = kf_pose[kf]
            Twt = lm_pose[lm]
            r = _obs_residual(z6, z6, Twc, Twt, uv, obj, Kmat)
            Jc = jax.jacfwd(_obs_residual, argnums=0)(z6, z6, Twc, Twt, uv, obj, Kmat)
            Jl = jax.jacfwd(_obs_residual, argnums=1)(z6, z6, Twc, Twt, uv, obj, Kmat)
            wh = _huber_sqrt_weights(r, huber_px) * w  # (8,)
            return r * wh, Jc * wh[:, None], Jl * wh[:, None] * wl

        r, Jc, Jl = jax.vmap(one)(state.obs_kf, state.obs_lm, state.obs_uv, okf, lm_free)
        # Normal-equation blocks via segment sums.
        Hcc = jax.ops.segment_sum(
            jnp.einsum("ori,orj->oij", Jc, Jc), state.obs_kf, num_segments=K
        )  # (K, 6, 6)
        Hll = jax.ops.segment_sum(
            jnp.einsum("ori,orj->oij", Jl, Jl), state.obs_lm, num_segments=M
        )  # (M, 6, 6)
        bc = jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jc, r), state.obs_kf, num_segments=K)
        bl = jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jl, r), state.obs_lm, num_segments=M)
        A = jnp.einsum("ori,orj->oij", Jc, Jl)  # per-obs coupling blocks
        return Hcc, Hll, bc, bl, A

    def lm_step(carry, _):
        kf_pose, lm_pose, lam = carry
        Hcc, Hll, bc, bl, A = linearize(kf_pose, lm_pose)
        cost0 = robust_cost(kf_pose, lm_pose)

        lm_prior = (1.0 - state.lm_active.astype(dtype)) * 1e4
        Hll_d = _damp_blocks(Hll, lam, lm_prior)
        kf_prior = (1.0 - state.kf_active.astype(dtype)) * 1e4
        Hcc_d = _damp_blocks(Hcc, lam, kf_prior)

        Hll_inv = jnp.linalg.inv(Hll_d)  # (M, 6, 6) batched
        if use_sparse:
            S, rhs = schur_sparse(
                grid, A, state.obs_kf, state.obs_lm, Hll_inv, Hcc_d, bc, bl, K
            )
        else:
            # Dense W: scatter per-obs blocks into (K, M, 6, 6).
            Wkm = jnp.zeros((K, M, 6, 6), dtype)
            Wkm = Wkm.at[state.obs_kf, state.obs_lm].add(A)
            WH = jnp.einsum("kmab,mbc->kmac", Wkm, Hll_inv)
            S = -jnp.einsum("kmac,lmdc->klad", WH, Wkm)
            S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc_d)
            rhs = bc - jnp.einsum("kmab,mb->ka", WH, bl)  # (K, 6)
        Sd = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
        dc = -_solve_jacobi(Sd, rhs.reshape(K * 6)).reshape(K, 6)
        dl = backsub_sparse(A, state.obs_kf, state.obs_lm, Hll_inv, bl, dc, M)

        kf_new = jax.vmap(lambda d, T: se3_exp(d) @ T)(dc, kf_pose)
        lm_new = jax.vmap(lambda d, T: se3_exp(d) @ T)(dl, lm_pose)
        kf_new = jnp.where(state.kf_active[:, None, None], kf_new, kf_pose)
        lm_new = jnp.where(state.lm_active[:, None, None], lm_new, lm_pose)

        cost1 = robust_cost(kf_new, lm_new)
        accept = (cost1 < cost0) & jnp.isfinite(cost1)
        kf_pose = jnp.where(accept, kf_new, kf_pose)
        lm_pose = jnp.where(accept, lm_new, lm_pose)
        lam = jnp.where(accept, lam * 0.3, lam * 5.0)
        lam = jnp.clip(lam, 1e-7, 1e6)
        return (kf_pose, lm_pose, lam), cost1

    (kf_pose, lm_pose, lam), _ = jax.lax.scan(
        lm_step, (state.kf_pose, state.lm_pose, state.lam), None, length=iters
    )
    return replace(state, kf_pose=kf_pose, lm_pose=lm_pose, lam=lam)


def latest_pose(state: BAState) -> jax.Array:
    """Camera pose of the most recently added keyframe."""
    slot = (state.kf_ptr - 1) % state.n_keyframes
    return state.kf_pose[slot]
