"""Distributed bundle adjustment: landmark blocks sharded over the mesh.

Decomposition (the Schur-complement structure makes this natural):

* Landmark slots are partitioned over the ``lm`` mesh axis; each observation
  is OWNED by the device holding its landmark. All per-observation work —
  residuals, Jacobians, H_ll blocks, coupling blocks — happens exactly once
  on the owner.
* Camera-side quantities (H_cc, b_c) and the Schur-reduced camera system
  S = H_cc - W H_ll^-1 W^T are partial sums over observations, so one
  ``psum`` over the mesh assembles them; the (6K x 6K) reduced solve is
  replicated (tiny).
* The camera update delta_c is therefore identical on every device; each
  device back-substitutes only its own landmark updates. No other
  communication is needed — per LM iteration exactly two psums (S, rhs) plus
  one cost psum ride the ICI.
* The Schur assembly is SPARSE: per-observation coupling blocks grouped by
  landmark (slam/ba.py lm_obs_grid/schur_sparse), O(M_local * P^2) work and
  no (K, M, 6, 6) tensor — this is what lets the map scale to 10k+ landmarks
  (SURVEY §7 hard part 4).

This is the ≥80%-scaling design: the O(#obs) linearization and O(#landmarks)
block inversions shard perfectly; the psum payload is K^2*36 + K*6 floats
regardless of map size.

With ``data_axis`` set, the same kernel runs over a 2-D (data × lm) mesh:
independent sequences (or map sections) shard over ``data`` — across hosts /
DCN in a multi-process run — while each sequence's landmarks shard over
``lm`` (ICI). The psums stay on the ``lm`` axis only, so no traffic crosses
the data axis during optimization.
"""

from __future__ import annotations

import logging
import warnings
from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..geometry import se3_exp, tag_object_corners
from ..slam.ba import (
    BAState,
    _obs_residual,
    _huber_sqrt_weights,
    _damp_blocks,
    _solve_jacobi,
    lm_obs_grid,
    schur_sparse,
    backsub_sparse,
)

logger = logging.getLogger(__name__)


def shard_observations_by_owner(state: BAState, n_shards: int,
                                fit: bool = False) -> BAState:
    """Reorder the observation ring so each contiguous block holds the
    observations owned by one landmark shard (host-side prep; by default the
    arrays stay the same size, invalid slots padded per shard).

    Each shard owns landmark slots [s * M/n, (s+1) * M/n). Observations are
    bucketed by owner into equal-size blocks of O/n. Overflowing a block
    DROPS observations from the problem — that silently weakens BA, so it
    is surfaced as a real warning with the count; size the ring so it never
    fires (or rebalance the landmark partition).

    ``fit=True`` instead GROWS the ring so every observation fits: the block
    size becomes the largest shard's count (padded to a multiple of 8), and
    nothing is ever dropped. Use it for host-side batch solves; the fixed-
    capacity default is for in-pipeline rings whose shapes must not change.
    """
    M = state.n_landmarks
    O = state.n_obs_capacity
    if fit:
        owners = np.asarray(state.obs_lm)[np.asarray(state.obs_ok)] // max(M // n_shards, 1)
        per = int(np.bincount(owners, minlength=n_shards).max()) if owners.size else 1
        per = max(8, -8 * (-per // 8))  # round up to a multiple of 8
        O = per * n_shards
    else:
        per = O // n_shards
    lm_owner = np.asarray(state.obs_lm) // max(M // n_shards, 1)
    ok = np.asarray(state.obs_ok)

    new_kf = np.zeros(O, np.int32)
    new_lm = np.zeros(O, np.int32)
    new_uv = np.zeros((O, 4, 2), np.asarray(state.obs_uv).dtype)
    new_ok = np.zeros(O, bool)
    kf = np.asarray(state.obs_kf)
    lm = np.asarray(state.obs_lm)
    uv = np.asarray(state.obs_uv)
    dropped = 0
    for s in range(n_shards):
        idx_all = np.nonzero(ok & (lm_owner == s))[0]
        dropped += max(0, len(idx_all) - per)
        idx = idx_all[:per]
        dst = slice(s * per, s * per + len(idx))
        new_kf[dst] = kf[idx]
        new_lm[dst] = lm[idx]
        new_uv[dst] = uv[idx]
        new_ok[dst] = True
    if dropped:
        msg = (
            f"shard_observations_by_owner: {dropped} observation(s) exceed the "
            f"per-shard block of {per} and were DROPPED from BA — grow n_obs "
            f"(capacity {O}) or rebalance the landmark partition."
        )
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
        logger.warning(msg)
    return replace(
        state,
        obs_kf=jnp.asarray(new_kf),
        obs_lm=jnp.asarray(new_lm),
        obs_uv=jnp.asarray(new_uv),
        obs_ok=jnp.asarray(new_ok),
    )


def build_distributed_ba(
    mesh: Mesh,
    n_keyframes: int,
    n_landmarks: int,
    n_obs: int,
    tag_size: float,
    axis: str = "lm",
    iters: int = 8,
    damping: float = 1e-2,
    huber_px: float = 4.0,
    max_obs_per_lm: int = 0,
    data_axis: str | None = None,
):
    """Returns a jitted ``fn(state_sharded, Kmat) -> state_sharded`` running
    LM-BA with landmarks + observations sharded over ``axis``.

    ``state_sharded`` must have obs blocks grouped by owner
    (shard_observations_by_owner) and landmark arrays shardable by slot.

    With ``data_axis`` set, every state array carries a leading sequence
    dimension sharded over that mesh axis (2-D data x lm mesh): each
    sequence runs its own BA, landmark-sharded over ``axis``; use
    ``stack_ba_states`` to build the batched state.
    """
    n_dev = mesh.shape[axis]
    K = n_keyframes
    M = n_landmarks
    Ml = M // n_dev  # local landmarks per device
    Pcap = max_obs_per_lm or K

    def local_step(
        grid,  # (Ml, P) obs-by-landmark grouping (fixed across iterations)
        kf_pose,  # (K, 4, 4) replicated over lm
        lm_pose,  # (Ml, 4, 4) local shard
        lm_active,  # (Ml,)
        kf_active,  # (K,) replicated
        obs_kf,  # (Ol,) local
        obs_lm_local,  # (Ol,) LOCAL landmark ids of local obs
        obs_uv,  # (Ol, 4, 2)
        obs_ok,  # (Ol,)
        lam,
        Kmat,
    ):
        obj = tag_object_corners(tag_size, dtype=jnp.float32)
        z6 = jnp.zeros(6, jnp.float32)
        w = obs_ok.astype(jnp.float32)
        # Gauge left to Marquardt damping; anchor-relative consumers
        # conjugate by the refined anchor pose (see slam/ba.py).

        def one(kf, lml, uv, ww):
            lml = jnp.clip(lml, 0, Ml - 1)
            Twc = kf_pose[kf]
            Twt = lm_pose[lml]
            r = _obs_residual(z6, z6, Twc, Twt, uv, obj, Kmat)
            Jc = jax.jacfwd(_obs_residual, argnums=0)(z6, z6, Twc, Twt, uv, obj, Kmat)
            Jl = jax.jacfwd(_obs_residual, argnums=1)(z6, z6, Twc, Twt, uv, obj, Kmat)
            wh = _huber_sqrt_weights(r, huber_px) * ww
            return r * wh, Jc * wh[:, None], Jl * wh[:, None]

        r, Jc, Jl = jax.vmap(one)(obs_kf, obs_lm_local, obs_uv, w)

        def robust_cost_of(kf_p, lm_p):
            def one_rho(kf, lml, uv, ww):
                lml = jnp.clip(lml, 0, Ml - 1)
                rr = _obs_residual(z6, z6, kf_p[kf], lm_p[lml], uv, obj, Kmat)
                a = jnp.abs(rr)
                rho = jnp.where(a <= huber_px, rr * rr, huber_px * (2.0 * a - huber_px))
                return jnp.sum(rho) * ww
            return jax.lax.psum(
                jnp.sum(jax.vmap(one_rho)(obs_kf, obs_lm_local, obs_uv, w)), axis
            )

        lml_safe = jnp.clip(obs_lm_local, 0, Ml - 1)
        Hcc = jax.ops.segment_sum(jnp.einsum("ori,orj->oij", Jc, Jc), obs_kf, num_segments=K)
        bc = jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jc, r), obs_kf, num_segments=K)
        Hll = jax.ops.segment_sum(jnp.einsum("ori,orj->oij", Jl, Jl), lml_safe, num_segments=Ml)
        bl = jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jl, r), lml_safe, num_segments=Ml)
        A = jnp.einsum("ori,orj->oij", Jc, Jl)  # per-obs coupling blocks

        # Damping + inactive-slot priors.
        lm_prior = (1.0 - lm_active.astype(jnp.float32)) * 1e4
        Hll_d = _damp_blocks(Hll, lam, lm_prior)
        Hll_inv = jnp.linalg.inv(Hll_d)

        kf_prior = (1.0 - kf_active.astype(jnp.float32)) * 1e4
        # Hcc damping must be applied to the FULL (psum'd) Hcc, so damp a
        # zero block locally and add the assembled Hcc afterwards.
        Hcc_full = jax.lax.psum(Hcc, axis)
        Hcc_d = _damp_blocks(Hcc_full, lam, kf_prior)

        # Sparse Schur assembly on local blocks, then psum the partial
        # reduced system (diag Hcc_d added once after the psum).
        zero_d = jnp.zeros_like(Hcc_d)
        S_part, rhs_part = schur_sparse(
            grid, A, obs_kf, lml_safe, Hll_inv, zero_d, bc, bl, K
        )
        cost0 = robust_cost_of(kf_pose, lm_pose)

        S = jax.lax.psum(S_part, axis)
        rhs = jax.lax.psum(rhs_part, axis)
        S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc_d)
        Sd = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
        dc = -_solve_jacobi(Sd, rhs.reshape(K * 6)).reshape(K, 6)

        dl = backsub_sparse(A, obs_kf, lml_safe, Hll_inv, bl, dc, Ml)

        kf_new = jax.vmap(lambda d, T: se3_exp(d) @ T)(dc, kf_pose)
        kf_new = jnp.where(kf_active[:, None, None], kf_new, kf_pose)
        lm_new = jax.vmap(lambda d, T: se3_exp(d) @ T)(dl, lm_pose)
        lm_new = jnp.where(lm_active[:, None, None], lm_new, lm_pose)

        cost1 = robust_cost_of(kf_new, lm_new)
        accept = (cost1 < cost0) & jnp.isfinite(cost1)
        kf_pose = jnp.where(accept, kf_new, kf_pose)
        lm_pose = jnp.where(accept, lm_new, lm_pose)
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-7, 1e6)
        return kf_pose, lm_pose, lam, cost1

    def one_sequence(kf_pose, kf_active, lm_pose, lm_active,
                     obs_kf, obs_lm, obs_uv, obs_ok, Kmat):
        me = jax.lax.axis_index(axis)
        obs_lm_local = obs_lm - me * Ml
        grid, _ = lm_obs_grid(obs_lm_local, obs_ok, Ml, Pcap)

        def body(carry, _):
            kf, lm, lam = carry
            kf, lm, lam, cost = local_step(
                grid, kf, lm, lm_active, kf_active, obs_kf, obs_lm_local,
                obs_uv, obs_ok, lam, Kmat,
            )
            return (kf, lm, lam), cost

        init = (kf_pose, lm_pose, jnp.float32(damping))
        (kf, lm, _), costs = jax.lax.scan(body, init, None, length=iters)
        return kf, lm, costs[-1]

    if data_axis is None:
        def sharded_fn(kf_pose, kf_active, lm_pose, lm_active,
                       obs_kf, obs_lm, obs_uv, obs_ok, Kmat):
            return one_sequence(kf_pose, kf_active, lm_pose, lm_active,
                                obs_kf, obs_lm, obs_uv, obs_ok, Kmat)
        rep = P()
        lm_spec = P(axis)
        in_specs = (rep, rep, lm_spec, lm_spec,
                    lm_spec, lm_spec, lm_spec, lm_spec, rep)
        out_specs = (rep, lm_spec, rep)
    else:
        def sharded_fn(kf_pose, kf_active, lm_pose, lm_active,
                       obs_kf, obs_lm, obs_uv, obs_ok, Kmat):
            return jax.vmap(
                lambda a, b, c, d, e, f, g, h: one_sequence(a, b, c, d, e, f, g, h, Kmat)
            )(kf_pose, kf_active, lm_pose, lm_active, obs_kf, obs_lm, obs_uv, obs_ok)
        d = data_axis
        seq_rep = P(d)
        seq_lm = P(d, axis)
        in_specs = (seq_rep, seq_rep, seq_lm, seq_lm,
                    seq_lm, seq_lm, seq_lm, seq_lm, P())
        out_specs = (seq_rep, seq_lm, seq_rep)

    fn = shard_map(
        sharded_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    jfn = jax.jit(fn)

    def run(state: BAState, Kmat):
        kf, lm, cost = jfn(
            state.kf_pose, state.kf_active,
            state.lm_pose, state.lm_active,
            state.obs_kf, state.obs_lm, state.obs_uv, state.obs_ok,
            Kmat,
        )
        new = replace(state, kf_pose=kf, lm_pose=lm)
        if data_axis is None:
            return new, float(cost)
        try:
            return new, np.asarray(cost)
        except RuntimeError:
            # multi-process: the per-sequence costs are sharded over hosts;
            # hand the global array back to the caller (read your own
            # addressable shards or gather via multihost helpers).
            return new, cost

    def lower_args(state: BAState):
        """Argument tuple for run.jitted — for cost-analysis/AOT tooling."""
        return (
            state.kf_pose, state.kf_active,
            state.lm_pose, state.lm_active,
            state.obs_kf, state.obs_lm, state.obs_uv, state.obs_ok,
        )

    run.jitted = jfn
    run.lower_args = lower_args
    return run


def stack_ba_states(states: list[BAState]) -> BAState:
    """Stack per-sequence BAStates along a leading data axis (host-side)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)
