"""Distributed bundle adjustment: landmark blocks sharded over the mesh.

Decomposition (the Schur-complement structure makes this natural):

* Landmark slots are partitioned over the ``lm`` mesh axis; each observation
  is OWNED by the device holding its landmark. All per-observation work —
  residuals, Jacobians, H_ll blocks, W coupling blocks — happens exactly once
  on the owner.
* Camera-side quantities (H_cc, b_c) and the Schur-reduced camera system
  S = H_cc - W H_ll^-1 W^T are partial sums over observations, so one
  ``psum`` over the mesh assembles them; the (6K x 6K) reduced solve is
  replicated (tiny).
* The camera update delta_c is therefore identical on every device; each
  device back-substitutes only its own landmark updates. No other
  communication is needed — per LM iteration exactly two psums (S, rhs) plus
  one cost psum ride the ICI.

This is the ≥80%-scaling design: the O(#obs) linearization and O(#landmarks)
block inversions shard perfectly; the psum payload is K^2*36 + K*6 floats
regardless of map size.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..geometry import se3_exp, tag_object_corners
from ..slam.ba import BAState, _obs_residual, _huber_sqrt_weights, _damp_blocks, _solve_jacobi


def shard_observations_by_owner(state: BAState, n_shards: int) -> BAState:
    """Reorder the observation ring so each contiguous block holds the
    observations owned by one landmark shard (host-side prep; the arrays
    stay the same size, invalid slots padded per shard).

    Each shard owns landmark slots [s * M/n, (s+1) * M/n). Observations are
    bucketed by owner into equal-size blocks of O/n (overflow dropped with a
    warning — size the ring generously).
    """
    M = state.n_landmarks
    O = state.n_obs_capacity
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
    for s in range(n_shards):
        idx = np.nonzero(ok & (lm_owner == s))[0][:per]
        dst = slice(s * per, s * per + len(idx))
        new_kf[dst] = kf[idx]
        new_lm[dst] = lm[idx]
        new_uv[dst] = uv[idx]
        new_ok[dst] = True
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
):
    """Returns a jitted ``fn(state_sharded, Kmat) -> state_sharded`` running
    LM-BA with landmarks + observations sharded over ``axis``.

    ``state_sharded`` must have obs blocks grouped by owner
    (shard_observations_by_owner) and landmark arrays shardable by slot.
    """
    n_dev = mesh.shape[axis]
    K = n_keyframes
    M = n_landmarks
    Ml = M // n_dev  # local landmarks per device

    def local_step(
        kf_pose,  # (K, 4, 4) replicated
        lm_pose,  # (Ml, 4, 4) local shard
        lm_active,  # (Ml,)
        kf_active,  # (K,) replicated
        obs_kf,  # (Ol,) local
        obs_lm,  # (Ol,) GLOBAL landmark ids of local obs
        obs_uv,  # (Ol, 4, 2)
        obs_ok,  # (Ol,)
        anchor,  # () replicated
        lam,
        Kmat,
    ):
        me = jax.lax.axis_index(axis)
        base = me * Ml
        obs_lm_local = obs_lm - base  # local indices within this shard
        obj = tag_object_corners(tag_size, dtype=jnp.float32)
        z6 = jnp.zeros(6, jnp.float32)
        w = obs_ok.astype(jnp.float32)
        # Gauge left to Marquardt damping; anchor-relative consumers
        # conjugate by the refined anchor pose (see slam/ba.py).
        lm_free = jnp.ones_like(w)

        def one(kf, lml, uv, ww, wl):
            lml = jnp.clip(lml, 0, Ml - 1)
            Twc = kf_pose[kf]
            Twt = lm_pose[lml]
            r = _obs_residual(z6, z6, Twc, Twt, uv, obj, Kmat)
            Jc = jax.jacfwd(_obs_residual, argnums=0)(z6, z6, Twc, Twt, uv, obj, Kmat)
            Jl = jax.jacfwd(_obs_residual, argnums=1)(z6, z6, Twc, Twt, uv, obj, Kmat)
            wh = _huber_sqrt_weights(r, huber_px) * ww
            return r * wh, Jc * wh[:, None], Jl * wh[:, None] * wl

        r, Jc, Jl = jax.vmap(one)(obs_kf, obs_lm_local, obs_uv, w, lm_free)

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

        Hcc = jax.ops.segment_sum(jnp.einsum("ori,orj->oij", Jc, Jc), obs_kf, num_segments=K)
        bc = jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jc, r), obs_kf, num_segments=K)
        lml_safe = jnp.clip(obs_lm_local, 0, Ml - 1)
        Hll = jax.ops.segment_sum(jnp.einsum("ori,orj->oij", Jl, Jl), lml_safe, num_segments=Ml)
        bl = jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jl, r), lml_safe, num_segments=Ml)
        Wkm = jnp.zeros((K, Ml, 6, 6), jnp.float32)
        Wkm = Wkm.at[obs_kf, lml_safe].add(jnp.einsum("ori,orj->oij", Jc, Jl))

        # Damping + inactive-slot priors (the anchor's Jl is already zeroed).
        lm_prior = (1.0 - lm_active.astype(jnp.float32)) * 1e4
        Hll_d = _damp_blocks(Hll, lam, lm_prior)
        Hll_inv = jnp.linalg.inv(Hll_d)

        WH = jnp.einsum("kmab,mbc->kmac", Wkm, Hll_inv)
        S_part = -jnp.einsum("kmac,lmdc->klad", WH, Wkm)  # (K, K, 6, 6)
        rhs_part = bc - jnp.einsum("kmab,mb->ka", WH, bl)

        # Assemble camera-side quantities across shards.
        Hcc_full = jax.lax.psum(Hcc, axis)
        S = jax.lax.psum(S_part, axis)
        rhs = jax.lax.psum(rhs_part, axis)
        cost0 = robust_cost_of(kf_pose, lm_pose)

        kf_prior = (1.0 - kf_active.astype(jnp.float32)) * 1e4
        Hcc_d = _damp_blocks(Hcc_full, lam, kf_prior)
        S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc_d)
        Sd = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
        dc = -_solve_jacobi(Sd, rhs.reshape(K * 6)).reshape(K, 6)

        dl = -jnp.einsum("mab,mb->ma", Hll_inv, bl + jnp.einsum("kmab,ka->mb", Wkm, dc))

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

    def sharded_fn(kf_pose, kf_active, anchor, lm_pose, lm_active,
                   obs_kf, obs_lm, obs_uv, obs_ok, Kmat):
        def body(carry, _):
            kf, lm, lam = carry
            kf, lm, lam, cost = local_step(
                kf, lm, lm_active, kf_active, obs_kf, obs_lm, obs_uv, obs_ok,
                anchor, lam, Kmat,
            )
            return (kf, lm, lam), cost
        init = (kf_pose, lm_pose, jnp.float32(damping))
        (kf, lm, _), costs = jax.lax.scan(body, init, None, length=iters)
        return kf, lm, costs[-1]

    rep = P()
    lm_spec = P(axis)
    fn = shard_map(
        sharded_fn,
        mesh=mesh,
        in_specs=(rep, rep, rep, lm_spec, lm_spec, lm_spec, lm_spec, lm_spec, lm_spec, rep),
        out_specs=(rep, lm_spec, rep),
        check_vma=False,
    )
    jfn = jax.jit(fn)

    def run(state: BAState, Kmat):
        kf, lm, cost = jfn(
            state.kf_pose, state.kf_active, state.anchor,
            state.lm_pose, state.lm_active,
            state.obs_kf, state.obs_lm, state.obs_uv, state.obs_ok,
            Kmat,
        )
        return replace(state, kf_pose=kf, lm_pose=lm), float(cost)

    return run
