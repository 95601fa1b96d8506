"""Landmark (tag-to-tag) pose graph tests: accumulation, outlier gating,
solve convergence, and gauge behavior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aprilslam_tpu.geometry import se3_exp, se3_inverse
from aprilslam_tpu.slam.taggraph import (
    TagGraphState,
    taggraph_init,
    taggraph_accumulate,
    taggraph_edges,
    taggraph_solve,
)


def _chain_world(n, step=12.0):
    """Ground-truth tag poses along a line with mild rotations."""
    return np.stack([
        np.array(se3_exp(jnp.asarray([0, 0.02 * t, 0, step * t, 0.3 * t, 0.1])))
        for t in range(n)
    ])


def _observe(Tw, tags, rng, noise=0.005):
    """One frame: a camera somewhere, PnP-style tag-in-camera observations."""
    T_wc = np.array(se3_exp(jnp.asarray(rng.normal(scale=1.0, size=6))))
    D = 4
    ids = np.full(D, -1, np.int32)
    T_obs = np.tile(np.eye(4), (D, 1, 1))
    rel = np.zeros(D, bool)
    for k, tag in enumerate(tags):
        n = np.array(se3_exp(jnp.asarray(rng.normal(scale=noise, size=6))))
        ids[k] = tag
        T_obs[k] = np.linalg.inv(T_wc) @ Tw[tag] @ n
        rel[k] = True
    return ids, T_obs, rel


class TestAccumulate:
    @pytest.mark.slow
    def test_counts_and_mean(self, rng):
        M = 8
        Tw = _chain_world(3)
        tg = taggraph_init(M)
        ids_l, T_l, r_l = zip(*[_observe(Tw, [0, 1], rng) for _ in range(20)])
        tg = taggraph_accumulate(
            tg, jnp.asarray(np.stack(ids_l)), jnp.asarray(np.stack(T_l)),
            jnp.asarray(np.stack(r_l)),
        )
        cnt = np.asarray(tg.count)
        assert cnt[0, 1] == 20
        assert cnt.sum() == 20  # only the (0, 1) ordered pair
        edges = taggraph_edges(tg, jnp.ones((M,), bool))
        e = int(np.argmax(np.asarray(edges.ok)))
        gt_rel = np.linalg.inv(Tw[0]) @ Tw[1]
        err = np.linalg.norm(np.asarray(edges.T_meas[e]) - gt_rel)
        # 20 averaged sightings at 0.005 tangent noise -> tiny edge error.
        assert err < 0.05, err

    def test_unreliable_and_out_of_range_ignored(self, rng):
        M = 8
        Tw = _chain_world(3)
        tg = taggraph_init(M)
        ids, T_obs, rel = _observe(Tw, [0, 1], rng)
        rel[1] = False  # unreliable partner -> no pair
        tg = taggraph_accumulate(
            tg, jnp.asarray(ids), jnp.asarray(T_obs), jnp.asarray(rel))
        assert np.asarray(tg.count).sum() == 0
        ids2 = ids.copy()
        ids2[1] = M + 3  # out of range
        tg = taggraph_accumulate(
            tg, jnp.asarray(ids2), jnp.asarray(T_obs),
            jnp.asarray(np.ones_like(rel)))
        assert np.asarray(tg.count).sum() == 0

    @pytest.mark.slow
    def test_outlier_rejected_after_reference(self, rng):
        """A wrong-planar-branch measurement (large deviation from the
        pair's reference) must not poison the running mean — even when the
        outlier WINS the reference election (the self-healing reset kicks
        in and a later chunk re-elects)."""
        M = 8
        Tw = _chain_world(3)
        tg = taggraph_init(M)
        good = [_observe(Tw, [0, 1], rng) for _ in range(10)]
        ids_l, T_l, r_l = map(list, zip(*good))
        # outlier: tag 1 observed with a flipped/rotated pose far off
        ids_o, T_o, r_o = _observe(Tw, [0, 1], rng)
        T_o[1] = T_o[1] @ np.array(se3_exp(jnp.asarray([1.2, 0, 0, 8.0, 0, 0])))
        ids_l.append(ids_o); T_l.append(T_o); r_l.append(r_o)
        tg = taggraph_accumulate(
            tg, jnp.asarray(np.stack(ids_l)), jnp.asarray(np.stack(T_l)),
            jnp.asarray(np.stack(r_l)),
        )
        # chunk 2: more good measurements (re-elects if chunk 1's reference
        # was the outlier and the pair reset)
        more = [_observe(Tw, [0, 1], rng) for _ in range(10)]
        ids2, T2, r2 = map(np.stack, zip(*more))
        tg = taggraph_accumulate(
            tg, jnp.asarray(ids2), jnp.asarray(T2), jnp.asarray(r2))
        assert np.asarray(tg.count)[0, 1] >= 10
        edges = taggraph_edges(tg, jnp.ones((M,), bool))
        e = int(np.argmax(np.asarray(edges.ok)))
        gt_rel = np.linalg.inv(Tw[0]) @ Tw[1]
        assert np.linalg.norm(np.asarray(edges.T_meas[e]) - gt_rel) < 0.05


class TestSolve:
    def test_chain_correction_pins_anchor(self, rng):
        """Drifted chained seeding + averaged co-visibility graph: the
        solve must pull anchor-relative tag positions to the averaged
        consensus while leaving the anchor exactly in place."""
        M = 8
        n = 5
        Tw = _chain_world(n)
        tg = taggraph_init(M)
        frames = []
        for f in range(150):
            t = min(f // 30, n - 2)
            frames.append(_observe(Tw, [t, t + 1], rng))
        ids_l, T_l, r_l = map(np.stack, zip(*frames))
        tg = taggraph_accumulate(
            tg, jnp.asarray(ids_l), jnp.asarray(T_l), jnp.asarray(r_l))

        lm = np.tile(np.eye(4), (M, 1, 1)).astype(np.float32)
        act = np.zeros(M, bool)
        for t in range(n):
            drift = (
                np.array(se3_exp(jnp.asarray(rng.normal(scale=0.15, size=6))))
                if t else np.eye(4)
            )
            lm[t] = Tw[t] @ drift
            act[t] = True

        def relerr(x):
            rel = np.einsum("ij,tjk->tik", np.linalg.inv(x[0]), x[:n])
            gt = np.einsum("ij,tjk->tik", np.linalg.inv(Tw[0]), Tw)
            return np.linalg.norm(rel[:, :3, 3] - gt[:, :3, 3], axis=-1)

        new, moved = taggraph_solve(
            tg, jnp.asarray(lm), jnp.asarray(act), jnp.int32(0), iters=8)
        assert bool(moved)
        new = np.asarray(new)
        e0, e1 = relerr(lm), relerr(new)
        assert e1.mean() < 0.5 * e0.mean() + 1e-3, (e0, e1)
        # anchor pinned exactly (gauge unchanged)
        np.testing.assert_allclose(new[0], lm[0], atol=1e-4)
        # inactive tags untouched
        np.testing.assert_allclose(new[n:], lm[n:], atol=1e-6)

    def test_noop_without_anchor_or_edges(self, rng):
        M = 8
        tg = taggraph_init(M)
        lm = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (M, 1, 1)))
        act = jnp.ones((M,), bool)
        out, moved = taggraph_solve(tg, lm, act, jnp.int32(0))
        assert not bool(moved)
        np.testing.assert_allclose(np.asarray(out), np.asarray(lm))
        # edges exist but anchor unknown -> still a no-op
        Tw = _chain_world(2)
        ids, T_obs, rel = _observe(Tw, [0, 1], rng)
        frames = [(_observe(Tw, [0, 1], rng)) for _ in range(3)]
        ids_l, T_l, r_l = map(np.stack, zip(*frames))
        tg = taggraph_accumulate(
            tg, jnp.asarray(ids_l), jnp.asarray(T_l), jnp.asarray(r_l))
        out, moved = taggraph_solve(tg, lm, act, jnp.int32(-1))
        assert not bool(moved)
        np.testing.assert_allclose(np.asarray(out), np.asarray(lm))
