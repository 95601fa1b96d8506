"""Offline long-trajectory refinement: keyframe-axis sharded global BA.

The online pipeline (apps/run_simulation.py) is a fixed-lag system — its BA
window forgets keyframes beyond the ring (slam/ba.py). This app is the
batch counterpart the reference never had (its backend is one-shot chaining,
/root/reference/src/core/slam_graph.py:29-76 + averaging slam.py:36-63):
load a dead-reckoned trajectory with its tag observations and odometry,
partition the keyframes into contiguous windows over every available device
(`jax.sharding` kf-axis mesh, parallel/keyframe_ba.py), and solve ONE global
bundle adjustment over the full trajectory — 10k+ keyframes.

Problem files are .npz archives with the KeyframeBAProblem arrays
(save_problem/load_problem below). `--demo` synthesizes a drifted serpentine
sweep so the app is runnable without captured data.

Usage:
  aprilslam-refine --demo --keyframes 2048 --output refined.npz
  aprilslam-refine --input problem.npz --devices 8 --output refined.npz
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def save_problem(path: str, prob, Kmat, tag_size: float = 10.0) -> None:
    import numpy as np

    np.savez_compressed(
        path,
        tag_size=np.float32(tag_size),
        kf_pose=np.asarray(prob.kf_pose),
        kf_active=np.asarray(prob.kf_active),
        lm_pose=np.asarray(prob.lm_pose),
        lm_active=np.asarray(prob.lm_active),
        obs_kf=np.asarray(prob.obs_kf),
        obs_lm=np.asarray(prob.obs_lm),
        obs_uv=np.asarray(prob.obs_uv),
        obs_ok=np.asarray(prob.obs_ok),
        odom_T=np.asarray(prob.odom_T),
        odom_ok=np.asarray(prob.odom_ok),
        odom_weight=np.asarray(prob.odom_weight),
        K=np.asarray(Kmat),
    )


def load_problem(path: str):
    import jax.numpy as jnp
    import numpy as np

    from ..parallel import KeyframeBAProblem

    z = np.load(path)
    prob = KeyframeBAProblem(
        **{
            f: jnp.asarray(z[f])
            for f in (
                "kf_pose", "kf_active", "lm_pose", "lm_active",
                "obs_kf", "obs_lm", "obs_uv", "obs_ok",
                "odom_T", "odom_ok", "odom_weight",
            )
        }
    )
    tag_size = float(z["tag_size"]) if "tag_size" in z else 10.0
    return prob, jnp.asarray(z["K"]), tag_size


def problem_from_run(
    poses, valid, coord, det_ids, det_corners, det_ok,
    lm_world, lm_present, odom_weight: float = 1.0,
):
    """Build a KeyframeBAProblem from an online run's outputs.

    ``poses`` are the per-frame estimates in each frame's coordinate-tag
    frame; only frames whose coordinate tag equals the FINAL anchor (and
    that are valid) become active keyframes — mixed-frame poses would
    corrupt the problem. Leading invalid frames are trimmed so global
    keyframe 0 (the solver's gauge pin) is always an active frame.
    Odometry edges are self-consistency factors between consecutive active
    frames (weight ``odom_weight``; they smooth, the corner observations
    carry the metric information). Landmarks come from the final online
    map (graph tag->world transforms).
    """
    import jax.numpy as jnp
    import numpy as np

    from ..parallel import KeyframeBAProblem

    poses = np.asarray(poses)
    valid = np.asarray(valid).astype(bool)
    coord = np.asarray(coord)
    final_anchor = coord[valid][-1] if valid.any() else -1
    active = valid & (coord == final_anchor)
    first = int(np.argmax(active)) if active.any() else 0
    sl = slice(first, len(poses))

    poses = poses[sl]
    active = active[sl]
    ids = np.asarray(det_ids)[sl]
    corners = np.asarray(det_corners)[sl]
    ok = np.asarray(det_ok)[sl]
    K = len(poses)
    M = int(np.asarray(lm_world).shape[0])

    # Observations: every ok detection of an active frame.
    frame_idx = np.repeat(np.arange(K), ids.shape[1])
    obs_kf = frame_idx.astype(np.int32)
    obs_lm = ids.reshape(-1).astype(np.int32)
    obs_uv = corners.reshape(-1, 4, 2).astype(np.float32)
    obs_ok = (ok.reshape(-1) & (obs_lm >= 0) & (obs_lm < M)
              & active[frame_idx]
              & np.asarray(lm_present)[np.clip(obs_lm, 0, M - 1)])
    obs_lm = np.clip(obs_lm, 0, M - 1)

    # Odometry between consecutive ACTIVE frames only.
    odom_T = np.broadcast_to(np.eye(4, dtype=np.float32), (K, 4, 4)).copy()
    odom_ok = np.zeros(K, bool)
    for k in range(K - 1):
        if active[k] and active[k + 1]:
            odom_T[k] = np.linalg.inv(poses[k]) @ poses[k + 1]
            odom_ok[k] = True

    return KeyframeBAProblem(
        kf_pose=jnp.asarray(poses.astype(np.float32)),
        kf_active=jnp.asarray(active),
        lm_pose=jnp.asarray(np.asarray(lm_world).astype(np.float32)),
        lm_active=jnp.asarray(np.asarray(lm_present).astype(bool)),
        obs_kf=jnp.asarray(obs_kf),
        obs_lm=jnp.asarray(obs_lm),
        obs_uv=jnp.asarray(obs_uv),
        obs_ok=jnp.asarray(obs_ok),
        odom_T=jnp.asarray(odom_T),
        odom_ok=jnp.asarray(odom_ok),
        odom_weight=jnp.full((K,), odom_weight, jnp.float32),
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="aprilslam-refine",
        description="Global keyframe-axis sharded BA over one long trajectory",
    )
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="problem .npz (see save_problem)")
    src.add_argument("--demo", action="store_true",
                     help="synthesize a drifted demo trajectory")
    ap.add_argument("--keyframes", type=int, default=2048, help="demo size")
    ap.add_argument("--landmarks", type=int, default=128, help="demo size")
    ap.add_argument("--devices", type=int, default=0,
                    help="kf-axis mesh size (0 = all available)")
    ap.add_argument("--iters", type=int, default=24, help="LM iterations")
    ap.add_argument("--cg-iters", type=int, default=128,
                    help="PCG depth per LM step (long trajectories need "
                         "~128 to traverse low-frequency drift modes)")
    ap.add_argument("--damping", type=float, default=1e-4)
    ap.add_argument("--tag-size", type=float, default=None,
                    help="tag side length in scene units (default: the "
                         "value stored in the problem file, or 10.0)")
    ap.add_argument("--output", "-o", default=None, help="refined .npz")
    ap.add_argument("--device", default="auto", choices=("auto", "cpu", "tpu"))
    args = ap.parse_args(argv)

    from ..utils import configure_runtime

    configure_runtime(args.device)

    import jax
    import numpy as np

    from ..parallel import (
        build_keyframe_ba, keyframe_ba_cost, make_mesh,
        synthesize_trajectory_problem,
    )

    kf_gt = None
    if args.demo:
        n_dev = args.devices or len(jax.devices())
        if args.keyframes % n_dev:
            n_dev = next(d for d in range(n_dev, 0, -1) if args.keyframes % d == 0)
        prob, kf_gt, Kmat = synthesize_trajectory_problem(
            n_keyframes=args.keyframes, n_landmarks=args.landmarks,
            n_shards=n_dev, obs_per_kf=6, seed=7,
        )
        K = prob.n_keyframes
        tag_size = args.tag_size if args.tag_size is not None else 10.0
    else:
        prob, Kmat, saved_tag_size = load_problem(args.input)
        tag_size = args.tag_size if args.tag_size is not None else saved_tag_size
        n_dev = args.devices or len(jax.devices())
        K = prob.n_keyframes
        if K % n_dev:
            # largest divisor of K not exceeding the device count
            n_dev = next(d for d in range(n_dev, 0, -1) if K % d == 0)
        # The file may have been partitioned for a different shard count
        # (or not at all): equal shard_map slices must align with keyframe
        # ownership, so ALWAYS re-bucket for the mesh actually in use
        # (padding rows carry obs_ok=False and re-bucket harmlessly).
        import jax.numpy as jnp
        from dataclasses import replace as _rep

        from ..parallel import partition_obs_by_keyframe

        p_kf, p_lm, p_uv, p_ok = partition_obs_by_keyframe(
            np.asarray(prob.obs_kf), np.asarray(prob.obs_lm),
            np.asarray(prob.obs_uv), np.asarray(prob.obs_ok), K, n_dev,
        )
        prob = _rep(
            prob, obs_kf=jnp.asarray(p_kf), obs_lm=jnp.asarray(p_lm),
            obs_uv=jnp.asarray(p_uv), obs_ok=jnp.asarray(p_ok),
        )
    print(f"{K} keyframes, {prob.n_landmarks} landmarks, "
          f"{int(np.asarray(prob.obs_ok).sum())} observations; "
          f"kf-axis mesh over {n_dev} device(s)", file=sys.stderr)

    c0 = float(keyframe_ba_cost(prob, Kmat, tag_size))
    run = build_keyframe_ba(
        make_mesh(n_dev, axis="kf"), K, prob.n_landmarks,
        int(prob.obs_kf.shape[0]), tag_size,
        iters=args.iters, cg_iters=args.cg_iters, damping=args.damping,
    )
    t0 = time.perf_counter()
    refined, _ = run(prob, Kmat)
    jax.block_until_ready(refined.kf_pose)
    dt = time.perf_counter() - t0
    c1 = float(keyframe_ba_cost(refined, Kmat, tag_size))

    out = {
        "keyframes": K,
        "landmarks": prob.n_landmarks,
        "devices": n_dev,
        "cost_initial": round(c0, 1),
        "cost_refined": round(c1, 1),
        "solve_s": round(dt, 2),
        "finite": bool(np.isfinite(np.asarray(refined.kf_pose)).all()),
    }
    if kf_gt is not None:
        for name, p in (("ate_initial", prob), ("ate_refined", refined)):
            e = np.asarray(p.kf_pose)[:, :3, 3] - kf_gt[:, :3, 3]
            out[name] = round(float(np.sqrt(np.mean(np.sum(e * e, -1)))), 4)
    if args.output:
        save_problem(args.output, refined, Kmat, tag_size)
        out["output"] = args.output
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
