"""Worker for the REAL multi-process kf-axis scaling curve.

Launched N times by ``tools/scaling_bench.py --mode kf-proc``; each process
owns ONE virtual CPU device, so every psum/ppermute of the keyframe-axis
solver crosses process boundaries through jax.distributed (the DCN analog)
instead of staying inside one address space. Process 0 prints one JSON line:

* wall-clock per LM iteration (full solve / iters),
* collective-only time per CG iteration from a psum+2xppermute
  microbenchmark at the solver's exact payload shapes,
* ATE before/after against the synthetic ground truth.

Standalone: see tools/scaling_bench.py --mode kf-proc.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_scaling")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--keyframes", type=int, default=10240)
    ap.add_argument("--landmarks", type=int, default=256)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--cg-iters", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        from aprilslam_tpu.parallel import initialize_distributed

        initialize_distributed(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
            platform="cpu",
        )

    import numpy as np
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from aprilslam_tpu.parallel import (
        make_mesh, build_keyframe_ba, keyframe_ba_cost,
        synthesize_trajectory_problem,
    )
    from aprilslam_tpu.parallel.multihost import make_global, all_processes_cost

    n = args.num_processes
    assert jax.device_count() == n, (jax.device_count(), n)
    K, M = args.keyframes, args.landmarks
    tag_size = 10.0

    # Identical deterministic problem on every process.
    prob, kf_gt, Kmat = synthesize_trajectory_problem(
        n_keyframes=K, n_landmarks=M, n_shards=n, obs_per_kf=4, seed=7,
    )
    O = int(prob.obs_kf.shape[0])
    mesh = make_mesh(n, axis="kf")

    kf_fields = {"kf_pose", "kf_active", "obs_kf", "obs_lm", "obs_uv",
                 "obs_ok", "odom_T", "odom_ok", "odom_weight"}
    import dataclasses

    gl = {}
    for f in dataclasses.fields(prob):
        v = np.asarray(getattr(prob, f.name))
        spec = P("kf") if f.name in kf_fields else P()
        gl[f.name] = make_global(mesh, spec, v)
    prob_g = dataclasses.replace(prob, **gl)
    Kmat_g = make_global(mesh, P(), np.asarray(Kmat))

    run = build_keyframe_ba(mesh, K, M, O, tag_size,
                            iters=args.iters, cg_iters=args.cg_iters)

    # Warm-up (compile), then best-of-reps wall clock.
    out, cost = run(prob_g, Kmat_g)
    jax.block_until_ready(cost)
    t_best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out, cost = run(prob_g, Kmat_g)
        jax.block_until_ready(cost)
        t_best = min(t_best, time.perf_counter() - t0)

    # Collective-only microbenchmark at the solver's per-CG payloads:
    # one psum of (M, 6) floats + two 6-float ppermutes, cg_iters times.
    perm = [((d + 1) % n, d) for d in range(n)]

    def coll_body(u, seam):
        def body(_, carry):
            u, seam = carry
            u = jax.lax.psum(u, "kf") * (1.0 / n)  # normalized: no overflow
            seam = jax.lax.ppermute(seam, "kf", perm)
            seam = jax.lax.ppermute(seam, "kf", perm)
            # keep a data dependence so the loop cannot collapse
            return u, seam + u[0, :6]
        u, seam = jax.lax.fori_loop(0, args.cg_iters, body, (u, seam))
        return u, seam

    coll = jax.jit(shard_map(
        coll_body, mesh=mesh, in_specs=(P(), P("kf")), out_specs=(P(), P("kf")),
        check_vma=False,
    ))
    u0 = make_global(mesh, P(), np.ones((M, 6), np.float32))
    s0 = make_global(mesh, P("kf"), np.ones((n, 6), np.float32))
    o1, o2 = coll(u0, s0)
    jax.block_until_ready((o1, o2))
    t_coll = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o1, o2 = coll(u0, s0)
        jax.block_until_ready((o1, o2))
        t_coll = min(t_coll, time.perf_counter() - t0)

    # ATE before/after: local sum of squared errors over this process's
    # addressable kf shard, gathered with a global psum.
    def local_sse(kf_global):
        sse, cnt = 0.0, 0
        for sh in kf_global.addressable_shards:
            sl = sh.index[0]
            d = np.asarray(sh.data)[:, :3, 3] - kf_gt[sl][:, :3, 3]
            sse += float(np.sum(d * d))
            cnt += d.shape[0]
        return sse, cnt

    sse_f, cnt = local_sse(out.kf_pose)
    if n > 1:
        sse_f = float(all_processes_cost(sse_f).sum())
        cnt = int(all_processes_cost(float(cnt)).sum())
    ate_final = float(np.sqrt(sse_f / max(cnt, 1)))
    e0 = np.asarray(prob.kf_pose)[:, :3, 3] - kf_gt[:, :3, 3]
    ate_init = float(np.sqrt(np.mean(np.sum(e0 * e0, axis=-1))))

    if args.process_id == 0:
        span = float(np.ptp(kf_gt[:, :3, 3], axis=0).max())
        print(json.dumps({
            "processes": n,
            "keyframes": K, "landmarks": M, "observations": O,
            "lm_iters": args.iters, "cg_iters": args.cg_iters,
            "t_solve_s": round(t_best, 3),
            "t_per_lm_iter_s": round(t_best / args.iters, 3),
            "t_collectives_per_lm_iter_s": round(t_coll, 4),
            "cost_final": round(float(np.asarray(cost)[0] if np.ndim(cost) else float(cost)), 1),
            "ate_initial": round(ate_init, 2),
            "ate_final": round(ate_final, 3),
            "trajectory_span_su": round(span, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
