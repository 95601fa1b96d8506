#!/usr/bin/env python3
"""Large-map distributed-BA scaling benchmark (BASELINE config 5).

Synthesizes a big tag map (default 1024 landmarks, 64-keyframe window,
thousands of observations), then measures LM-BA iteration throughput on a
1-device baseline vs an n-device mesh (landmark-sharded). On this machine
the mesh is virtual CPU devices — the point is to validate the scaling
STRUCTURE (communication volume independent of map size, per-device work
1/n) that carries to real pods; run on hardware for wall-clock truth.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py --landmarks 1024 --keyframes 32 --obs 4096
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", choices=("lm", "kf", "kf-proc"), default="lm",
        help="lm: landmark-axis sharded window BA (big maps); "
             "kf: keyframe-axis sharded long-trajectory BA (10k keyframes); "
             "kf-proc: the SAME kf-axis solve at 1/2/4/8 REAL OS processes "
             "over jax.distributed (CPU) — measured wall clock per LM "
             "iteration with collective time separated",
    )
    ap.add_argument("--processes", type=str, default="1,2,4,8",
                    help="kf-proc: comma-separated process counts")
    ap.add_argument("--landmarks", type=int, default=10240)
    ap.add_argument("--keyframes", type=int, default=64)
    ap.add_argument("--obs", type=int, default=16384)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cg-iters", type=int, default=32)
    args = ap.parse_args()

    if args.mode == "kf":
        return kf_axis_bench(args)
    if args.mode == "kf-proc":
        return kf_proc_bench(args)

    import os

    import numpy as np
    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # the host sitecustomize force-registers the axon TPU platform and
        # overrides the env var; the config knob wins
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aprilslam_tpu.geometry import PinholeCamera, tag_object_corners, se3_exp
    from aprilslam_tpu.slam.ba import ba_init, ba_optimize, ba_cost, BAState
    from aprilslam_tpu.parallel import (
        make_mesh, build_distributed_ba, shard_observations_by_owner,
    )
    from dataclasses import replace

    rng = np.random.default_rng(0)
    M, K, O = args.landmarks, args.keyframes, args.obs
    tag_size = 10.0
    cam = PinholeCamera.from_fov(1000, 1000, 45.0)
    Kmat = jnp.asarray(cam.matrix)
    obj = np.asarray(tag_object_corners(tag_size))

    # Synthetic world: landmark grid; keyframes sweep over it.
    side = int(np.ceil(np.sqrt(M)))
    lm_pose = np.broadcast_to(np.eye(4, dtype=np.float32), (M, 4, 4)).copy()
    for m in range(M):
        lm_pose[m][:3, 3] = [(m % side) * 25.0, (m // side) * 25.0, 0.0]
    kf_pose = np.broadcast_to(np.eye(4, dtype=np.float32), (K, 4, 4)).copy()
    for k in range(K):
        kf_pose[k][:3, :3] = np.diag([1, -1, -1]).astype(np.float32)
        kf_pose[k][:3, 3] = [rng.uniform(0, side * 25), rng.uniform(0, side * 25), 140.0]

    # Observations: each keyframe sees its nearest landmarks.
    obs_kf = np.zeros(O, np.int32)
    obs_lm = np.zeros(O, np.int32)
    obs_uv = np.zeros((O, 4, 2), np.float32)
    per_kf = O // K
    i = 0
    for k in range(K):
        d = np.linalg.norm(lm_pose[:, :3, 3] - kf_pose[k][:3, 3], axis=-1)
        near = np.argsort(d)[:per_kf]
        for m in near:
            T_ct = np.linalg.inv(kf_pose[k]) @ lm_pose[m]
            p = obj @ T_ct[:3, :3].T + T_ct[:3, 3]
            uv = p[:, :2] / p[:, 2:3]
            Km = np.asarray(cam.matrix)
            obs_uv[i] = np.stack(
                [Km[0, 0] * uv[:, 0] + Km[0, 2], Km[1, 1] * uv[:, 1] + Km[1, 2]], -1
            ) + rng.normal(scale=0.3, size=(4, 2))
            obs_kf[i] = k
            obs_lm[i] = m
            i += 1
    n_obs = i

    # Perturbed initialization (what BA has to fix).
    kf_noisy = np.stack([
        np.asarray(se3_exp(jnp.asarray(rng.normal(scale=0.01, size=6)))) @ kf_pose[k]
        for k in range(K)
    ]).astype(np.float32)
    lm_noisy = np.stack([
        np.asarray(se3_exp(jnp.asarray(rng.normal(scale=0.01, size=6)))) @ lm_pose[m]
        for m in range(M)
    ]).astype(np.float32)

    st = ba_init(K, M, O)
    st = replace(
        st,
        kf_pose=jnp.asarray(kf_noisy),
        kf_active=jnp.ones((K,), bool),
        lm_pose=jnp.asarray(lm_noisy),
        lm_active=jnp.ones((M,), bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_lm=jnp.asarray(obs_lm),
        obs_uv=jnp.asarray(obs_uv),
        obs_ok=jnp.asarray(np.arange(O) < n_obs),
        anchor=jnp.int32(0),
        kf_ptr=jnp.int32(K),
    )

    c0 = float(ba_cost(st, Kmat, tag_size))
    # true max observations per landmark — sizes the sparse Schur grid
    P_max = int(np.bincount(obs_lm[:n_obs], minlength=M).max())

    def timed(fn, *a):
        out = fn(*a)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a)
            jax.block_until_ready(jax.tree.leaves(out)[0])
        return out, (time.perf_counter() - t0) / args.reps

    # Single-device baseline (same sparse Schur assembly — the efficiency
    # number isolates DISTRIBUTION overhead, not an algorithm swap).
    single = jax.jit(
        lambda s: ba_optimize(s, Kmat, tag_size, iters=args.iters,
                              coupling="sparse", max_obs_per_lm=P_max)
    )
    st1, t1 = timed(single, st)
    c1 = float(ba_cost(st1, Kmat, tag_size))

    # Distributed. fit=True grows the per-shard obs blocks so nothing drops.
    mesh = make_mesh(args.devices, axis="lm")
    st_sh = shard_observations_by_owner(st, args.devices, fit=True)
    run = build_distributed_ba(mesh, K, M, st_sh.n_obs_capacity, tag_size,
                               iters=args.iters, max_obs_per_lm=P_max)
    (stn, _), tn = timed(lambda: run(st_sh, Kmat))
    cn = float(ba_cost(stn, Kmat, tag_size))

    # Work-based scaling efficiency from the compiled HLO cost model:
    # eff = flops(1 device) / (n * flops per device). Hardware-independent —
    # on a 2-core host timesharing 8 virtual devices, wall-clock "efficiency"
    # measures the host CPU, not the sharding design.
    def flops_of(jitted, *a):
        try:
            ca = jitted.lower(*a).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0))
        except Exception:
            return float("nan")

    f1 = flops_of(single, st)
    # cost_analysis on an SPMD program reports PER-DEVICE flops;
    # eff = single-device flops / (n * per-device flops).
    fd_dev = flops_of(run.jitted, *run.lower_args(st_sh), Kmat)
    work_eff = (
        f1 / (args.devices * fd_dev) if (fd_dev and fd_dev == fd_dev) else float("nan")
    )

    speedup = t1 / tn
    eff = speedup / args.devices
    print(json.dumps({
        "landmarks": M, "keyframes": K, "observations": n_obs,
        "max_obs_per_landmark": P_max,
        "lm_iters": args.iters,
        "cost_initial": round(c0, 1),
        "cost_single": round(c1, 1),
        "cost_distributed": round(cn, 1),
        "t_single_s": round(t1, 3),
        "t_distributed_s": round(tn, 3),
        "devices": args.devices,
        "speedup": round(speedup, 2),
        "scaling_efficiency_measured": round(eff, 3),
        "flops_single": f1,
        "flops_distributed_per_device": fd_dev,
        "work_scaling_efficiency": round(work_eff, 3) if work_eff == work_eff else None,
        "ba_iters_per_sec_distributed": round(args.iters / tn, 2),
        "note": "measured efficiency is honest only when devices are real; "
                "work_scaling_efficiency (HLO flops, single/total) is the "
                "hardware-independent sharding-quality number",
    }))


def kf_proc_bench(args):
    """REAL multi-process scaling curve (round-4 verdict missing #3): the
    kf-axis solve at each process count in --processes, one virtual CPU
    device per process, collectives crossing process boundaries through
    jax.distributed. Spawns tools/scaling_proc_worker.py N times per point
    and relays process 0's JSON line.

    Interpretation caveat printed with the data: this host has a fixed
    number of physical cores; wall-clock speedup saturates there and
    oversubscribed points (processes > cores) measure scheduling overhead,
    not the sharding design. The collective-time column is the honest
    cross-process communication cost at the solver's exact payloads.
    """
    import socket
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "scaling_proc_worker.py")
    ncpu = os.cpu_count() or 1
    rows = []
    for n in [int(x) for x in args.processes.split(",")]:
        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        procs = [
            subprocess.Popen(
                [sys.executable, worker,
                 "--num-processes", str(n), "--process-id", str(i),
                 "--port", str(port),
                 "--keyframes", str(args.keyframes),
                 "--landmarks", str(args.landmarks),
                 "--iters", str(args.iters),
                 "--cg-iters", str(args.cg_iters),
                 "--reps", str(args.reps)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env,
            )
            for i in range(n)
        ]
        outs = [p.communicate(timeout=1800)[0] for p in procs]
        rcs = [p.returncode for p in procs]
        line = next((ln for ln in outs[0].splitlines() if ln.startswith("{")),
                    None)
        if any(rcs) or line is None:
            print(json.dumps({"processes": n, "error": "worker failed",
                              "rcs": rcs, "tail": outs[0][-800:]}))
            continue
        row = json.loads(line)
        row["oversubscribed"] = n > ncpu
        rows.append(row)
        print(json.dumps(row), flush=True)
    if rows:
        base = rows[0]["t_per_lm_iter_s"]
        print(json.dumps({
            "summary": "kf-proc scaling",
            "host_cpus": ncpu,
            "per_lm_iter_s": {str(r["processes"]): r["t_per_lm_iter_s"]
                              for r in rows},
            "collectives_per_lm_iter_s": {
                str(r["processes"]): r["t_collectives_per_lm_iter_s"]
                for r in rows},
            "speedup_vs_1proc": {str(r["processes"]):
                                 round(base / r["t_per_lm_iter_s"], 2)
                                 for r in rows},
            "note": f"host has {ncpu} physical cores; points beyond that "
                    "are oversubscribed and measure scheduler overhead, "
                    "not sharding quality",
        }), flush=True)
    return 0


def kf_axis_bench(args):
    """Long-trajectory leg: ONE trajectory of --keyframes keyframes sharded
    over the kf axis (SURVEY §5 long-context row; 10k-keyframe config:
    ``--mode kf --keyframes 10240 --landmarks 256``).

    Reports 1-device vs n-device timing AND the HLO work-based scaling
    efficiency (the hardware-independent number on virtual CPU devices).
    Per-CG-iteration communication is one psum of 6M floats + two 6-float
    ppermutes regardless of trajectory length — the structural reason
    efficiency holds as K grows.
    """
    import numpy as np
    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")

    from aprilslam_tpu.parallel import (
        make_mesh, build_keyframe_ba, keyframe_ba_cost,
        synthesize_trajectory_problem,
    )

    K, M, n = args.keyframes, args.landmarks, args.devices
    prob, kf_gt, Kmat = synthesize_trajectory_problem(
        n_keyframes=K, n_landmarks=M, n_shards=n, obs_per_kf=4, seed=7
    )
    O = int(prob.obs_kf.shape[0])
    tag_size = 10.0
    c0 = float(keyframe_ba_cost(prob, Kmat, tag_size))

    def timed(fn, *a):
        out = fn(*a)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a)
            jax.block_until_ready(jax.tree.leaves(out)[0])
        return out, (time.perf_counter() - t0) / args.reps

    run1 = build_keyframe_ba(
        make_mesh(1, axis="kf"), K, M, O, tag_size,
        iters=args.iters, cg_iters=args.cg_iters,
    )
    (p1, _), t1 = timed(lambda: run1(prob, Kmat))
    c1 = float(keyframe_ba_cost(p1, Kmat, tag_size))

    runn = build_keyframe_ba(
        make_mesh(n, axis="kf"), K, M, O, tag_size,
        iters=args.iters, cg_iters=args.cg_iters,
    )
    (pn, _), tn = timed(lambda: runn(prob, Kmat))
    cn = float(keyframe_ba_cost(pn, Kmat, tag_size))

    def flops_of(jitted, a):
        try:
            ca = jitted.lower(*a).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0))
        except Exception:
            return float("nan")

    f1 = flops_of(run1.jitted, run1.lower_args(prob, Kmat))
    fd = flops_of(runn.jitted, runn.lower_args(prob, Kmat))
    raw = f1 / (n * fd) if (fd and fd == fd) else float("nan")
    # The HLO cost model counts slightly different flops for identical math
    # at different shard-local shapes, so the raw ratio can land either side
    # of 1; the headline is clamped into (0, 1] and the raw ratio reported.
    work_eff = min(1.0, raw) if raw == raw else float("nan")
    speedup = t1 / tn

    e = np.asarray(pn.kf_pose)[:, :3, 3] - kf_gt[:, :3, 3]
    ate = float(np.sqrt(np.mean(np.sum(e * e, axis=-1))))
    e0 = np.asarray(prob.kf_pose)[:, :3, 3] - kf_gt[:, :3, 3]
    ate0 = float(np.sqrt(np.mean(np.sum(e0 * e0, axis=-1))))
    span = float(np.ptp(kf_gt[:, :3, 3], axis=0).max())
    print(json.dumps({
        "mode": "kf-axis",
        "keyframes": K, "landmarks": M, "observations": O,
        "lm_iters": args.iters, "cg_iters": args.cg_iters,
        "cost_initial": round(c0, 1),
        "cost_single": round(c1, 1),
        "cost_distributed": round(cn, 1),
        "ate_initial": round(ate0, 2),
        "ate_distributed": round(ate, 3),
        "trajectory_span_su": round(span, 1),
        "t_single_s": round(t1, 3),
        "t_distributed_s": round(tn, 3),
        "devices": n,
        "speedup": round(speedup, 2),
        "scaling_efficiency_measured": round(speedup / n, 3),
        "work_scaling_efficiency": round(work_eff, 3) if work_eff == work_eff else None,
        "work_scaling_efficiency_raw": round(raw, 3) if raw == raw else None,
        "note": "one trajectory sharded over the kf axis; psum payload per CG "
                "iteration = 6*landmarks floats, independent of trajectory "
                "length; efficiency = same-builder 1-device flops / (n * "
                "per-device flops), clamped to <=1 (cost-model shape "
                "artifact); ATE at this shallow iteration budget is a "
                "throughput config, not the converged accuracy (see "
                "tests/test_keyframe_ba.py for the converged numbers); "
                "measured wall-clock efficiency is honest only on real devices",
    }))


if __name__ == "__main__":
    main()
