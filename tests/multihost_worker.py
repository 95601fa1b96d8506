"""Worker process for the multi-host distributed test.

Launched by tests/test_multihost.py as N separate OS processes, each with 4
virtual CPU devices; together they form the global 2-D (data x lm) mesh with
sequences over the process (DCN-analog) axis and landmarks over the local
(ICI-analog) axis. This is the jax.distributed NCCL-equivalent path that
SURVEY §5 mandates and the reference entirely lacks.

Run standalone:
  XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
    python tests/multihost_worker.py --num-processes 2 --process-id 0 --port 9876 &
  XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
    python tests/multihost_worker.py --num-processes 2 --process-id 1 --port 9876
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    args = ap.parse_args()

    from aprilslam_tpu.parallel import initialize_distributed

    initialize_distributed(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
        platform="cpu",
    )

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    assert jax.process_count() == args.num_processes
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == args.num_processes * n_local, (n_global, n_local)

    from aprilslam_tpu.geometry import PinholeCamera, tag_object_corners, se3_exp
    from aprilslam_tpu.slam.ba import ba_init, ba_cost
    from aprilslam_tpu.parallel import (
        make_mesh_2d,
        build_distributed_ba,
        shard_observations_by_owner,
        stack_ba_states,
    )
    from aprilslam_tpu.parallel.multihost import make_global, all_processes_cost
    from dataclasses import replace

    # --- deterministic synthetic problem, identical on every process -----
    S = args.num_processes  # one sequence per host
    K, M, O = 8, 32, 256
    tag_size = 10.0
    cam = PinholeCamera.from_fov(800, 800, 50.0)
    Kmat = jnp.asarray(cam.matrix, jnp.float32)
    obj = np.asarray(tag_object_corners(tag_size))

    def make_state(seed: int):
        rng = np.random.default_rng(seed)
        side = int(np.ceil(np.sqrt(M)))
        lm_pose = np.broadcast_to(np.eye(4, dtype=np.float32), (M, 4, 4)).copy()
        for m in range(M):
            lm_pose[m][:3, 3] = [(m % side) * 20.0, (m // side) * 20.0, 0.0]
        kf_pose = np.broadcast_to(np.eye(4, dtype=np.float32), (K, 4, 4)).copy()
        for k in range(K):
            kf_pose[k][:3, :3] = np.diag([1, -1, -1]).astype(np.float32)
            kf_pose[k][:3, 3] = [rng.uniform(0, side * 20), rng.uniform(0, side * 20), 120.0]
        obs_kf = np.zeros(O, np.int32)
        obs_lm = np.zeros(O, np.int32)
        obs_uv = np.zeros((O, 4, 2), np.float32)
        per_kf = O // K
        i = 0
        for k in range(K):
            d = np.linalg.norm(lm_pose[:, :3, 3] - kf_pose[k][:3, 3], axis=-1)
            for m in np.argsort(d)[:per_kf]:
                T_ct = np.linalg.inv(kf_pose[k]) @ lm_pose[m]
                p = obj @ T_ct[:3, :3].T + T_ct[:3, 3]
                uv = p[:, :2] / p[:, 2:3]
                Km = np.asarray(cam.matrix)
                obs_uv[i] = np.stack(
                    [Km[0, 0] * uv[:, 0] + Km[0, 2], Km[1, 1] * uv[:, 1] + Km[1, 2]], -1
                ) + rng.normal(scale=0.3, size=(4, 2))
                obs_kf[i], obs_lm[i] = k, m
                i += 1
        kf_noisy = np.stack([
            np.asarray(se3_exp(jnp.asarray(rng.normal(scale=0.01, size=6), jnp.float32)))
            @ kf_pose[k]
            for k in range(K)
        ]).astype(np.float32)
        lm_noisy = np.stack([
            np.asarray(se3_exp(jnp.asarray(rng.normal(scale=0.01, size=6), jnp.float32)))
            @ lm_pose[m]
            for m in range(M)
        ]).astype(np.float32)
        return replace(
            ba_init(K, M, O),
            kf_pose=jnp.asarray(kf_noisy), kf_active=jnp.ones((K,), bool),
            lm_pose=jnp.asarray(lm_noisy), lm_active=jnp.ones((M,), bool),
            obs_kf=jnp.asarray(obs_kf), obs_lm=jnp.asarray(obs_lm),
            obs_uv=jnp.asarray(obs_uv), obs_ok=jnp.asarray(np.arange(O) < i),
            anchor=jnp.int32(0), kf_ptr=jnp.int32(K),
        )

    states = [make_state(seed=100 + s) for s in range(S)]
    c0 = [float(ba_cost(st, Kmat, tag_size)) for st in states]
    states_sh = [shard_observations_by_owner(st, n_local) for st in states]
    stacked_host = stack_ba_states(states_sh)  # (S, ...) host-side values

    # --- global 2-D mesh: data = processes (DCN), lm = local devices ------
    mesh = make_mesh_2d(n_data=S, n_lm=n_local)
    lm_fields = {"lm_pose", "lm_active", "obs_kf", "obs_lm", "obs_uv", "obs_ok"}

    def to_global(st):
        import dataclasses
        out = {}
        for f in dataclasses.fields(st):
            v = np.asarray(getattr(st, f.name))
            spec = P("data", "lm") if f.name in lm_fields else P("data")
            out[f.name] = make_global(mesh, spec, v)
        return dataclasses.replace(st, **out)

    stacked = to_global(stacked_host)

    run = build_distributed_ba(
        mesh, K, M, O, tag_size, axis="lm", iters=8, data_axis="data",
    )
    out, costs = run(stacked, Kmat)

    # Each process reads its own sequence's final cost from its shards.
    me = jax.process_index()
    local_cost = None
    for shard in costs.addressable_shards:
        if shard.index[0].start == me or shard.index[0] == slice(me, me + 1):
            local_cost = float(np.asarray(shard.data).reshape(-1)[0])
    assert local_cost is not None, "no addressable cost shard for this process"
    assert np.isfinite(local_cost)
    assert local_cost < 0.5 * c0[me], (me, c0[me], local_cost)

    # Cross-host DCN check: gather every process's cost via a global psum.
    gathered = all_processes_cost(local_cost)
    assert gathered.shape == (S,)
    for s in range(S):
        assert 0 <= gathered[s] < 0.5 * c0[s], (s, c0[s], gathered[s])

    # --- keyframe-axis leg: ONE trajectory spanning both hosts -----------
    # The kf mesh covers every global device, so the seam ppermutes between
    # device blocks owned by DIFFERENT processes ride the DCN path.
    import dataclasses

    from jax.sharding import Mesh, PartitionSpec
    from aprilslam_tpu.parallel import (
        build_keyframe_ba, keyframe_ba_cost, synthesize_trajectory_problem,
    )

    prob, kf_gt, Kmat_kf = synthesize_trajectory_problem(
        n_keyframes=16 * n_global, n_landmarks=16, n_shards=n_global,
        obs_per_kf=3, seed=5,
    )
    ckf0 = float(keyframe_ba_cost(prob, Kmat_kf, tag_size))
    mesh_kf = Mesh(np.asarray(jax.devices()), ("kf",))
    kf_fields = {
        "kf_pose", "kf_active", "obs_kf", "obs_lm", "obs_uv", "obs_ok",
        "odom_T", "odom_ok", "odom_weight",
    }
    gl = {}
    for f in dataclasses.fields(prob):
        v = np.asarray(getattr(prob, f.name))
        spec = PartitionSpec("kf") if f.name in kf_fields else PartitionSpec()
        gl[f.name] = make_global(mesh_kf, spec, v)
    prob_g = dataclasses.replace(prob, **gl)
    run_kf = build_keyframe_ba(
        mesh_kf, prob.n_keyframes, prob.n_landmarks,
        int(np.asarray(prob.obs_kf.shape)[0]), tag_size, iters=4, cg_iters=16,
    )
    out_kf, cost_kf = run_kf(
        prob_g, make_global(mesh_kf, PartitionSpec(), np.asarray(Kmat_kf))
    )
    ckf1 = float(np.asarray(cost_kf.addressable_shards[0].data))
    assert np.isfinite(ckf1), ckf1
    assert ckf1 < 0.2 * ckf0, (ckf0, ckf1)
    for shard in out_kf.kf_pose.addressable_shards:
        assert np.isfinite(np.asarray(shard.data)).all()
    gathered_kf = all_processes_cost(ckf1)
    # The final cost is replicated over the mesh: every process must agree.
    assert np.allclose(gathered_kf, ckf1, rtol=1e-4), (gathered_kf, ckf1)

    print(
        f"MULTIHOST OK proc={me}/{args.num_processes} "
        f"devices={n_global} mesh=data{S}xlm{n_local} "
        f"cost {c0[me]:.2f} -> {local_cost:.2f} "
        f"gathered={np.round(gathered, 2).tolist()} "
        f"kf-axis {prob.n_keyframes}kf cost {ckf0:.1f} -> {ckf1:.1f}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
