#!/usr/bin/env python3
"""Benchmark: full SLAM pipeline throughput + accuracy + per-stage breakdown.

PRINT-FIRST CONTRACT: the headline JSON line

  {"metric": "frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 2.69, "ate_rmse_sim_units": ..., "valid_pose_rate": ...}

is printed (and flushed, and mirrored to BENCH_partial.json) IMMEDIATELY
after the timed loop — before any optional extras — so a driver timeout can
never lose the number.  Extras (batch sweep, per-stage breakdown) each cost
a fresh ~35-40 s XLA compile on this backend, so they run only while wall
clock remains inside BENCH_BUDGET_S (default 360 s); whatever finished is
merged into a second, enriched JSON line printed at the very end.  Both
lines carry the same headline keys, so a parser taking either the first or
the last JSON line of stdout gets a complete result.

Baseline: the reference's measured 2.69 FPS end-to-end loop on CPU
(BASELINE.md; 570 frames / 211.8 s; /root/reference/README.md:306 claims
"about 3 fps").  ATE is reported in sim units against the analytic ground
truth (reference bar: 1.797, BASELINE.md).  Frames are reference-resolution
1000x1000, Monte-Carlo camera poses (the --no-movement benchmark mode,
/root/reference/src/simulation/simulation_engine.py:92).  >=512 frames are
timed by cycling pre-rendered chunks through the jitted step in steady
state.

Env knobs: BENCH_BATCH (headline batch), BENCH_RES, BENCH_CHUNKS,
BENCH_PASSES, BENCH_BUDGET_S (wall-clock budget for extras),
BENCH_SWEEP=0 to skip the sweep, BENCH_STAGES=0 to skip the breakdown,
BENCH_ESTIMATOR.
"""

from __future__ import annotations

import json
import os
import sys
import time

_T0 = time.perf_counter()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "360"))
_PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_partial.json")

def _orchestrate() -> int:
    """Hang-proof wrapper (runs when BENCH_DEVICE is unset/auto).

    The tunnelled TPU backend flaps: it can pass a liveness probe and still
    die mid-compile, hanging the process below Python where no in-process
    timeout can reach (round-2 lost its bench number exactly this way). So
    the measurement itself runs in a CHILD process with a wall-clock
    deadline: probe -> TPU child (deadline BENCH_TPU_DEADLINE_S, default
    300 s) -> on timeout/failure without output, a CPU child. The child's
    stdout streams through unchanged, so the driver sees the same
    print-first JSON contract either way.
    """
    import subprocess

    from aprilslam_tpu.utils import tpu_responsive

    probe_s = float(os.environ.get("BENCH_TPU_PROBE_S", "90"))
    deadline_s = float(os.environ.get("BENCH_TPU_DEADLINE_S", "300"))

    def child(device: str, timeout: float, fallback: str | None = None) -> tuple[int, bool]:
        """Run a measurement child, STREAMING its stdout through as lines
        arrive — if the OUTER driver kills this orchestrator mid-child, the
        child's already-printed headline is on our stdout, preserving the
        print-first contract end to end.

        Reads are raw non-blocking os.read with manual line assembly: a
        child wedged MID-LINE must not defeat the deadline (readline()
        after select() blocks until the newline that never comes)."""
        import selectors

        env = dict(os.environ, BENCH_DEVICE=device)
        if fallback:
            env["BENCH_FALLBACK"] = fallback
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env, stdout=subprocess.PIPE, bufsize=0,
        )
        fd = proc.stdout.fileno()
        os.set_blocking(fd, False)
        got_json = False
        buf = b""
        deadline = time.monotonic() + timeout

        def flush_lines(data: bytes) -> None:
            nonlocal buf, got_json
            buf += data
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                text = line.decode("utf-8", "replace") + "\n"
                if text.startswith("{"):
                    got_json = True
                sys.stdout.write(text)
                sys.stdout.flush()

        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        try:
            while True:
                budget = deadline - time.monotonic()
                if budget <= 0:
                    proc.kill()
                    proc.wait()
                    return 124, got_json
                if sel.select(timeout=min(budget, 5.0)):
                    try:
                        data = os.read(fd, 1 << 16)
                    except BlockingIOError:
                        continue
                    if data == b"":
                        break  # EOF
                    flush_lines(data)
                elif proc.poll() is not None:
                    break
        finally:
            sel.close()
        # drain whatever remains after EOF/exit (including a final
        # unterminated fragment)
        try:
            while True:
                data = os.read(fd, 1 << 16)
                if not data:
                    break
                flush_lines(data)
        except (BlockingIOError, OSError):
            pass
        if buf:
            flush_lines(b"\n")
        rc = proc.wait()
        return rc, got_json

    if tpu_responsive(probe_s):
        _log_host = lambda m: print(f"[bench orchestrator] {m}", file=sys.stderr, flush=True)
        _log_host(f"TPU probe ok; running TPU child (deadline {deadline_s:.0f}s)")
        rc, got = child("tpu-direct", deadline_s)
        if got:
            # The headline JSON landed. Even if the child then died in the
            # budget-gated extras (rc != 0), do NOT run the CPU fallback —
            # a later CPU line would shadow the TPU number for a
            # last-JSON-line parser.
            if rc != 0:
                _log_host(f"TPU child rc={rc} after emitting its headline; keeping it")
            return 0
        _log_host(f"TPU child rc={rc}, no JSON; falling back to CPU child")
        rc, got = child("cpu", max(240.0, deadline_s), fallback="tpu_died_mid_run")
        return 0 if got else rc
    print("[bench orchestrator] TPU unresponsive; CPU child",
          file=sys.stderr, flush=True)
    rc, got = child("cpu", max(240.0, deadline_s), fallback="tpu_unresponsive")
    return 0 if got else rc


_BD = os.environ.get("BENCH_DEVICE", "auto")
if _BD == "auto":
    sys.exit(_orchestrate())

from aprilslam_tpu.utils import configure_runtime

if _BD == "tpu-direct":
    # Child mode: keep jax's own resolution (the tunnelled TPU default) —
    # the parent holds the deadline. Only the compilation cache is enabled.
    from aprilslam_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    _DEVICE = "tpu"
else:
    _DEVICE = configure_runtime(_BD, probe_timeout_s=float(
        os.environ.get("BENCH_TPU_PROBE_S", "90")))

import numpy as np


def _elapsed() -> float:
    return time.perf_counter() - _T0


def _log(msg: str) -> None:
    """Progress telemetry on stderr (stdout carries only JSON lines)."""
    print(f"[bench {_elapsed():6.1f}s] {msg}", file=sys.stderr, flush=True)


def _remaining() -> float:
    return _BUDGET_S - _elapsed()


def _emit(result: dict) -> None:
    """Print a JSON line now and mirror it to BENCH_partial.json."""
    line = json.dumps(result)
    print(line, flush=True)
    try:
        with open(_PARTIAL_PATH, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


def _time_fn(fn, args, reps, warmup=2):
    """Median wall time of fn(*args) with block_until_ready, in seconds."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def stage_breakdown(cfg, cam, frames, params, reps=8, min_remaining=45.0):
    """Per-stage ms/frame on one frame chunk, each stage jitted separately
    and fed the previous stage's materialized output.

    Each stage compile costs ~35-40 s on this backend, so the budget is
    re-checked before every stage; stages that don't fit are skipped and
    listed under "skipped".
    """
    import jax
    import jax.numpy as jnp

    from aprilslam_tpu.detect.threshold import to_grayscale, decimate, adaptive_threshold_with_levels
    from aprilslam_tpu.detect.segment import connected_components_auto
    from aprilslam_tpu.detect.quads import quad_candidates
    from aprilslam_tpu.detect.decode import decode_quads, FamilyTensors
    from aprilslam_tpu.detect.refine import refine_corners
    from aprilslam_tpu.families import get_family
    from aprilslam_tpu.pose import poses_from_detections

    p = params
    fam = get_family(cfg.family)
    ft = FamilyTensors(fam)
    B = frames.shape[0]
    K = jnp.asarray(cam.matrix)

    ms: dict[str, float] = {}
    skipped: list[str] = []

    def fits(name: str) -> bool:
        if _remaining() > min_remaining:
            return True
        skipped.append(name)
        return False

    gray = to_grayscale(frames)
    dec = decimate(gray, p.quad_decimate)
    trinary = level = labels = quads = det = None

    if fits("threshold"):
        thresh = jax.jit(lambda f: adaptive_threshold_with_levels(
            decimate(to_grayscale(f), p.quad_decimate), tile=p.tile, min_contrast=p.min_contrast))
        trinary, level = thresh(frames)
        ms["threshold"] = _time_fn(thresh, (frames,), reps) / B * 1e3

    if trinary is not None and fits("ccl"):
        ccl = jax.jit(lambda t: connected_components_auto(t, p.scan_iters, p.jump_iters))
        labels = ccl(trinary)
        ms["ccl"] = _time_fn(ccl, (trinary,), reps) / B * 1e3

    if labels is not None and fits("quads"):
        quads_fn = jax.jit(lambda t, l, g, lv: quad_candidates(
            t, l, g, p.quad_decimate, lv,
            max_clusters=p.max_clusters, max_quads=p.max_quads,
            pts_per_quad=p.pts_per_quad, min_cluster_pts=p.min_cluster_pts,
            min_side=p.min_side, refine_iters=p.refine_iters,
            max_fit_err=p.max_fit_err, max_boundary=p.max_boundary))
        quads = quads_fn(trinary, labels, dec, level)
        ms["quads"] = _time_fn(quads_fn, (trinary, labels, dec, level), reps) / B * 1e3

    if quads is not None and fits("decode"):
        decode = jax.jit(lambda g, q: decode_quads(
            g, q, ft, max_hamming=p.max_hamming,
            min_level_contrast=p.min_level_contrast, max_detections=p.max_detections))
        det = decode(gray, quads)
        ms["decode"] = _time_fn(decode, (gray, quads), reps) / B * 1e3

    if det is not None and fits("refine"):
        refine = jax.jit(lambda g, c, v: refine_corners(
            g, c, v, ns=p.refine_samples, half_range=p.refine_range))
        _ = refine(gray, det.corners, det.valid)
        ms["refine"] = _time_fn(refine, (gray, det.corners, det.valid), reps) / B * 1e3

    if det is not None and fits("pnp"):
        pnp = jax.jit(lambda d: poses_from_detections(d, K, cfg.tag_size_inner))
        _ = pnp(det)
        ms["pnp"] = _time_fn(pnp, (det,), reps) / B * 1e3

    return ms, skipped


def main():
    import jax
    import jax.numpy as jnp

    from aprilslam_tpu.geometry import PinholeCamera
    from aprilslam_tpu.sim import SceneConfig, scene_tensors, render_frames, camera_in_tag_frames
    from aprilslam_tpu.sim import trajectory
    from aprilslam_tpu.detect import DetectorParams
    from aprilslam_tpu.slam import build_slam_step

    on_cpu = _DEVICE == "cpu"
    if on_cpu:
        _log("running on CPU (TPU unresponsive or BENCH_DEVICE=cpu); "
             "shrinking workload so the headline still lands")
    # CPU fallback defaults keep the same reference resolution but cut the
    # frame count so the timed loop finishes inside the driver window.
    B = int(os.environ.get("BENCH_BATCH", "4" if on_cpu else "8"))
    H = W = int(os.environ.get("BENCH_RES", "1000"))
    n_chunks = int(os.environ.get("BENCH_CHUNKS", "2" if on_cpu else "6"))
    passes = int(os.environ.get("BENCH_PASSES", "2" if on_cpu else "11"))
    do_sweep = os.environ.get("BENCH_SWEEP", "0" if on_cpu else "1") != "0"
    do_stages = os.environ.get("BENCH_STAGES", "0" if on_cpu else "1") != "0"

    _log("imports done; building scene")
    cfg = SceneConfig.from_file()
    cam = PinholeCamera.from_fov(W, H, cfg.fov_y)
    scene = scene_tensors(cfg)
    # max_detections 16 = 3x headroom over the 5-tag scene; halves the
    # (mostly padding) per-detection PnP work. ATE-verified neutral.
    params = DetectorParams(quad_decimate=2, min_cluster_pts=12,
                            max_detections=16)

    traj = trajectory.monte_carlo(B * n_chunks, seed=3)
    pos = jnp.asarray(traj.positions)
    rot = jnp.asarray(traj.rotations)
    K_inv = jnp.asarray(cam.inv_matrix)

    # chunk schedule beats per-frame on BOTH axes on the real chip
    # (fps 97.43 vs 93.37 at the time of the switch; ATE 0.2417 vs 0.2896;
    # 137.09 fps after the scatter-free detector work — all measured
    # 2026-08-21): the LM-BA solve runs once per chunk outside the
    # sequential scan and a batched re-localization against the final map
    # recovers (and improves) accuracy. Hence the default.
    step, init = build_slam_step(
        cfg.family,
        cam,
        cfg.tag_size_inner,
        detector_params=params,
        estimator=os.environ.get("BENCH_ESTIMATOR", "ba"),
        ba_schedule=os.environ.get("BENCH_BA_SCHEDULE", "chunk"),
        # In-scan localization only seeds keyframe insertion under the
        # chunk schedule (the reported pose comes from the post-scan
        # batched re-localization at full depth); 8 chunk-LM iterations
        # match 16 on ATE. Both verified ATE-neutral on the accuracy pass.
        init_joint_iters=3,
        ba_chunk_iters=8,
        # PnP only seeds the joint/BA refinement in this pipeline; 5 LM
        # iterations match 8 on ATE (0.2427 both, accuracy pass).
        pnp_iters=5,
    )
    # NOTE: no donate_argnums — buffer donation trips an INVALID_ARGUMENT in
    # the axon TPU backend (verified empirically; works fine without).
    step = jax.jit(step)

    # Pre-render all frame chunks on device (the harness, not the benchmark).
    _log("rendering chunks (render compile)")
    chunks = [
        render_frames(scene, pos[i * B : (i + 1) * B], rot[i * B : (i + 1) * B], K_inv, H, W, 2)
        for i in range(n_chunks)
    ]
    jax.block_until_ready(chunks)
    _log("chunks ready; compiling slam step")

    # Warmup / compile.
    state = init()
    state, outs = step(state, chunks[0])
    jax.block_until_ready(outs)
    compile_done_s = _elapsed()
    _log("step compiled; accuracy pass")

    # Accuracy pass: one sweep over the distinct chunks from a fresh state.
    state = init()
    all_outs = []
    for c in chunks:
        state, outs = step(state, c)
        all_outs.append(outs)
    jax.block_until_ready(all_outs)
    _log("accuracy pass done; timed loop")

    # Timed: steady state, >=512 frames by cycling the pre-rendered chunks.
    t0 = time.perf_counter()
    for _ in range(passes):
        for c in chunks:
            state, outs = step(state, c)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    frames_timed = passes * n_chunks * B
    fps = frames_timed / dt
    _log(f"timed loop done: {fps:.1f} fps")

    # Accuracy: ATE vs analytic GT, each frame in ITS OWN coordinate frame
    # (the anchor is the lowest id seen so far and can change mid-run).
    ids = cfg.tag_ids()
    gt_all = np.asarray(
        camera_in_tag_frames(
            jnp.asarray(cfg.tag_positions()), jnp.asarray(cfg.tag_rotations()), pos, rot
        )
    )  # (N, T, 4, 4)
    est = np.concatenate([np.asarray(o.poses) for o in all_outs])
    valid = np.concatenate([np.asarray(o.valid) for o in all_outs])
    coord = np.concatenate([np.asarray(o.coord_id) for o in all_outs])
    id_to_idx = {int(t): i for i, t in enumerate(ids)}
    t_idx = np.array([id_to_idx.get(int(c), -1) for c in coord])
    valid = valid & (t_idx >= 0)
    gt = gt_all[np.arange(len(est)), np.clip(t_idx, 0, len(ids) - 1)]
    errs = np.linalg.norm(est[valid, :3, 3] - gt[valid, :3, 3], axis=-1)
    ate_rmse = float(np.sqrt(np.mean(errs**2))) if len(errs) else float("nan")
    # Honest accounting: ATE over valid frames only, but the invalid count is
    # reported alongside so the exclusion is visible.
    n_invalid = int((~valid).sum())

    result = {
        "metric": "frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 2.69, 2),
        "ate_rmse_sim_units": round(ate_rmse, 4),
        "ate_rmse_baseline": 1.797,
        "valid_pose_rate": round(float(valid.mean()), 4),
        "invalid_frames": n_invalid,
        "batch": B,
        "resolution": f"{W}x{H}",
        "frames_timed": frames_timed,
        "compile_s": round(compile_done_s, 1),
        "device": str(jax.devices()[0]),
        **({"device_fallback": os.environ["BENCH_FALLBACK"]}
           if os.environ.get("BENCH_FALLBACK") else {}),
    }

    # ---- PRINT-FIRST: the headline goes out NOW, before any extras. ----
    _emit(result)

    # ---- Extras, each gated on remaining wall-clock budget. ----
    extras_skipped: list[str] = []

    if do_sweep:
        sweep = {str(B): round(fps, 2)}
        for Bs in (16, 32):
            if Bs == B:
                continue
            if _remaining() < 60.0:
                extras_skipped.append(f"sweep_batch_{Bs}")
                continue
            trj = trajectory.monte_carlo(Bs, seed=5)
            ch = render_frames(
                scene, jnp.asarray(trj.positions), jnp.asarray(trj.rotations),
                K_inv, H, W, 2,
            )
            jax.block_until_ready(ch)
            _log(f"sweep batch {Bs}: compiling")
            # Different batch => different shapes => a fresh compile is
            # unavoidable; the persistent cache serves repeat invocations.
            # Same estimator/schedule as the headline — a mismatched
            # builder would hand init()'s state a different pytree
            # structure and crash the extras.
            step_s_fn, init_s = build_slam_step(
                cfg.family, cam, cfg.tag_size_inner,
                detector_params=params,
                estimator=os.environ.get("BENCH_ESTIMATOR", "ba"),
                ba_schedule=os.environ.get("BENCH_BA_SCHEDULE", "chunk"),
            )
            step_s = jax.jit(step_s_fn)
            st = init_s()
            st, o = step_s(st, ch)
            jax.block_until_ready(o)
            n_pass = max(1, 128 // Bs)
            t0 = time.perf_counter()
            for _ in range(n_pass):
                st, o = step_s(st, ch)
            jax.block_until_ready(o)
            sweep[str(Bs)] = round(n_pass * Bs / (time.perf_counter() - t0), 2)
            _emit({**result, "batch_sweep_fps": sweep})
        result["batch_sweep_fps"] = sweep

    if do_stages:
        _log("stage breakdown")
        if _remaining() > 45.0:
            ms, stage_skipped = stage_breakdown(cfg, cam, chunks[0], params)
            full_ms = 1e3 / fps
            measured = sum(ms.values())
            if not stage_skipped:
                ms["slam_scan"] = max(0.0, full_ms - measured)
            result["stage_ms_per_frame"] = {k: round(v, 3) for k, v in ms.items()}
            if stage_skipped:
                extras_skipped.extend(f"stage_{s}" for s in stage_skipped)
        else:
            extras_skipped.append("stage_breakdown")

    if extras_skipped:
        result["extras_skipped"] = extras_skipped
    result["total_s"] = round(_elapsed(), 1)

    # ---- Enriched final line (a superset of the headline keys). ----
    _emit(result)


if __name__ == "__main__":
    main()
