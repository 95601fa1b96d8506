"""Persistent XLA compilation cache management.

Compiles on the axon TPU backend cost ~35-40 s each; every app, test, and
benchmark invocation would otherwise pay them again.  This module gives the
whole framework ONE place that turns on jax's persistent compilation cache
at a stable location, so the second invocation of any entry point skips
straight to execution.

Call :func:`enable_compilation_cache` before the first jit (it is safe to
call multiple times, and safe to call after jax is imported as long as no
computation has been compiled yet).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "APRILSLAM_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache"),
)

_enabled = False


def enable_compilation_cache(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at a stable directory.

    Returns the cache directory in use.  Idempotent.
    """
    global _enabled
    cache_dir = path or _DEFAULT_DIR
    if _enabled:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that took noticeable time to compile; the default
    # 1 s floor would already include our 35 s+ TPU compiles, but small
    # helper jits (renderer, metrics) add up across app runs too.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return cache_dir


def _probe_cache_path() -> str:
    """Per-user probe-verdict cache path.

    A fixed world-writable /tmp path lets another local user squat the
    file (forcing CPU fallback, or pinning a stale ok verdict) and makes
    two users collide on ownership — scope it by uid instead.
    """
    import os

    uid = os.getuid() if hasattr(os, "getuid") else 0
    return f"/tmp/aprilslam_tpu_probe.{uid}.json"


_PROBE_CACHE = _probe_cache_path()


def tpu_responsive(timeout_s: float = 90.0, cache_ttl_s: float = 300.0) -> bool:
    """True if the default (tunnelled TPU) backend runs a trivial op within
    ``timeout_s`` — probed in a SUBPROCESS, because a dead tunnel hangs the
    probing process inside backend init where no Python-level timeout can
    reach it (observed: ``jax.devices()`` blocking for 10+ minutes).

    The verdict is cached on disk for ``cache_ttl_s`` so back-to-back app
    invocations don't each pay the probe.
    """
    import json
    import subprocess
    import sys
    import time

    import os

    try:
        st = os.stat(_PROBE_CACHE)
        if hasattr(os, "getuid") and st.st_uid != os.getuid():
            raise OSError("probe cache not owned by this user")
        with open(_PROBE_CACHE) as f:
            saved = json.load(f)
        if time.time() - saved["ts"] < cache_ttl_s:
            return bool(saved["ok"])
    except (OSError, ValueError, KeyError):
        pass

    code = "import jax, jax.numpy as jnp; print(float(jnp.ones((8, 8)).sum()))"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        ok = r.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    try:
        with open(_PROBE_CACHE, "w") as f:
            json.dump({"ts": time.time(), "ok": ok}, f)
    except OSError:
        pass
    return ok


def configure_runtime(
    device: str = "auto", cache: bool = True, probe_timeout_s: float = 90.0
) -> str:
    """One-stop runtime setup for CLI entry points.  Returns the platform
    that was configured ("auto" if jax's own resolution was kept).

    ``device``: "cpu"/"tpu" force that platform; "auto" resolves in three
    steps: (1) a JAX_PLATFORMS=cpu environment request is honoured (through
    ``jax.config`` — the host sitecustomize force-registers the axon TPU
    platform, so the env var ALONE is silently ignored and, observed in
    practice, the process then hangs on a dead tunnel the user explicitly
    tried to avoid); (2) if a TPU platform would win, it is first probed in
    a subprocess with a deadline (see :func:`tpu_responsive`) — an
    unresponsive tunnel falls back to CPU with a warning instead of
    wedging the app forever; (3) otherwise jax's resolution stands.

    Also enables the persistent compilation cache (every first-compile on
    the axon backend costs minutes; the cache makes every later app/bench
    invocation skip straight to execution).
    """
    import sys

    if cache:
        enable_compilation_cache()
    if device == "auto":
        env = os.environ.get("JAX_PLATFORMS", "").strip().lower()
        if env == "cpu":
            device = "cpu"
        elif not tpu_responsive(probe_timeout_s):
            print(
                "[aprilslam] TPU backend unresponsive "
                f"(no trivial-op completion within {probe_timeout_s:.0f}s); "
                "falling back to CPU. Pass --device tpu to insist.",
                file=sys.stderr,
                flush=True,
            )
            device = "cpu"
    if device and device != "auto":
        import jax

        platform = {"tpu": "axon,tpu"}.get(device, device)
        jax.config.update("jax_platforms", platform)
    return device
