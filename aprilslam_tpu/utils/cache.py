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


def configure_runtime(device: str = "auto", cache: bool = True) -> None:
    """One-stop runtime setup for CLI entry points.

    ``device``: "auto" keeps whatever platform jax resolves (TPU when
    present), "cpu"/"tpu" force that platform.  Forcing must go through
    ``jax.config`` — the host sitecustomize exports JAX_PLATFORMS=axon, so
    setting the env var alone is silently ignored.  Also enables the
    persistent compilation cache (every first-compile on the axon backend
    costs minutes; the cache makes every later app/bench invocation skip
    straight to execution).
    """
    if cache:
        enable_compilation_cache()
    if device and device != "auto":
        import jax

        platform = {"tpu": "axon,tpu"}.get(device, device)
        jax.config.update("jax_platforms", platform)
