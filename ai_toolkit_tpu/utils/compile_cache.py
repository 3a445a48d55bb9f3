"""Persistent XLA compilation cache.

The SDXL UNet backward takes >10 min to compile on the shared remote-compile
queue (reference-scale conv stacks); paying that once per machine instead of
once per process is the difference between "sdxl bench skipped" and a number
in the driver artifact. Mirrors the reference's reliance on torch.compile
caches being warm across runs (``toolkit/`` has no analog because eager torch
never pays this cost).

Call :func:`enable_persistent_cache` early (before the first jit). Safe to
call twice; safe on backends that cannot serialize executables (the cache
silently stores nothing and every compile stays a miss).
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax at an on-disk compilation cache. Returns the dir or None."""
    global _ENABLED
    if os.environ.get("AIT_NO_COMPILE_CACHE"):
        return None
    import jax

    # CPU AOT entries embed the compile host's machine features; loading them
    # on a different host (the axon relay compiles remotely) risks SIGILL.
    # The cache exists for the >10-min TPU conv compiles — skip it on CPU
    # unless the user points at a cache dir explicitly.
    if (os.environ.get("AIT_PLATFORM", "").lower() == "cpu"
            or "cpu" in os.environ.get("JAX_PLATFORMS", "").lower()) \
            and not os.environ.get("AIT_COMPILE_CACHE"):
        return None

    path = path or os.environ.get(
        "AIT_COMPILE_CACHE", os.path.expanduser("~/.cache/ait_jax_compile")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default min-compile-time is 1s; keep everything nontrivial so the
        # bench models (flux step, sdxl step, vae encode) all land in it
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _ENABLED = True
        return path
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        print(f"[compile-cache] disabled: {e}")
        return None
