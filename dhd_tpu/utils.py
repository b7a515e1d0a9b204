"""Small runtime utilities shared by the CLI entry points."""
from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache.

    DHD-S forward compiles in ~2 min through the device tunnel; caching
    compiled executables on disk makes every subsequent CLI invocation /
    benchmark run start in seconds.  The reference has no equivalent (torch
    eager doesn't need one).

    Env override: ``DHD_CACHE_DIR`` (set to ``0`` or ``off`` to disable).
    """
    import jax

    env = os.environ.get("DHD_CACHE_DIR")
    if env in ("0", "off", "none"):
        return ""
    cache_dir = env or cache_dir or os.path.expanduser("~/.cache/dhd_tpu/xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
