"""Platform-scoped persistent JAX compile cache.

The TPU driver and the CPU test/dry-run paths share /root/repo/.jax_cache;
XLA cache entries are backend-specific, and deserializing a TPU-written
entry on the CPU backend is fatal. Scope the cache directory by the
*configured* platform (read from jax.config without initializing backends —
touching jax.devices() here would dial the axon TPU relay).

TPU/axon keeps the historical root directory so round-1 chip compiles stay
warm; every other platform gets its own subdirectory.
"""

from __future__ import annotations

CACHE_ROOT = "/root/repo/.jax_cache"


def enable_compile_cache() -> None:
    import jax

    try:
        platforms = jax.config.jax_platforms or ""
        primary = platforms.split(",")[0].strip() if platforms else ""
        if primary in ("", "axon", "tpu"):
            cache_dir = CACHE_ROOT
        else:
            cache_dir = f"{CACHE_ROOT}/{primary}"
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass
