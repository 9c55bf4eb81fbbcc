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

import hashlib
import os

CACHE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def _machine_tag() -> str:
    """Short fingerprint of the host CPU. XLA:CPU cache entries embed AOT
    machine features; loading an entry compiled on a different host fails
    (hundreds of noisy cpu_aot_loader errors + recompiles — the driver
    runs each round on a fresh VM with different CPU flags). Scoping the
    CPU cache dir by CPU model keeps stale-host entries out of the way."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "generic"


def enable_compile_cache() -> None:
    import jax

    try:
        platforms = jax.config.jax_platforms or ""
        primary = platforms.split(",")[0].strip() if platforms else ""
        if primary in ("", "axon", "tpu"):
            cache_dir = CACHE_ROOT
        elif primary == "cpu":
            cache_dir = f"{CACHE_ROOT}/cpu-{_machine_tag()}"
        else:
            cache_dir = f"{CACHE_ROOT}/{primary}"
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass
