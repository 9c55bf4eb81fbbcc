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


# LLVM *tuning* pseudo-features XLA:CPU bakes into every AOT cache entry's
# target-machine feature list. They are not real ISA bits: the host feature
# probe (`getHostCPUFeatures`, plain cpuid) can never report them, so
# `cpu_aot_loader` rejects every large cache entry — even ones this very
# machine wrote moments earlier — and recompiles from scratch (measured:
# 2-5 min per MSM program, the dominant cost of the warm dry-run). The
# code in the entry is already generated; the strings are metadata used
# only by the loader's compatibility check. Rewriting them (same byte
# length, so the protobuf framing is untouched) to ISA features every
# x86-64 host supports makes the check honest-equivalent and the entries
# loadable. See NOTES_r4 "XLA:CPU persistent-cache AOT entries".
_FEATURE_REWRITES = (
    (b"+prefer-no-scatter", b"+sse4.2,+sse,+sse2"),  # both 18 bytes
    (b"+prefer-no-gather", b"+sse4.1,+sse,+sse"),  # both 17 bytes
)


def _scrub_pseudo_features(data: bytes) -> bytes:
    for old, new in _FEATURE_REWRITES:
        assert len(old) == len(new)
        data = data.replace(old, new)
    return data


def _patch_cpu_aot_feature_check() -> None:
    """Scrub the tuning pseudo-features on both sides of the persistent
    compile cache so XLA:CPU AOT entries actually reload."""
    from jax._src import compilation_cache as cc

    if getattr(cc, "_manta_feature_scrub", False):
        return
    orig_decompress = cc.decompress_executable
    orig_compress = cc.compress_executable

    def decompress_executable(executable: bytes) -> bytes:
        return _scrub_pseudo_features(orig_decompress(executable))

    def compress_executable(executable: bytes) -> bytes:
        return orig_compress(_scrub_pseudo_features(bytes(executable)))

    cc.decompress_executable = decompress_executable
    cc.compress_executable = compress_executable
    cc._manta_feature_scrub = True


def enable_compile_cache() -> None:
    import jax

    try:
        _patch_cpu_aot_feature_check()
        if os.environ.get("MANTA_JAX_CACHE_DIR"):
            # explicit override (e.g. an isolated dir for a test process
            # running concurrently with another jax process — concurrent
            # readers/writers of one cache dir intermittently segfault)
            jax.config.update(
                "jax_compilation_cache_dir", os.environ["MANTA_JAX_CACHE_DIR"]
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
            return
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
