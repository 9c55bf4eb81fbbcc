"""Test configuration: force a virtual 8-device CPU mesh.

Tests never require the real TPU; sharding tests use 8 virtual CPU devices
(mirroring how the driver dry-runs the multi-chip path).

This machine boots an `axon` PJRT plugin into every Python process via a
PYTHONPATH sitecustomize, whose `register()` sets jax_platforms="axon,cpu" —
so every lowering dials the remote TPU relay (minutes of latency/flakiness).
For tests we override the config back to CPU-only and clear any initialized
backends so the 8-device XLA flag takes effect on re-init.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
    from jax.extend.backend import clear_backends

    clear_backends()

# Persistent compile cache: the big-integer kernels lower to large XLA graphs
# whose CPU compiles take minutes; cache them across test runs.
#
# Platform- AND machine-scoped subdirectory (see utils/jaxcache.py): TPU
# entries are fatal to deserialize on CPU, and XLA:CPU AOT entries embed
# host CPU features — each round runs on a fresh VM whose features differ,
# so stale-host entries fail to load with hundreds of noisy errors.
from manta_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0x4D414E54)
