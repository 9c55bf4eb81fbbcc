"""Test configuration: force a virtual 8-device CPU mesh.

Tests never require the real TPU; sharding tests use 8 virtual CPU devices
(mirroring how the driver dry-runs the multi-chip path). The env vars must be
set before JAX is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0x4D414E54)
