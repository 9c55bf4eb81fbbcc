"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp

from manta_tpu.ops import curve as C
from manta_tpu.ops import field_ops as F
from manta_tpu.parallel import mesh as MESH
from manta_tpu.parallel.msm_sharded import sharded_msm
from manta_tpu.utils import hostmath

TOY = hostmath.TOY_G1


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_msm_matches_host(rng):
    ops = C.curve_ops_for(TOY)
    mesh = MESH.data_mesh()
    n = 64  # 8 per device
    points = [
        TOY.scalar_mul(rng.randrange(1, TOY.scalar_field.modulus), TOY.generator)
        for _ in range(n)
    ]
    scalars = [rng.randrange(TOY.scalar_field.modulus) for _ in range(n)]
    expected = TOY.msm(scalars, points)
    sc = jnp.asarray(F.encode_ints(TOY.scalar_field, scalars, montgomery=False))
    pts = ops.encode_points(points)
    result = jax.jit(sharded_msm, static_argnums=(0, 3, 4))(
        ops, sc, pts, mesh, 4
    )
    assert ops.decode_points(result) == [expected]
