"""Hybrid (limb-resident) RNS MSM backend vs host ground truth.

The `rns_hybrid` backend stores affine point arrays in 24-limb uint32
Montgomery form and converts limb -> f32 RNS inside the column kernel
(`rns_kernels.hybrid_accumulate_columns`). These tests check the
conversion against `rns.encode_ints` and the full MSM against the host
big-int oracle, on G1 and G2.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from manta_tpu.ops import curve as C
from manta_tpu.ops import field_ops as F
from manta_tpu.ops import msm as M
from manta_tpu.ops import rns as R
from manta_tpu.utils import hostmath

CURVE = hostmath.BLS12_381_G1


def test_from_limbs_matches_encode(rng):
    """Kernel-side limb -> RNS conversion == host rns.encode_ints, via a
    1-step hybrid column pass whose first step is a run head (acc = q)."""
    from manta_tpu.ops.pallas import rns_kernels as RK

    spec = R.default_spec(CURVE.field)
    cops = C.curve_ops_for(CURVE, "rns_hybrid")
    g = CURVE.generator
    lanes = 128
    pts = [CURVE.scalar_mul(k + 1, g) for k in range(lanes)]
    limb = cops.encode_points(pts)  # limb uint32 (L, lanes)
    px = limb.x[None]  # (K=1, L, lanes)
    py = limb.y[None]
    qinf = jnp.zeros((1, lanes), jnp.int32)
    head = jnp.ones((1, lanes), jnp.int32)
    ox, oy, oz = RK.hybrid_accumulate_columns(CURVE, px, py, qinf, head)
    # the head step copies q: outputs are the converted coordinates
    got_x = np.asarray(ox[0]).astype(np.int64)
    want_x = np.asarray(
        R.pack(spec, R.encode_ints(spec, [p[0] for p in pts]))
    ).astype(np.int64)
    # conversion output is x·M1 + eps·p in RNS — compare values mod p by
    # decoding through the RNS coordinate ops
    rops = R.RnsCoordOps(CURVE.field)
    assert rops.decode(got_x) == rops.decode(want_x)
    got_y = np.asarray(oy[0]).astype(np.int64)
    assert rops.decode(got_y) == [p[1] for p in pts]


@pytest.mark.parametrize("n,steps", [(256, 2), (512, 4)])
def test_hybrid_msm_g1(n, steps, rng):
    cops = C.curve_ops_for(CURVE, "rns_hybrid")
    g = CURVE.generator
    points = [CURVE.scalar_mul(k + 1, g) for k in range(n)]
    points[3] = None  # infinity lane
    scalars = [rng.randrange(CURVE.scalar_field.modulus) for _ in range(n)]
    expected = CURVE.msm(scalars, points)
    sc = jnp.asarray(
        F.encode_ints(CURVE.scalar_field, scalars, montgomery=False)
    )
    result = M.msm_jit(
        cops, sc, cops.encode_points(points), 8, False, steps,
        CURVE.scalar_field.bits, True,
    )
    assert cops.decode_points(result) == [expected]


def test_hybrid_msm_g2(rng):
    curve = hostmath.BLS12_381_G2
    cops = C.curve_ops_for(curve, "rns_hybrid")
    g = curve.generator
    n = 128
    points = [curve.scalar_mul(k + 1, g) for k in range(n)]
    scalars = [rng.randrange(curve.scalar_field.modulus) for _ in range(n)]
    expected = curve.msm(scalars, points)
    sc = jnp.asarray(
        F.encode_ints(curve.scalar_field, scalars, montgomery=False)
    )
    result = M.msm_jit(
        cops, sc, cops.encode_points(points), 8, False, 1,
        curve.scalar_field.bits, True,
    )
    assert cops.decode_points(result) == [expected]
