"""Device curve ops vs host big-int ground truth.

Covers the reference's ECC op matrix (`manta-benchmark/benches/ecc.rs`):
point add (all edge cases), double, scalar mul, batch normalization — on
BLS12-381 G1/G2 and BN254 G1.
"""

import jax
import jax.numpy as jnp
import pytest

from manta_tpu.ops import curve as C
from manta_tpu.ops import field_ops as F
from manta_tpu.utils import hostmath

CURVES = [hostmath.BLS12_381_G1, hostmath.BN254_G1, hostmath.BLS12_381_G2]
# XLA CPU compiles of the G2 (Fq2) and BLS-Fr-scalar variants take minutes;
# the heavy ops keep one representative curve each (G2 algebra is still
# covered by add/double + the device-prover e2e).
LIGHT_CURVES = [hostmath.BN254_G1]


def host_points(curve, rng, n):
    g = curve.generator
    pts = [curve.scalar_mul(rng.randrange(1, curve.scalar_field.modulus), g) for _ in range(n)]
    return pts


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
class TestCurveOps:
    def test_point_roundtrip(self, curve, rng):
        ops = C.curve_ops_for(curve)
        pts = host_points(curve, rng, 3) + [None]
        dev = ops.encode_points(pts)
        assert ops.decode_points(dev) == pts

    def test_add_edge_cases(self, curve, rng):
        ops = C.curve_ops_for(curve)
        g = curve.generator
        p1 = curve.scalar_mul(5, g)
        p2 = curve.scalar_mul(7, g)
        # lanes: generic, p+p (double), p + (-p) (infinity), inf + q, p + inf,
        # inf + inf
        a_pts = [p1, p1, p1, None, p1, None]
        b_pts = [p2, p1, curve.neg(p1), p2, None, None]
        expected = [curve.add(a, b) for a, b in zip(a_pts, b_pts)]
        dev = jax.jit(ops.add)(ops.encode_points(a_pts), ops.encode_points(b_pts))
        assert ops.decode_points(dev) == expected

    def test_madd_edge_cases(self, curve, rng):
        """Mixed add (affine q): same edge matrix as the full add."""
        ops = C.curve_ops_for(curve)
        g = curve.generator
        p1 = curve.scalar_mul(5, g)
        p2 = curve.scalar_mul(7, g)
        a_pts = [p1, p1, p1, None, p1, None]
        b_pts = [p2, p1, curve.neg(p1), p2, None, None]
        expected = [curve.add(a, b) for a, b in zip(a_pts, b_pts)]
        dev = jax.jit(ops.madd)(ops.encode_points(a_pts), ops.encode_points(b_pts))
        assert ops.decode_points(dev) == expected
        # non-affine first operand (Z != 1): madd(2P_jac, q) == 2P + q
        dbl = ops.double(ops.encode_points([p1] * len(b_pts)))
        expected2 = [curve.add(curve.double(p1), b) for b in b_pts]
        dev2 = jax.jit(ops.madd)(dbl, ops.encode_points(b_pts))
        assert ops.decode_points(dev2) == expected2

    def test_double(self, curve, rng):
        ops = C.curve_ops_for(curve)
        pts = host_points(curve, rng, 4) + [None]
        expected = [curve.double(p) for p in pts]
        dev = jax.jit(ops.double)(ops.encode_points(pts))
        assert ops.decode_points(dev) == expected

    def test_scalar_mul(self, curve, rng):
        if curve not in LIGHT_CURVES:
            pytest.skip("scalar_mul compile covered on bn254_g1")
        ops = C.curve_ops_for(curve)
        g = curve.generator
        scalars = [0, 1, 2, rng.randrange(curve.scalar_field.modulus)]
        pts = [g] * len(scalars)
        expected = [curve.scalar_mul(k, g) for k in scalars]
        sc = jnp.asarray(
            F.encode_ints(curve.scalar_field, scalars, montgomery=False)
        )
        dev = jax.jit(ops.scalar_mul)(sc, ops.encode_points(pts))
        assert ops.decode_points(dev) == expected

    def test_to_affine_batch_normalization(self, curve, rng):
        if curve not in LIGHT_CURVES:
            pytest.skip("batch normalization compile covered on bn254_g1")
        ops = C.curve_ops_for(curve)
        pts = host_points(curve, rng, 5) + [None]
        dev = ops.encode_points(pts)
        # un-normalize: scalar-mul by 1 leaves points in projective form
        one = jnp.asarray(
            F.encode_ints(curve.scalar_field, [1] * len(pts), montgomery=False)
        )
        jac = ops.scalar_mul(one, dev)
        aff = jax.jit(ops.to_affine)(jac)
        assert ops.decode_points(aff) == pts

    def test_reduce_sum(self, curve, rng):
        if curve not in LIGHT_CURVES:
            pytest.skip("reduce_sum compile covered on bn254_g1")
        ops = C.curve_ops_for(curve)
        pts = host_points(curve, rng, 7) + [None, None]
        expected = None
        for p in pts:
            expected = curve.add(expected, p)
        dev = jax.jit(ops.reduce_sum)(ops.encode_points(pts))
        assert ops.decode_points(dev) == [expected]
