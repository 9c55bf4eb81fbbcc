"""RNS field core: encode/decode, mul/add/sub chains vs big-int ground truth."""

import jax
import pytest

from manta_tpu import fields
from manta_tpu.ops import rns as R

SPECS = [fields.BLS12_381_FQ, fields.BN254_FR]


@pytest.mark.parametrize("field", SPECS, ids=lambda s: s.name)
class TestRns:
    def test_spec_sound(self, field):
        spec = R.default_spec(field)
        R._check_spec(spec)

    def test_encode_decode(self, field, rng):
        spec = R.default_spec(field)
        vals = [0, 1, field.modulus - 1] + [
            rng.randrange(field.modulus) for _ in range(13)
        ]
        rep = R.encode_ints(spec, vals)
        assert R.decode_ints(spec, rep) == vals

    def test_mul(self, field, rng):
        spec = R.default_spec(field)
        p = field.modulus
        xs = [rng.randrange(p) for _ in range(64)]
        ys = [rng.randrange(p) for _ in range(64)]
        a = R.encode_ints(spec, xs)
        b = R.encode_ints(spec, ys)
        out = R.mul_jit(spec, tuple(map(jax.numpy.asarray, a)), tuple(map(jax.numpy.asarray, b)))
        assert R.decode_ints(spec, out) == [x * y % p for x, y in zip(xs, ys)]

    def test_add_sub(self, field, rng):
        spec = R.default_spec(field)
        p = field.modulus
        xs = [rng.randrange(p) for _ in range(16)]
        ys = [rng.randrange(p) for _ in range(16)]
        a = R.encode_ints(spec, xs)
        b = R.encode_ints(spec, ys)
        s = R.add_jit(spec, a, b)
        d = R.sub_jit(spec, a, b, 5)
        assert R.decode_ints(spec, s) == [(x + y) % p for x, y in zip(xs, ys)]
        assert R.decode_ints(spec, d) == [(x - y) % p for x, y in zip(xs, ys)]

    def test_ec_like_chain(self, field, rng):
        """The shape of a complete Edwards/Jacobian formula: interleaved
        muls, adds, subs with growing lazy bounds, then a final mul that
        renormalizes."""
        spec = R.default_spec(field)
        p = field.modulus
        n = 32
        vals = [[rng.randrange(p) for _ in range(n)] for _ in range(4)]
        reps = [R.encode_ints(spec, v) for v in vals]
        w, x, y, z = reps

        m1 = R.mul(spec, w, x)         # < 2^5 p
        m2 = R.mul(spec, y, z)         # < 2^5 p
        s1 = R.add(spec, m1, m2)       # < 2^6 p
        d1 = R.sub(spec, m1, m2, 5)    # < 2^6 p
        s2 = R.add(spec, s1, d1)       # < 2^7 p
        d2 = R.sub(spec, s2, m1, 5)    # < 2^8 p
        out = R.mul(spec, d2, s1)      # renormalized
        got = R.decode_ints(spec, jax.tree.map(lambda v: jax.device_get(v), out))

        def host(i):
            a, b, c, d = (vals[k][i] for k in range(4))
            hm1, hm2 = a * b % p, c * d % p
            hs1 = (hm1 + hm2) % p
            hd1 = (hm1 - hm2) % p
            hs2 = (hs1 + hd1) % p
            hd2 = (hs2 - hm1) % p
            return hd2 * hs1 % p

        assert got == [host(i) for i in range(n)]

    def test_long_mul_chain(self, field, rng):
        """100 sequential muls (pow-like) — any extension drift compounds."""
        spec = R.default_spec(field)
        p = field.modulus
        x = rng.randrange(p)
        rep = R.encode_ints(spec, [x] * 8)
        acc = rep
        expected = x
        for _ in range(100):
            acc = R.mul(spec, acc, rep)
            expected = expected * x % p
        assert R.decode_ints(spec, acc) == [expected] * 8


class TestRnsCurveBackend:
    """Full curve + MSM machinery over the RNS backend (toy curve won't work
    — RNS needs large p vs moduli; use BN254 G1 with tiny batches)."""

    def test_curve_ops_rns(self, rng):
        import jax
        import jax.numpy as jnp
        from manta_tpu.ops import curve as C
        from manta_tpu.ops import field_ops as F
        from manta_tpu.utils import hostmath

        curve = hostmath.BN254_G1
        ops = C.curve_ops_for(curve, backend="rns")
        g = curve.generator
        pts = [curve.scalar_mul(k + 3, g) for k in range(4)] + [None]
        dev = ops.encode_points(pts)
        assert ops.decode_points(dev) == pts
        # add edge cases
        a_pts = [pts[0], pts[0], pts[0], None, pts[1]]
        b_pts = [pts[1], pts[0], curve.neg(pts[0]), pts[2], None]
        expected = [curve.add(a, b) for a, b in zip(a_pts, b_pts)]
        out = jax.jit(ops.add)(ops.encode_points(a_pts), ops.encode_points(b_pts))
        assert ops.decode_points(out) == expected
        # double + to_affine
        dbl = jax.jit(ops.double)(dev)
        assert ops.decode_points(dbl) == [curve.double(p) for p in pts]
        aff = jax.jit(ops.to_affine)(dbl)
        assert ops.decode_points(aff) == [curve.double(p) for p in pts]

    def test_msm_rns(self, rng):
        import jax.numpy as jnp
        from manta_tpu.ops import curve as C
        from manta_tpu.ops import field_ops as F
        from manta_tpu.ops import msm as M
        from manta_tpu.utils import hostmath

        curve = hostmath.BN254_G1
        ops = C.curve_ops_for(curve, backend="rns")
        g = curve.generator
        n = 8
        points = [curve.scalar_mul(k + 1, g) for k in range(n)]
        scalars = [rng.randrange(curve.scalar_field.modulus) for _ in range(n - 2)] + [0, 1]
        expected = curve.msm(scalars, points)
        sc = jnp.asarray(F.encode_ints(curve.scalar_field, scalars, montgomery=False))
        result = M.msm_jit(ops, sc, ops.encode_points(points), 4)
        assert ops.decode_points(result) == [expected]


class TestRnsAnnotatedCurve:
    """Bound-annotated (renorm-free) RNS formulas vs host ground truth."""

    def test_annotated_curve_and_msm(self, rng):
        import jax
        import jax.numpy as jnp
        from manta_tpu.ops import curve as C
        from manta_tpu.ops import field_ops as F
        from manta_tpu.ops import msm as M
        from manta_tpu.utils import hostmath

        curve = hostmath.BN254_G1
        ops = C.rns_curve_ops_for(curve)
        g = curve.generator
        pts = [curve.scalar_mul(k + 3, g) for k in range(4)] + [None]
        a_pts = [pts[0], pts[0], pts[0], None, pts[1]]
        b_pts = [pts[1], pts[0], curve.neg(pts[0]), pts[2], None]
        expected = [curve.add(a, b) for a, b in zip(a_pts, b_pts)]
        out = jax.jit(ops.add)(ops.encode_points(a_pts), ops.encode_points(b_pts))
        assert ops.decode_points(out) == expected
        dev = ops.encode_points(pts)
        dbl = jax.jit(ops.double)(dev)
        assert ops.decode_points(dbl) == [curve.double(p) for p in pts]
        # chained doubles (bound stability over iterations)
        d4 = ops.double(ops.double(ops.double(dbl)))
        assert ops.decode_points(d4)[0] == curve.scalar_mul(16, pts[0])
        # full MSM
        n = 8
        points = [curve.scalar_mul(k + 1, g) for k in range(n)]
        scalars = [rng.randrange(curve.scalar_field.modulus) for _ in range(n - 2)] + [0, 1]
        sc = jnp.asarray(F.encode_ints(curve.scalar_field, scalars, montgomery=False))
        result = M.msm_jit(ops, sc, ops.encode_points(points), 4)
        assert ops.decode_points(result) == [curve.msm(scalars, points)]
