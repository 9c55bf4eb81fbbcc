"""Fused Pallas point-kernel correctness (interpret mode on CPU).

Verifies the whole-formula kernels (`manta_tpu.ops.pallas.point_kernels`)
against host big-int ground truth, including the branchless edge cases and
the fused MSM column accumulation.

The TOY-curve tests (2-limb fields) always run; the BLS12-381 classes are
gated behind MANTA_TPU_SLOW_TESTS — XLA:CPU takes tens of minutes PER
KERNEL to compile the inlined 24-limb interpret-mode bodies on a fresh
machine (measured >20 min for one fused add; the kernels share every line
with the toy instantiation except the FieldSpec constants, and the real
curves are exercised on the chip by bench.py / the device tests).
"""

import os
import random

import jax.numpy as jnp
import pytest

from manta_tpu.ops import curve as C
from manta_tpu.ops import msm as M
from manta_tpu.ops.curve import JacobianPoint
from manta_tpu.ops.pallas import point_kernels as PK
from manta_tpu.utils import hostmath

SLOW = os.environ.get("MANTA_TPU_SLOW_TESTS") == "1"
slow_only = pytest.mark.skipif(
    not SLOW,
    reason="set MANTA_TPU_SLOW_TESTS=1 (tens of minutes of XLA:CPU compile "
    "per 24-limb interpret-mode kernel on a fresh machine)",
)


def _host_points(curve, ks):
    return [
        None if k == 0 else curve.scalar_mul(k, curve.generator) for k in ks
    ]


@pytest.fixture(scope="module")
def g1():
    return PK.fused_curve_ops_for(hostmath.BLS12_381_G1)


class TestToyFusedPointOps:
    """Edge-case coverage of the fused formulas on the toy curve — cheap
    interpret-mode bodies, every dispatch path."""

    @pytest.fixture(scope="class")
    def toy(self):
        return PK.fused_curve_ops_for(hostmath.TOY_G1)

    def test_add_with_edge_cases(self, toy):
        curve = toy.curve
        p_ks = [3, 5, 0, 7, 11, 13]
        q_ks = [4, 0, 6, 7, curve.scalar_field.modulus - 11, 17]
        p_host = _host_points(curve, p_ks)
        q_host = _host_points(curve, q_ks)
        got = toy.decode_points(
            toy.add(toy.encode_points(p_host), toy.encode_points(q_host))
        )
        assert got == [curve.add(a, b) for a, b in zip(p_host, q_host)]

    def test_madd_and_double(self, toy):
        curve = toy.curve
        p_ks = [2, 9, 0, 8, 21]
        q_ks = [5, 0, 3, 8, curve.scalar_field.modulus - 21]
        p_host = _host_points(curve, p_ks)
        q_host = _host_points(curve, q_ks)
        got = toy.decode_points(
            toy.madd(toy.encode_points(p_host), toy.encode_points(q_host))
        )
        assert got == [curve.add(a, b) for a, b in zip(p_host, q_host)]
        ks = [1, 2, 0, 9]
        host = _host_points(curve, ks)
        got = toy.decode_points(toy.double(toy.encode_points(host)))
        assert got == [curve.double(a) for a in host]


@slow_only
class TestFusedPointOps:
    def test_add_with_edge_cases(self, g1):
        curve = g1.curve
        # lanes: generic add, p+inf, inf+q, p+p (double), p+(-p) (infinity)
        p_ks = [3, 5, 0, 7, 11, 13]
        q_ks = [4, 0, 6, 7, -11, 17]
        p_host = _host_points(curve, p_ks)
        q_host = [
            None
            if k == 0
            else curve.scalar_mul(k % curve.scalar_field.modulus, curve.generator)
            for k in q_ks
        ]
        p = g1.encode_points(p_host)
        q = g1.encode_points(q_host)
        got = g1.decode_points(g1.add(p, q))
        want = [
            curve.add(a, b) for a, b in zip(p_host, q_host)
        ]
        assert got == want

    def test_madd_matches_add(self, g1):
        curve = g1.curve
        p_ks = [2, 9, 0, 8, 21]
        q_ks = [5, 0, 3, 8, -21]
        p_host = _host_points(curve, p_ks)
        q_host = [
            None
            if k == 0
            else curve.scalar_mul(k % curve.scalar_field.modulus, curve.generator)
            for k in q_ks
        ]
        p = g1.encode_points(p_host)
        q = g1.encode_points(q_host)
        got = g1.decode_points(g1.madd(p, q))
        want = [curve.add(a, b) for a, b in zip(p_host, q_host)]
        assert got == want

    def test_double(self, g1):
        curve = g1.curve
        ks = [1, 2, 0, 9]
        host = _host_points(curve, ks)
        got = g1.decode_points(g1.double(g1.encode_points(host)))
        assert got == [curve.double(a) for a in host]

    def test_g2_add(self):
        g2 = PK.fused_curve_ops_for(hostmath.BLS12_381_G2)
        curve = g2.curve
        p_host = _host_points(curve, [3, 0, 7])
        q_host = _host_points(curve, [4, 6, 7])
        got = g2.decode_points(
            g2.add(g2.encode_points(p_host), g2.encode_points(q_host))
        )
        assert got == [curve.add(a, b) for a, b in zip(p_host, q_host)]


@slow_only
class TestFusedMsm:
    @pytest.mark.parametrize("signed", [False, True], ids=["unsigned", "signed"])
    def test_msm_matches_host(self, g1, signed):
        from manta_tpu.ops import field_ops as F

        curve = g1.curve
        rng = random.Random(7)
        n = 256
        base_ks = [rng.randrange(1, curve.scalar_field.modulus) for _ in range(32)]
        ks = [base_ks[i % 32] for i in range(n)]
        points = _host_points(curve, ks)
        # a couple of infinity points exercise the qinf path
        points[5] = None
        points[200] = None
        scalars = [rng.randrange(curve.scalar_field.modulus) for _ in range(n)]
        sc = jnp.asarray(
            F.encode_ints(curve.scalar_field, scalars, montgomery=False)
        )
        pts = g1.encode_points(points)
        # column_steps=2 -> 128 lanes: engages the fused column kernel
        out = M.msm_jit(
            g1, sc, pts, 13, False, 2, curve.scalar_field.bits, signed
        )
        got = g1.decode_points(out)[0]
        want = curve.msm(scalars, points)
        assert got == want


class TestKernelFieldOps:
    """Direct (outside-pallas) checks of the in-kernel limb arithmetic —
    the classes run on plain jnp arrays, so no kernel compiles needed."""

    @pytest.mark.parametrize("curve_name", ["bls", "bn"])
    def test_mul_sqr_vs_host(self, curve_name):
        import random as _r

        from manta_tpu.ops import field_ops as F
        from manta_tpu.ops.pallas import point_kernels as PKm

        spec = (
            hostmath.BLS12_381_G1.field
            if curve_name == "bls"
            else hostmath.BN254_G1.field
        )
        rng = _r.Random(5)
        vals_a = [rng.randrange(spec.modulus) for _ in range(256)]
        vals_b = [rng.randrange(spec.modulus) for _ in range(256)]
        a16 = jnp.asarray(F.encode_ints(spec, vals_a))
        b16 = jnp.asarray(F.encode_ints(spec, vals_b))

        def decode(arr16):
            return F.decode_ints(spec, arr16)

        # 16-bit kernel ops
        k16 = PKm._KernelCoordOps(spec)
        got_mul = decode(k16.mul(a16, b16))
        got_sqr = decode(k16.sqr(a16))
        for ga, gs, va, vb in zip(got_mul, got_sqr, vals_a, vals_b):
            assert ga == va * vb % spec.modulus
            assert gs == va * va % spec.modulus

        # 12-bit kernel ops (BLS only)
        if PKm._w12_limbs(spec):
            k12 = PKm._KernelCoordOps12(spec)
            a12, b12 = k12.unpack(a16), k12.unpack(b16)
            got_mul = decode(k12.pack(k12.mul(a12, b12)))
            got_sqr = decode(k12.pack(k12.sqr(a12)))
            for ga, gs, va, vb in zip(got_mul, got_sqr, vals_a, vals_b):
                assert ga == va * vb % spec.modulus
                assert gs == va * va % spec.modulus
            # lazy-domain inputs (values in [p, 2p)) must also square
            # right: build them by adding p's raw limbs to Montgomery rows
            import numpy as np

            raw_p = [
                (spec.modulus >> (16 * i)) & 0xFFFF
                for i in range(spec.num_limbs)
            ]
            a_hi = np.asarray(a16[:, :32]).astype(np.int64)
            carry = 0
            rows = []
            for i in range(spec.num_limbs):
                t = a_hi[i] + raw_p[i] + carry
                rows.append(t & 0xFFFF)
                carry = t >> 16
            hi16 = jnp.asarray(np.stack(rows).astype(np.uint32))
            got = decode(k12.pack(k12.sqr(k12.unpack(hi16))))
            for g, va in zip(got, vals_a[:32]):
                assert g == va * va % spec.modulus

    def test_ks_add_sub_vs_host(self):
        """12-bit Kogge-Stone add/sub (lazy [0,2p) domain) vs host ints,
        with adversarial carry/borrow patterns."""
        import random as _r

        from manta_tpu.ops import field_ops as F
        from manta_tpu.ops.pallas import point_kernels as PKm

        spec = hostmath.BLS12_381_G1.field
        k12 = PKm._KernelCoordOps12(spec)
        p = spec.modulus
        rng = _r.Random(11)
        dense = int("f" * 95, 16)  # 380 bits of 0xF nibbles
        cases = []
        for _ in range(120):
            cases.append((rng.randrange(2 * p), rng.randrange(2 * p)))
        # carry-chain stress: values whose limbs are mostly 0xFFF, near-p,
        # near-2p, zero, and pairs that sum just below/above 2p
        for v in (0, 1, p - 1, p, p + 1, 2 * p - 1, dense % (2 * p)):
            for w in (0, 1, p - 1, p, 2 * p - 1, (2 * p - 1 - v) % (2 * p)):
                cases.append((v, w))
        vals_a = [a for a, _ in cases]
        vals_b = [b for _, b in cases]
        pad = (-len(cases)) % 64
        vals_a += [0] * pad
        vals_b += [0] * pad

        # encode RAW limbs directly (encode_ints reduces mod p; lazy-domain
        # values in [p, 2p) must keep their exact representation)
        import numpy as np

        def raw16(vals):
            arr = np.zeros((spec.num_limbs, len(vals)), np.uint32)
            for c, v in enumerate(vals):
                for i in range(spec.num_limbs):
                    arr[i, c] = (v >> (16 * i)) & 0xFFFF
            return jnp.asarray(arr)

        a16 = raw16(vals_a)
        b16 = raw16(vals_b)
        def raw_decode(arr16):
            a = np.asarray(arr16, dtype=object)
            return [
                int(sum(int(a[i, c]) << (16 * i) for i in range(spec.num_limbs)))
                for c in range(a.shape[1])
            ]

        a12, b12 = k12.unpack(a16), k12.unpack(b16)
        got_add = raw_decode(k12.pack(k12.add(a12, b12)))
        got_sub = raw_decode(k12.pack(k12.sub(a12, b12)))
        for (va, vb), ga, gs in zip(cases, got_add, got_sub):
            s = va + vb
            if s >= 2 * p:
                s -= 2 * p
            assert ga == s, f"add({va},{vb})"
            d = va - vb
            if d < 0:
                d += 2 * p
            assert gs == d, f"sub({va},{vb})"
