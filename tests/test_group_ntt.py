"""Device group-element iNTT vs the host recursion (`mpc.rs:378-381`)."""

import jax.numpy as jnp
import pytest

from manta_tpu.ceremony import phase2 as P2
from manta_tpu.ops import curve as C
from manta_tpu.ops import group_ntt as GN
from manta_tpu.utils import hostmath

TOY = hostmath.TOY_G1


def _host_intt(curve, points):
    r = curve.scalar_field.modulus
    n = len(points)
    omega = curve.scalar_field.root_of_unity(n)
    return P2.group_intt(
        curve, points, pow(omega, -1, r), pow(n, -1, r)
    )


# TOY_FR has two-adicity 3: n <= 8
@pytest.mark.parametrize("n", [2, 4, 8])
def test_group_intt_matches_host(rng, n):
    curve = TOY
    cops = C.curve_ops_for(curve)
    points = [
        curve.scalar_mul(
            rng.randrange(1, curve.scalar_field.modulus), curve.generator
        )
        for _ in range(n)
    ]
    want = _host_intt(curve, points)
    got = GN.group_intt_points(cops, points)
    assert got == want


def test_group_intt_roundtrip_interpolation(rng):
    """iNTT of evaluations [f(ω^i)]G must yield [coeff_i]G."""
    curve = TOY
    r = curve.scalar_field.modulus
    n = 8
    omega = curve.scalar_field.root_of_unity(n)
    coeffs = [rng.randrange(r) for _ in range(n)]

    def f(x):
        acc, xp = 0, 1
        for c in coeffs:
            acc = (acc + c * xp) % r
            xp = xp * x % r
        return acc

    evals = [
        curve.scalar_mul(f(pow(omega, i, r)), curve.generator)
        for i in range(n)
    ]
    cops = C.curve_ops_for(curve)
    got = GN.group_intt_points(cops, evals)
    want = [curve.scalar_mul(c, curve.generator) for c in coeffs]
    assert got == want


@pytest.mark.slow
def test_group_intt_bn254_g1_and_g2(rng):
    """Production-curve group iNTT on both groups (small n, CPU)."""
    from manta_tpu.models import pairing as PR

    for curve in (PR.BN254_PAIRING.g1, PR.BN254_PAIRING.g2):
        cops = C.curve_ops_for(curve, "fused")
        n = 4
        points = [
            curve.scalar_mul(
                rng.randrange(1, curve.scalar_field.modulus), curve.generator
            )
            for _ in range(n)
        ]
        want = _host_intt(curve, points)
        got = GN.group_intt_points(cops, points)
        assert got == want
