"""NTT vs naive host DFT, roundtrips, coset domains, polynomial mul."""

import jax.numpy as jnp
import pytest

from manta_tpu import fields
from manta_tpu.ops import field_ops as F
from manta_tpu.ops import ntt as NTT

SPEC = fields.BLS12_381_FR


def naive_dft(spec, coeffs, shift=1):
    """Evaluate polynomial at shift * omega^i for all i (host oracle)."""
    n = len(coeffs)
    p = spec.modulus
    omega = spec.root_of_unity(n)
    out = []
    for i in range(n):
        x = shift * pow(omega, i, p) % p
        acc, xp = 0, 1
        for c in coeffs:
            acc = (acc + c * xp) % p
            xp = xp * x % p
        out.append(acc)
    return out


@pytest.mark.parametrize("n", [1, 2, 8, 32])
def test_ntt_matches_naive_dft(n, rng):
    coeffs = [rng.randrange(SPEC.modulus) for _ in range(n)]
    a = jnp.asarray(F.encode_ints(SPEC, coeffs))
    got = F.decode_ints(SPEC, NTT.ntt_jit(SPEC, a))
    assert got == naive_dft(SPEC, coeffs)


def test_ntt_intt_roundtrip(rng):
    n = 64
    coeffs = [rng.randrange(SPEC.modulus) for _ in range(n)]
    a = jnp.asarray(F.encode_ints(SPEC, coeffs))
    back = F.decode_ints(SPEC, NTT.intt(SPEC, NTT.ntt(SPEC, a)))
    assert back == coeffs


def test_coset_ntt_matches_shifted_dft(rng):
    n = 16
    coeffs = [rng.randrange(SPEC.modulus) for _ in range(n)]
    a = jnp.asarray(F.encode_ints(SPEC, coeffs))
    got = F.decode_ints(SPEC, NTT.coset_ntt(SPEC, a))
    assert got == naive_dft(SPEC, coeffs, shift=SPEC.generator)
    back = F.decode_ints(SPEC, NTT.coset_intt(SPEC, NTT.coset_ntt(SPEC, a)))
    assert back == coeffs


def test_polynomial_multiplication_via_ntt(rng):
    """c(x) = a(x)·b(x) via pointwise product on a double-size domain —
    the core of the Groth16 h(x) computation."""
    p = SPEC.modulus
    n = 8
    a_c = [rng.randrange(p) for _ in range(n)]
    b_c = [rng.randrange(p) for _ in range(n)]
    # host product
    prod = [0] * (2 * n)
    for i, x in enumerate(a_c):
        for j, y in enumerate(b_c):
            prod[i + j] = (prod[i + j] + x * y) % p
    a = jnp.asarray(F.encode_ints(SPEC, a_c + [0] * n))
    b = jnp.asarray(F.encode_ints(SPEC, b_c + [0] * n))
    fa, fb = NTT.ntt(SPEC, a), NTT.ntt(SPEC, b)
    fc = F.mont_mul(SPEC, fa, fb)
    got = F.decode_ints(SPEC, NTT.intt(SPEC, fc))
    assert got == prod


def test_batched_ntt(rng):
    """Transform axis is last; leading batch axis carries many polynomials."""
    n, b = 8, 3
    polys = [[rng.randrange(SPEC.modulus) for _ in range(n)] for _ in range(b)]
    flat = [c for poly in polys for c in poly]
    a = jnp.asarray(F.encode_ints(SPEC, flat)).reshape(SPEC.num_limbs, b, n)
    out = NTT.ntt(SPEC, a)
    got = F.decode_ints(SPEC, out.reshape(SPEC.num_limbs, b * n))
    expected = [v for poly in polys for v in naive_dft(SPEC, poly)]
    assert got == expected


def test_bn254_fr_domain(rng):
    """BN254 Fr (production curve) domains work too."""
    spec = fields.BN254_FR
    n = 8
    coeffs = [rng.randrange(spec.modulus) for _ in range(n)]
    a = jnp.asarray(F.encode_ints(spec, coeffs))
    back = F.decode_ints(spec, NTT.intt(spec, NTT.ntt(spec, a)))
    assert back == coeffs
