"""Device field arithmetic vs Python big-int ground truth.

Mirrors the reference's field-backend tests
(reference `manta-crypto/src/arkworks/constraint/fp.rs` semantics): random
vectors, edge values (0, 1, p-1), algebraic identities.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from manta_tpu import fields
from manta_tpu.ops import field_ops as F

SPECS = [fields.BN254_FR, fields.BLS12_381_FR, fields.BLS12_381_FQ]


def sample_values(spec, rng, n):
    edge = [0, 1, 2, spec.modulus - 1, spec.modulus - 2, spec.R % spec.modulus]
    rand = [rng.randrange(spec.modulus) for _ in range(n - len(edge))]
    return edge + rand


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
class TestFieldOps:
    def test_encode_decode_roundtrip(self, spec, rng):
        vals = sample_values(spec, rng, 10)
        arr = F.encode_ints(spec, vals)
        assert F.decode_ints(spec, arr) == vals
        raw = F.encode_ints(spec, vals, montgomery=False)
        assert F.decode_ints(spec, raw, montgomery=False) == vals

    def test_add_sub_neg(self, spec, rng):
        p = spec.modulus
        xs = sample_values(spec, rng, 16)
        ys = list(reversed(xs))
        a, b = F.encode_ints(spec, xs), F.encode_ints(spec, ys)
        got_add = F.decode_ints(spec, F.add_jit(spec, a, b))
        got_sub = F.decode_ints(spec, F.sub_jit(spec, a, b))
        got_neg = F.decode_ints(spec, F.sub_jit(spec, F.zeros(spec, a.shape[1:]), a))
        assert got_add == [(x + y) % p for x, y in zip(xs, ys)]
        assert got_sub == [(x - y) % p for x, y in zip(xs, ys)]
        assert got_neg == [(-x) % p for x in xs]

    def test_mont_mul(self, spec, rng):
        p = spec.modulus
        xs = sample_values(spec, rng, 32)
        ys = list(reversed(xs))
        a, b = F.encode_ints(spec, xs), F.encode_ints(spec, ys)
        got = F.decode_ints(spec, F.mont_mul_jit(spec, a, b))
        assert got == [(x * y) % p for x, y in zip(xs, ys)]

    def test_mont_roundtrip(self, spec, rng):
        xs = sample_values(spec, rng, 8)
        raw = jnp.asarray(F.encode_ints(spec, xs, montgomery=False))
        mont = F.to_mont(spec, raw)
        back = F.from_mont(spec, mont)
        assert F.decode_ints(spec, back, montgomery=False) == xs

    def test_pow_and_inv(self, spec, rng):
        if spec.name == "bls12_381_fr":
            pytest.skip("inv covered on L=16 (bn254) and L=24 (bls fq)")
        p = spec.modulus
        xs = [1, 2, rng.randrange(1, p), p - 1]
        a = F.encode_ints(spec, xs)
        e = rng.randrange(1 << 40)
        got_pow = F.decode_ints(spec, F.pow_const_jit(spec, a, e))
        assert got_pow == [pow(x, e, p) for x in xs]
        got_inv = F.decode_ints(spec, F.inv_jit(spec, a))
        assert got_inv == [pow(x, -1, p) for x in xs]

    def test_inv_zero_is_zero(self, spec, rng):
        if spec.name != "bn254_fr":
            pytest.skip("covered once")
        a = F.encode_ints(spec, [0, 5])
        got = F.decode_ints(spec, F.inv(spec, a))
        assert got[0] == 0 and got[1] == pow(5, -1, spec.modulus)

    def test_batch_inv(self, spec, rng):
        if spec.name != "bn254_fr":
            pytest.skip("batch_inv logic is spec-independent; run once")
        p = spec.modulus
        xs = [0, 1, p - 1] + [rng.randrange(1, p) for _ in range(13)]
        a = F.encode_ints(spec, xs)
        got = F.decode_ints(spec, F.batch_inv_jit(spec, a))
        expected = [pow(x, -1, p) if x else 0 for x in xs]
        assert got == expected
        # non-power-of-two lane count (rolled Hillis-Steele edge masking)
        xs_odd = xs[:13]
        got_odd = F.decode_ints(
            spec, F.batch_inv_jit(spec, F.encode_ints(spec, xs_odd))
        )
        assert got_odd == expected[:13]

    def test_lazy_accumulation_redc(self, spec, rng):
        """Sum of 8 schoolbook products reduced with a single REDC."""
        p = spec.modulus
        n = 8
        xs = [rng.randrange(p) for _ in range(n)]
        ys = [rng.randrange(p) for _ in range(n)]
        a, b = F.encode_ints(spec, xs), F.encode_ints(spec, ys)
        acc = F.school_prod(spec, a, b)  # (2L+1, n)
        total = jnp.sum(acc, axis=1, keepdims=True)
        got = F.decode_ints(spec, F.redc(spec, total))
        expected = sum(x * y for x, y in zip(xs, ys)) * pow(spec.R, -1, p) % p
        # mont semantics: redc(sum a_i*b_i) = sum x_i*y_i*R^2 * R^-1 ... with
        # a = xR, b = yR: redc gives sum x_i y_i R mod p, decode divides by R.
        assert got == [sum(x * y for x, y in zip(xs, ys)) % p]

    def test_predicates(self, spec, rng):
        xs = [0, 1, 0, rng.randrange(spec.modulus)]
        a = F.encode_ints(spec, xs)
        assert list(np.asarray(F.is_zero(spec, a))) == [x == 0 for x in xs]
        assert list(np.asarray(F.eq(spec, a, a))) == [True] * 4


def test_multi_dim_batch(rng):
    """Ops must work on (L, d1, d2) shaped batches (e.g. Poseidon states)."""
    spec = fields.BN254_FR
    xs = [rng.randrange(spec.modulus) for _ in range(6)]
    a = jnp.asarray(F.encode_ints(spec, xs)).reshape(spec.num_limbs, 2, 3)
    got = F.mont_mul(spec, a, a)
    flat = F.decode_ints(spec, got.reshape(spec.num_limbs, 6))
    assert flat == [x * x % spec.modulus for x in xs]
