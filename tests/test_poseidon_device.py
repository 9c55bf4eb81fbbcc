"""Device Poseidon vs host reference + published vectors."""

import jax.numpy as jnp
import pytest

from manta_tpu import fields
from manta_tpu.ops import field_ops as F
from manta_tpu.ops import poseidon as P
from manta_tpu.utils import grain


def test_width3_bls_vector():
    """The sage-derived hardcoded vector, on device."""
    spec = grain.poseidon_spec(
        fields.BLS12_381_FR, 3, domain_tag="two_power_minus_one"
    )
    inputs = jnp.asarray(F.encode_ints(spec.field, [1, 2])).reshape(
        spec.field.num_limbs, 2, 1
    ).transpose(1, 0, 2)
    out = P.hash_untruncated(spec, inputs)
    got = [
        F.decode_ints(spec.field, out[i])[0] for i in range(3)
    ]
    assert got == [
        1808609226548932412441401219270714120272118151392880709881321306315053574086,
        13469396364901763595452591099956641926259481376691266681656453586107981422876,
        28037046374767189790502007352434539884533225547205397602914398240898150312947,
    ]


@pytest.mark.parametrize("arity", [2, 4, 5])
def test_production_hash_matches_host(arity, rng):
    """Batched device hash == host big-int reference, production params."""
    spec = P.production_spec(arity)
    fspec = spec.field
    n = 5
    cols = [[rng.randrange(fspec.modulus) for _ in range(n)] for _ in range(arity)]
    expected = [
        grain.poseidon_hash(spec, [cols[a][i] for a in range(arity)])
        for i in range(n)
    ]
    flat = [x for col in cols for x in col]
    inputs = jnp.asarray(F.encode_ints(fspec, flat)).reshape(
        fspec.num_limbs, arity, n
    ).transpose(1, 0, 2)
    out = P.hash_jit(spec, inputs)
    assert F.decode_ints(fspec, out) == expected
