"""Canonical key / ceremony-round serialization round-trips (no pickle).

Mirrors the reference's CanonicalSerialize round-trip guarantees for
ProvingContext/VerifyingContext (`manta-crypto/src/arkworks/groth16.rs:216-500`).
"""

import random

from manta_tpu import fields
from manta_tpu.models import circuit as CC
from manta_tpu.models import groth16 as G
from manta_tpu.models import pairing as PR
from manta_tpu.utils import keyio


def _toy_keys():
    fr = fields.BN254_FR
    rng = random.Random(5)
    com = CC.R1CS(fr, mode="setup")
    a = com.secret_witness(None)
    b = com.secret_witness(None)
    c = com.public_input(None)
    com.assert_eq(com.mul(a, b), c)
    matrices, _ = com.finalize()
    pk, vk = G.setup(PR.BN254_PAIRING, matrices, seed=11)

    from manta_tpu.protocol.transfer import ShapeKeys

    return ShapeKeys(matrices=matrices, pk=pk, vk=vk), rng


def test_shape_keys_roundtrip_bytes_stable():
    keys, _ = _toy_keys()
    blob = keyio.shape_keys_to_bytes(keys)
    back = keyio.shape_keys_from_bytes(blob)
    # byte-stable: re-serializing the deserialized keys is identical
    assert keyio.shape_keys_to_bytes(back) == blob
    assert back.pk.domain_size == keys.pk.domain_size
    assert back.pk.a_query == keys.pk.a_query
    assert back.pk.b_g2_query == keys.pk.b_g2_query
    assert back.vk.gamma_abc_g1 == keys.vk.gamma_abc_g1
    assert back.matrices.rows == keys.matrices.rows
    assert back.matrices.num_instance == keys.matrices.num_instance


def test_roundtripped_keys_prove_and_verify():
    keys, _ = _toy_keys()
    back = keyio.shape_keys_from_bytes(keyio.shape_keys_to_bytes(keys))
    fr = fields.BN254_FR
    com = CC.R1CS(fr, mode="prove")
    a = com.secret_witness(3)
    b = com.secret_witness(7)
    c = com.public_input(21)
    com.assert_eq(com.mul(a, b), c)
    matrices, assignment = com.finalize()
    proof = G.prove(back.pk, back.matrices, assignment, 1, 2)
    assert G.verify(back.vk, proof, [21])
    assert not G.verify(back.vk, proof, [22])


def test_tampered_key_file_rejected():
    import pytest

    keys, _ = _toy_keys()
    blob = bytearray(keyio.shape_keys_to_bytes(keys))
    # corrupt a point coordinate beyond the header + matrices region:
    # uncompressed points are on-curve-checked at load
    blob[-40] ^= 0x5A
    with pytest.raises(Exception):
        keyio.shape_keys_from_bytes(bytes(blob))


def test_g2_uncompressed_roundtrip():
    from manta_tpu.utils import codec, hostmath

    curve = hostmath.BN254_G2
    rng = random.Random(7)
    for _ in range(4):
        pt = curve.scalar_mul(
            rng.randrange(1, curve.scalar_field.modulus), curve.generator
        )
        raw = codec.serialize_g2_uncompressed(pt, curve)
        assert codec.deserialize_g2_uncompressed(raw, curve) == pt
    inf = codec.serialize_g2_uncompressed(None, curve)
    assert codec.deserialize_g2_uncompressed(inf, curve) is None
