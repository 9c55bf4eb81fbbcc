"""Groth16 end-to-end on small circuits (host backend) + fuzzing.

Mirrors the reference's proof-system test strategy (SURVEY.md §4):
prove/verify roundtrip, and `verify_fuzz_public_input` — proofs must FAIL
under fuzzed public inputs (`manta-crypto/src/constraint.rs:390-411`).
"""

import pytest

from manta_tpu import fields
from manta_tpu.models import circuit as CC
from manta_tpu.models import groth16 as G
from manta_tpu.models import pairing as PR
from manta_tpu.utils import grain


def build_mul_circuit(com, x_val=None, y_val=None, z_val=None):
    """Prove knowledge of x, y with x*y = z (z public)."""
    x = com.secret_witness(x_val)
    y = com.secret_witness(y_val)
    z = com.public_input(z_val)
    com.assert_eq(com.mul(x, y), z)


def build_poseidon_preimage_circuit(com, spec, preimage=None, digest=None):
    """Prove knowledge of a 2-element Poseidon preimage of a public digest."""
    pre = [
        com.secret_witness(None if preimage is None else preimage[i])
        for i in range(2)
    ]
    d = com.public_input(digest)
    h = CC.poseidon_hash(com, spec, pre)
    com.assert_eq(h, d)


@pytest.fixture(scope="module")
def fr():
    return fields.BN254_FR


def test_r1cs_native_equivalence(fr, rng):
    """Native execution and R1CS prove-mode agree (the ECLAIR property)."""
    spec = grain.poseidon_spec(fr, 3)
    pre = [rng.randrange(fr.modulus) for _ in range(2)]
    digest = grain.poseidon_hash(spec, pre)
    # native: assertion passes
    com_n = CC.Native(fr)
    build_poseidon_preimage_circuit(com_n, spec, pre, digest)
    # r1cs prove mode: constraints satisfied
    com = CC.R1CS(fr, mode="prove")
    build_poseidon_preimage_circuit(com, spec, pre, digest)
    matrices, assignment = com.finalize()
    assert matrices.is_satisfied(assignment)
    # wrong digest: unsatisfied
    com_bad = CC.R1CS(fr, mode="prove")
    build_poseidon_preimage_circuit(com_bad, spec, pre, (digest + 1) % fr.modulus)
    m_bad, a_bad = com_bad.finalize()
    assert not m_bad.is_satisfied(a_bad)


def test_setup_prove_verify_mul(fr, rng):
    com_setup = CC.R1CS(fr, mode="setup")
    build_mul_circuit(com_setup)
    matrices, _ = com_setup.finalize()

    pk, vk = G.setup(PR.BN254_PAIRING, matrices, seed=42)

    x, y = rng.randrange(fr.modulus), rng.randrange(fr.modulus)
    z = x * y % fr.modulus
    com = CC.R1CS(fr, mode="prove")
    build_mul_circuit(com, x, y, z)
    m2, assignment = com.finalize()
    assert m2.num_constraints == matrices.num_constraints

    proof = G.prove(pk, matrices, assignment, r_rand=7, s_rand=11)
    assert G.verify(vk, proof, [z])
    # fuzzed public input must fail
    assert not G.verify(vk, proof, [(z + 1) % fr.modulus])
    # tampered proof must fail
    bad = G.Proof(a=proof.a, b=proof.b, c=vk.alpha_g1)
    assert not G.verify(vk, bad, [z])


def test_prove_verify_poseidon_preimage(fr, rng):
    """A real gadget circuit: ~200 constraints of Poseidon."""
    spec = grain.poseidon_spec(fr, 3)
    com_setup = CC.R1CS(fr, mode="setup")
    build_poseidon_preimage_circuit(com_setup, spec)
    matrices, _ = com_setup.finalize()

    pk, vk = G.setup(PR.BN254_PAIRING, matrices, seed=3)

    pre = [rng.randrange(fr.modulus) for _ in range(2)]
    digest = grain.poseidon_hash(spec, pre)
    com = CC.R1CS(fr, mode="prove")
    build_poseidon_preimage_circuit(com, spec, pre, digest)
    _, assignment = com.finalize()
    proof = G.prove(pk, matrices, assignment, r_rand=5, s_rand=9)
    assert G.verify(vk, proof, [digest])
    assert not G.verify(vk, proof, [(digest + 1) % fr.modulus])


def test_zero_randomness_proof(fr, rng):
    """r = s = 0 proofs verify (the reference tests this edge,
    `manta-pay/src/test/transfer.rs:113-285`)."""
    com_setup = CC.R1CS(fr, mode="setup")
    build_mul_circuit(com_setup)
    matrices, _ = com_setup.finalize()
    pk, vk = G.setup(PR.BN254_PAIRING, matrices, seed=1)
    com = CC.R1CS(fr, mode="prove")
    build_mul_circuit(com, 3, 5, 15)
    _, assignment = com.finalize()
    proof = G.prove(pk, matrices, assignment)
    assert G.verify(vk, proof, [15])


def test_to_bits_le_canonical_only(fr, rng):
    """Full-width decompositions must reject the non-canonical (x + p)
    representation (ark FpVar::to_bits_le enforce_in_field_le parity)."""

    def witness_bits(value_bits):
        com = CC.R1CS(fr, mode="prove")
        x = com.public_input(sum(b << i for i, b in enumerate(value_bits)) % fr.modulus)
        bits = [CC.boolean(com, b) for b in value_bits]
        acc = com.constant(0)
        for i, b in enumerate(bits):
            acc = com.add(acc, com.scale(b, 1 << i))
        com.assert_eq(acc, x)
        CC.enforce_bits_le_constant(com, bits, fr.modulus - 1)
        matrices, assignment = com.finalize()
        return matrices.is_satisfied(assignment)

    x = rng.randrange(fr.modulus)
    canonical = [(x >> i) & 1 for i in range(fr.bits + 1)]
    assert witness_bits(canonical)
    # x + p fits in bits+1 bits and is == x mod p, but must be rejected
    noncanonical = [((x + fr.modulus) >> i) & 1 for i in range(fr.bits + 1)]
    assert not witness_bits(noncanonical)


def test_gadget_library(fr, rng):
    """Bit decomposition, conditional select/swap, Merkle path gadget —
    native vs R1CS consistency."""
    spec = grain.poseidon_spec(fr, 3)
    p = fr.modulus

    # merkle path of height 4 built on host
    leaf = rng.randrange(p)
    sibs = [rng.randrange(p) for _ in range(4)]
    bits = [rng.randrange(2) for _ in range(4)]
    node = leaf
    for b, s in zip(bits, sibs):
        node = (
            grain.poseidon_hash(spec, [s, node])
            if b
            else grain.poseidon_hash(spec, [node, s])
        )

    com = CC.R1CS(fr, mode="prove")
    leaf_v = com.secret_witness(leaf)
    bit_vs = [CC.boolean(com, b) for b in bits]
    sib_vs = [com.secret_witness(s) for s in sibs]
    root_v = CC.merkle_path_root(com, spec, leaf_v, bit_vs, sib_vs)
    com.assert_eq(root_v, com.public_input(node))
    matrices, assignment = com.finalize()
    assert matrices.is_satisfied(assignment)

    # range check
    com2 = CC.R1CS(fr, mode="prove")
    v = com2.secret_witness(12345)
    CC.to_bits_le(com2, v, 16)
    m2, a2 = com2.finalize()
    assert m2.is_satisfied(a2)
    with pytest.raises(AssertionError):
        com3 = CC.R1CS(fr, mode="prove")
        v3 = com3.secret_witness(1 << 20)
        CC.to_bits_le(com3, v3, 16)


def test_msm_device_skips_none_points(rng):
    """Regression: None query points (zero polynomials) must not contribute
    even when their scalar is nonzero (bug caught by TPU device prove)."""
    from manta_tpu.models.groth16 import _msm_device
    from manta_tpu.utils import hostmath

    curve = hostmath.TOY_G1
    g = curve.generator
    pts = [g, None, curve.scalar_mul(5, g), None]
    scalars = [3, 999, 7, 123]
    expected = curve.msm([3, 7], [g, curve.scalar_mul(5, g)])
    assert _msm_device(curve, scalars, pts) == expected
