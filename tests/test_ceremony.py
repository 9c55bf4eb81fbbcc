"""Trusted-setup ceremony: phase-1 + phase-2 round-trip producing working keys.

Mirrors the reference's `trusted_setup_phase_two_is_valid`
(`manta-trusted-setup/src/groth16/test/mod.rs:259`): run a small KZG
ceremony, specialize to a circuit, apply δ contributions with verified
transcripts, extract keys, and prove/verify with them.
"""

import copy

import pytest

from manta_tpu import fields
from manta_tpu.ceremony import kzg as KZG
from manta_tpu.ceremony import phase2 as P2
from manta_tpu.ceremony import ratio as R
from manta_tpu.models import circuit as CC
from manta_tpu.models import groth16 as G
from manta_tpu.models import pairing as PR

CFG = PR.BN254_PAIRING
SIZE = 8


def test_ratio_proof_roundtrip(rng):
    scalar = rng.randrange(1, CFG.g1.scalar_field.modulus)
    proof = R.RatioProof.prove(CFG, b"challenge", scalar, nonce=7)
    assert proof.verify(CFG, b"challenge")
    assert not proof.verify(CFG, b"other-challenge")
    # tampered matching point
    bad = R.RatioProof(
        ratio=proof.ratio, matching_point=CFG.g2.double(proof.matching_point)
    )
    assert not bad.verify(CFG, b"challenge")


@pytest.fixture(scope="module")
def ceremony_keys():
    """Phase 1 (2 contributors) -> phase 2 (2 contributors) -> keys."""
    rngvals = [(11, 13, 17), (19, 23, 29)]
    acc = KZG.Accumulator.default(CFG, SIZE)
    transcripts = []
    for i, (t, a, b) in enumerate(rngvals):
        prev = copy.deepcopy(acc)
        contribution = KZG.contribute(acc, t, a, b, nonce=31 + i)
        transcripts.append((prev, copy.deepcopy(acc), contribution))

    # circuit: x * y == z
    fr = fields.BN254_FR
    com = CC.R1CS(fr, mode="setup")
    x = com.secret_witness(None)
    y = com.secret_witness(None)
    z = com.public_input(None)
    com.assert_eq(com.mul(x, y), z)
    matrices, _ = com.finalize()

    state = P2.initialize(acc, matrices)
    p2_transcripts = []
    for i, delta in enumerate((101, 103)):
        prev = copy.deepcopy(state)
        proof = P2.contribute(state, delta, nonce=41 + i)
        p2_transcripts.append((prev, copy.deepcopy(state), proof))

    pk, vk = P2.extract_keys(state)
    return {
        "acc_transcripts": transcripts,
        "p2_transcripts": p2_transcripts,
        "matrices": matrices,
        "pk": pk,
        "vk": vk,
    }


def test_phase1_transcript_verifies(ceremony_keys):
    for prev, nxt, contribution in ceremony_keys["acc_transcripts"]:
        assert KZG.verify_transform(prev, nxt, contribution)


def test_phase1_bad_transform_rejected(ceremony_keys):
    prev, nxt, contribution = ceremony_keys["acc_transcripts"][0]
    tampered = copy.deepcopy(nxt)
    tampered.tau_powers_g1[2] = CFG.g1.double(tampered.tau_powers_g1[2])
    assert not KZG.verify_transform(prev, tampered, contribution)


def test_phase2_transcript_verifies(ceremony_keys):
    for prev, nxt, proof in ceremony_keys["p2_transcripts"]:
        assert P2.verify_transform(prev, nxt, proof)


def test_phase2_bad_transform_rejected(ceremony_keys):
    prev, nxt, proof = ceremony_keys["p2_transcripts"][0]
    tampered = copy.deepcopy(nxt)
    tampered.l_query = [CFG.g1.double(pt) for pt in tampered.l_query]
    assert not P2.verify_transform(prev, tampered, proof)


def test_ceremony_keys_prove_and_verify(ceremony_keys, rng):
    fr = fields.BN254_FR
    x = rng.randrange(fr.modulus)
    y = rng.randrange(fr.modulus)
    z = x * y % fr.modulus
    com = CC.R1CS(fr, mode="prove")
    xv = com.secret_witness(x)
    yv = com.secret_witness(y)
    zv = com.public_input(z)
    com.assert_eq(com.mul(xv, yv), zv)
    _, assignment = com.finalize()
    proof = G.prove(
        ceremony_keys["pk"], ceremony_keys["matrices"], assignment, 3, 5
    )
    assert G.verify(ceremony_keys["vk"], proof, [z])
    assert not G.verify(ceremony_keys["vk"], proof, [(z + 1) % fr.modulus])


class TestPpotFormat:
    """Bellman-format (de)serialization roundtrips incl. flag edge cases."""

    def test_g1_roundtrips(self, rng):
        from manta_tpu.ceremony import ppot as PP

        g = CFG.g1.generator
        for k in (1, 5, rng.randrange(CFG.g1.scalar_field.modulus)):
            pt = CFG.g1.scalar_mul(k, g)
            assert PP.deserialize_g1_uncompressed(PP.serialize_g1_uncompressed(pt)) == pt
            assert PP.deserialize_g1_compressed(PP.serialize_g1_compressed(pt)) == pt
        assert PP.deserialize_g1_uncompressed(PP.serialize_g1_uncompressed(None)) is None
        assert PP.deserialize_g1_compressed(PP.serialize_g1_compressed(None)) is None
        with pytest.raises(PP.PpotFormatError):
            bad = bytearray(PP.serialize_g1_uncompressed(None))
            bad[10] = 1  # infinity flag with nonzero tail
            PP.deserialize_g1_uncompressed(bytes(bad))

    def test_g2_roundtrips(self, rng):
        from manta_tpu.ceremony import ppot as PP

        g = CFG.g2.generator
        for k in (1, 7, rng.randrange(CFG.g2.scalar_field.modulus)):
            pt = CFG.g2.scalar_mul(k, g)
            assert PP.deserialize_g2_uncompressed(PP.serialize_g2_uncompressed(pt)) == pt
            assert PP.deserialize_g2_compressed(PP.serialize_g2_compressed(pt)) == pt
        assert PP.deserialize_g2_uncompressed(PP.serialize_g2_uncompressed(None)) is None

    def test_challenge_roundtrip_and_phase2_seed(self):
        """Write/read a contributed accumulator in the PPoT challenge layout
        and seed phase 2 from the parsed result."""
        import copy

        from manta_tpu.ceremony import ppot as PP

        acc = KZG.Accumulator.default(CFG, 4)
        KZG.contribute(acc, 5, 7, 11, nonce=9)
        blob = PP.write_challenge(acc, prev_hash=b"prev")
        parsed, header, file_hash = PP.read_challenge(blob, 4)
        assert header[:4] == b"prev"
        assert parsed.tau_powers_g1 == acc.tau_powers_g1
        assert parsed.tau_powers_g2 == acc.tau_powers_g2
        assert parsed.beta_g2 == acc.beta_g2
        assert len(file_hash) == 64
        # seed phase 2 from the imported accumulator
        from manta_tpu import fields
        from manta_tpu.models import circuit as CC

        com = CC.R1CS(fields.BN254_FR, mode="setup")
        x = com.secret_witness(None)
        z = com.public_input(None)
        com.assert_eq(com.mul(x, x), z)
        matrices, _ = com.finalize()
        state = P2.initialize(parsed, matrices)
        assert state.domain_size <= 4


def test_kzg_rlc_rejects_tampered_chain(rng):
    """The random-linear-combination `power_pairs` compression must catch a
    single corrupted power anywhere in any chain (`kzg.rs:509-546`)."""
    import random as _random

    acc = KZG.Accumulator.default(CFG, SIZE)
    prev = copy.deepcopy(acc)
    contribution = KZG.contribute(acc, 31, 37, 41, nonce=71)
    det = _random.Random(9)
    assert KZG.verify_transform(prev, acc, contribution, rng=det)

    # corrupt one tau power mid-chain
    bad = copy.deepcopy(acc)
    bad.tau_powers_g1[5] = CFG.g1.double(bad.tau_powers_g1[5])
    assert not KZG.verify_transform(
        prev, bad, contribution, rng=_random.Random(9)
    )
    # corrupt one alpha power
    bad = copy.deepcopy(acc)
    bad.alpha_tau_powers_g1[3] = CFG.g1.add(
        bad.alpha_tau_powers_g1[3], CFG.g1.generator
    )
    assert not KZG.verify_transform(
        prev, bad, contribution, rng=_random.Random(9)
    )
    # corrupt a G2 power
    bad = copy.deepcopy(acc)
    bad.tau_powers_g2[2] = CFG.g2.double(bad.tau_powers_g2[2])
    assert not KZG.verify_transform(
        prev, bad, contribution, rng=_random.Random(9)
    )
    # swap the claimed tau proof for a different scalar's
    bad_contrib = KZG.Contribution(
        tau_proof=R.RatioProof.prove(CFG, b"x", 31, nonce=5),
        alpha_proof=contribution.alpha_proof,
        beta_proof=contribution.beta_proof,
    )
    assert not KZG.verify_transform(
        prev, acc, bad_contrib, rng=_random.Random(9)
    )


def test_kzg_verify_pairing_count_constant(monkeypatch, rng):
    """verify_transform's pairing count must not scale with accumulator
    size (the round-4 implementation did ~4 pairings PER POWER)."""
    import random as _random

    counts = []
    orig = R.same_ratio

    def counting_same_ratio(cfg, a, b):
        counts.append(1)
        return orig(cfg, a, b)

    monkeypatch.setattr(R, "same_ratio", counting_same_ratio)
    for size in (4, 16):
        acc = KZG.Accumulator.default(CFG, size)
        prev = copy.deepcopy(acc)
        contribution = KZG.contribute(acc, 31, 37, 41, nonce=71)
        counts.clear()
        assert KZG.verify_transform(
            prev, acc, contribution, rng=_random.Random(3)
        )
        counts.append(("size", size, len(counts)))
    # both sizes: identical same_ratio call count
    four = [c for c in counts if isinstance(c, tuple)]
    assert len({c[2] for c in four}) <= 1


@pytest.mark.slow
def test_kzg_device_contribute_matches_host():
    """Device-batched `Accumulator::update` == host bignum (kzg.rs:444)."""
    size = 8
    host_acc = KZG.Accumulator.default(CFG, size)
    dev_acc = copy.deepcopy(host_acc)
    KZG.contribute(host_acc, 51, 53, 57, nonce=81, backend="host")
    KZG.contribute(dev_acc, 51, 53, 57, nonce=81, backend="device")
    assert dev_acc.tau_powers_g1 == host_acc.tau_powers_g1
    assert dev_acc.tau_powers_g2 == host_acc.tau_powers_g2
    assert dev_acc.alpha_tau_powers_g1 == host_acc.alpha_tau_powers_g1
    assert dev_acc.beta_tau_powers_g1 == host_acc.beta_tau_powers_g1
    assert dev_acc.beta_g2 == host_acc.beta_g2


@pytest.mark.slow
def test_kzg_scale_2pow10():
    """Contribute + constant-pairing verify at 2^10 G2 powers (CI-scale
    slice of the reference's G2_POWERS = 2^17, `config/ppot.rs:698-699`;
    the 2^16 smoke runs on the chip via tools/kzg_chip_smoke.py)."""
    import random as _random
    import time

    size = 1 << 10
    acc = KZG.Accumulator.default(CFG, size)
    prev = copy.deepcopy(acc)
    t0 = time.time()
    contribution = KZG.contribute(acc, 63, 67, 71, nonce=91, backend="device")
    t_contribute = time.time() - t0
    t0 = time.time()
    assert KZG.verify_transform(prev, acc, contribution, rng=_random.Random(5))
    t_verify = time.time() - t0
    print(f"kzg 2^10: contribute {t_contribute:.1f}s verify {t_verify:.1f}s")
    # spot-check two powers against host bignum
    r_mod = CFG.g1.scalar_field.modulus
    assert acc.tau_powers_g1[3] == CFG.g1.scalar_mul(
        pow(63, 3, r_mod), CFG.g1.generator
    )
    assert acc.alpha_tau_powers_g1[2] == CFG.g1.scalar_mul(
        67 * pow(63, 2, r_mod) % r_mod, CFG.g1.generator
    )
