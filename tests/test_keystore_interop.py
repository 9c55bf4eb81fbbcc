"""BIP-39 / BIP-32 interoperability (reference `manta-pay/src/key.rs`).

Pins the standard public vectors so reference-derived mnemonics/keys
import and derive identically:

- BIP-39 Trezor vectors: entropy <-> mnemonic over the 2048-word English
  list, and the PBKDF2 seed with passphrase "TREZOR".
- BIP-32 spec test vector 1 (seed 000102...0f): master + hardened-child
  private keys with the "Bitcoin seed" master tag the bip32 crate uses.
"""

import pytest

from manta_tpu.utils import keystore as KS
from manta_tpu.utils.bip39_words import WORDS

# (entropy hex, mnemonic, PBKDF2 seed with passphrase "TREZOR")
TREZOR_VECTORS = [
    (
        "00000000000000000000000000000000",
        "abandon abandon abandon abandon abandon abandon abandon abandon "
        "abandon abandon abandon about",
        "c55257c360c07c72029aebc1b53c05ed0362ada38ead3e3e9efa3708e5349553"
        "1f09a6987599d18264c1e1c92f2cf141630c7a3c4ab7c81b2f001698e7463b04",
    ),
    (
        "7f7f7f7f7f7f7f7f7f7f7f7f7f7f7f7f",
        "legal winner thank year wave sausage worth useful legal winner "
        "thank yellow",
        None,
    ),
    (
        "80808080808080808080808080808080",
        "letter advice cage absurd amount doctor acoustic avoid letter "
        "advice cage above",
        None,
    ),
    (
        "ffffffffffffffffffffffffffffffff",
        "zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo wrong",
        None,
    ),
    (
        "0000000000000000000000000000000000000000000000000000000000000000",
        ("abandon " * 23) + "art",
        None,
    ),
    (
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff",
        ("zoo " * 23) + "vote",
        None,
    ),
    (
        "f30f8c1da665478f49b001d94c5fc452",
        "vessel ladder alter error federal sibling chat ability sun glass "
        "valve picture",
        None,
    ),
    (
        "c0ba5a8e914111210f2bd131f3d5e08d",
        "scheme spot photo card baby mountain device kick cradle pact "
        "join borrow",
        None,
    ),
    (
        "f585c11aec520db57dd353c69554b21a89b20fb0650966fa0a9d6f74fd989d8f",
        "void come effort suffer camp survey warrior heavy shoot primary "
        "clutch crush open amazing screen patrol group space point ten "
        "exist slush involve unfold",
        None,
    ),
]


def test_wordlist_structure():
    assert len(WORDS) == 2048
    assert WORDS == sorted(WORDS)
    assert len({w[:4] for w in WORDS}) == 2048


@pytest.mark.parametrize("ent_hex,phrase,seed_hex", TREZOR_VECTORS)
def test_bip39_encode_decode(ent_hex, phrase, seed_hex):
    entropy = bytes.fromhex(ent_hex)
    assert KS.mnemonic_from_entropy(entropy) == phrase
    assert KS.entropy_from_mnemonic(phrase) == entropy
    if seed_hex:
        assert KS.seed_from_mnemonic(phrase, "TREZOR").hex() == seed_hex


def test_bip39_rejects_bad_phrases():
    good = KS.mnemonic_from_entropy(bytes(16))
    # flipped word breaks the checksum
    words = good.split()
    words[0] = "ability"
    assert KS.entropy_from_mnemonic(" ".join(words)) is None
    # unknown word
    assert KS.entropy_from_mnemonic("notaword " + " ".join(words[1:])) is None
    # wrong length
    assert KS.entropy_from_mnemonic("abandon abandon") is None
    with pytest.raises(ValueError):
        KS.KeySecret.from_phrase(" ".join(words))
    # valid phrase imports
    assert KS.KeySecret.from_phrase(good).mnemonic == good


def test_bip32_vector1():
    """BIP-32 spec test vector 1: seed 000102030405060708090a0b0c0d0e0f."""
    seed = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    key, chain = KS._bip32_master(seed)
    assert key.to_bytes(32, "big").hex() == (
        "e8f32e723decf4051aefac8e2c93c9c5b214313817cdb01a1494b917c8436b35"
    )
    assert chain.hex() == (
        "873dff81c02f525623fd1fe5167eac3a55a049de3d314bb42ee227ffed37d508"
    )
    # m/0'
    child, child_chain = KS._bip32_hardened_child(key, chain, 0)
    assert child.to_bytes(32, "big").hex() == (
        "edb2e14f9ee77d26dd93b4ecede8d16ed408ce149b6cd80b0715a2d911a0afea"
    )
    assert child_chain.hex() == (
        "47fdacbd0f1097043b78c63c20c34ef4ed9a111d980047ad16282c7ae6236141"
    )


def test_spending_key_derivation_shape():
    """End-to-end m/44'/611'/account' derivation: deterministic, distinct
    per account/coin-type, inside the embedded scalar field."""
    from manta_tpu.protocol import config as CFG

    seed = KS.seed_from_mnemonic(KS.mnemonic_from_entropy(bytes(16)))
    k0 = KS.derive_spending_key(seed, 0)
    assert k0 == KS.derive_spending_key(seed, 0)
    assert k0 != KS.derive_spending_key(seed, 1)
    assert k0 != KS.derive_spending_key(seed, 0, KS.CALAMARI_COIN_TYPE)
    assert 0 < k0 < CFG.EMBEDDED_FR.modulus
    # xprv bytes are the BIP-32 private key (big-endian); the spending key
    # reads them little-endian (reference `signer/base.rs:59`)
    xprv = KS.derive_xprv_key(seed, 0)
    assert int.from_bytes(xprv, "little") % CFG.EMBEDDED_FR.modulus == k0


def test_blake3_matches_reference_checkfile():
    """Pure-Python blake3 reproduces the reference repo's own checksums
    (`manta-parameters/data.checkfile`, generated by b3sum) including
    multi-chunk tree paths on the 36KB verifying keys."""
    import os

    from manta_tpu.utils.blake3 import blake3, verify

    assert blake3(b"").hex() == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )
    base = "/root/reference/manta-parameters"
    checkfile = os.path.join(base, "data.checkfile")
    if not os.path.exists(checkfile):
        pytest.skip("reference checkfile not mounted")
    checked = 0
    for line in open(checkfile):
        parts = line.split()
        if len(parts) != 2:
            continue
        data = open(os.path.join(base, parts[1]), "rb").read()
        if data.startswith(b"version https://git-lfs"):
            continue  # LFS stub, checksum refers to the real payload
        assert verify(data, bytes.fromhex(parts[0])), parts[1]
        assert not verify(data + b"x", bytes.fromhex(parts[0]))
        checked += 1
    assert checked >= 20


def test_production_config_checksums_blobs():
    """Loading the production config verifies published blobs via blake3
    (reference `manta-parameters/src/lib.rs:174`)."""
    from manta_tpu.protocol import config as CFG

    blob = CFG._read_published("group-generator.dat")
    if blob is None:
        pytest.skip("published parameters not mounted")
    assert len(blob) == 32
