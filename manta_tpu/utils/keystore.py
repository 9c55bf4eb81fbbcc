"""Hierarchical key management + encrypted wallet persistence.

Covers the reference's key and storage layers, INTEROPERABLY:

- BIP-39 mnemonics over the standard 2048-word English list (checksummed
  encode/decode, `manta_tpu.utils.bip39_words`) + PBKDF2-HMAC-SHA512 seed
  derivation (reference `manta-pay/src/key.rs:234` bip0039::Mnemonic).
- BIP-32 secp256k1 hardened derivation over BIP-44 paths
  `m/44'/611'/account'` (CoinType Manta=611, Calamari=612, Testnet=1 —
  reference `key.rs:53-214`, bip32::XPrv with the standard "Bitcoin seed"
  master tag), with the spending key read from the xprv bytes exactly as
  the reference does: little-endian mod the embedded scalar field
  (`signer/base.rs:57-61` from_le_bytes_mod_order).
- Encrypted container for wallet state at rest: ChaCha20-Poly1305 with a
  PBKDF2-SHA256-stretched password key — the reference's vendored `cocoon`
  format family (`forks/cocoon`, used by `manta-accounting/src/fs/`).
"""

from __future__ import annotations

import dataclasses
import hashlib
import hmac
import os
import secrets
from typing import Optional

from cryptography.hazmat.primitives.ciphers.aead import ChaCha20Poly1305

from manta_tpu.protocol import config as CFG
from manta_tpu.utils.bip39_words import INDEX as _BIP39_INDEX
from manta_tpu.utils.bip39_words import WORDS as _BIP39_WORDS

MANTA_COIN_TYPE = 611
CALAMARI_COIN_TYPE = 612
TESTNET_COIN_TYPE = 1

#: secp256k1 group order (BIP-32 scalar arithmetic)
_SECP256K1_N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141


def generate_entropy(bits: int = 128) -> bytes:
    """BIP-39 entropy; the reference samples 16 bytes (`key.rs:252`)."""
    assert bits in (128, 160, 192, 224, 256)
    return secrets.token_bytes(bits // 8)


def mnemonic_from_entropy(entropy: bytes) -> str:
    """Standard BIP-39 encode: entropy || sha256-checksum bits, 11-bit
    words from the English list."""
    ent_bits = len(entropy) * 8
    assert ent_bits in (128, 160, 192, 224, 256)
    cs_bits = ent_bits // 32
    digest = hashlib.sha256(entropy).digest()
    bits = "".join(f"{b:08b}" for b in entropy)
    bits += "".join(f"{b:08b}" for b in digest)[:cs_bits]
    return " ".join(
        _BIP39_WORDS[int(bits[i : i + 11], 2)] for i in range(0, len(bits), 11)
    )


def entropy_from_mnemonic(mnemonic: str) -> Optional[bytes]:
    """Decode + checksum-validate a BIP-39 phrase. None if any word is
    unknown or the checksum fails."""
    words = mnemonic.strip().lower().split()
    if len(words) not in (12, 15, 18, 21, 24):
        return None
    try:
        bits = "".join(f"{_BIP39_INDEX[w]:011b}" for w in words)
    except KeyError:
        return None
    cs_bits = len(bits) // 33
    ent_bits = len(bits) - cs_bits
    entropy = int(bits[:ent_bits], 2).to_bytes(ent_bits // 8, "big")
    return entropy if mnemonic_from_entropy(entropy).split() == words else None


def seed_from_mnemonic(mnemonic: str, password: str = "") -> bytes:
    """BIP-39 seed derivation: PBKDF2-HMAC-SHA512, 2048 rounds."""
    return hashlib.pbkdf2_hmac(
        "sha512",
        mnemonic.encode("utf-8"),
        b"mnemonic" + password.encode("utf-8"),
        2048,
        dklen=64,
    )


def _bip32_master(seed: bytes):
    """BIP-32 master node: HMAC-SHA512 tagged "Bitcoin seed" (the bip32
    crate's tag, hence the reference's — `key.rs:192` XPrv::derive_from_path)."""
    h = hmac.new(b"Bitcoin seed", seed, hashlib.sha512).digest()
    return int.from_bytes(h[:32], "big"), h[32:]


def _bip32_hardened_child(k_par: int, chain: bytes, index: int):
    """BIP-32 CKDpriv for hardened index: I = HMAC(c, 0x00||ser256(k)||ser32(i)),
    k_child = (IL + k) mod n."""
    data = b"\x00" + k_par.to_bytes(32, "big") + (index | 0x80000000).to_bytes(4, "big")
    h = hmac.new(chain, data, hashlib.sha512).digest()
    il = int.from_bytes(h[:32], "big")
    k_child = (il + k_par) % _SECP256K1_N
    # il >= n or k_child == 0 is invalid per BIP-32 (probability ~2^-127);
    # the spec proceeds with the next index — mirrored here
    if il >= _SECP256K1_N or k_child == 0:
        return _bip32_hardened_child(k_par, chain, index + 1)
    return k_child, h[32:]


def derive_xprv_key(
    seed: bytes, account: int = 0, coin_type: int = MANTA_COIN_TYPE
) -> bytes:
    """32-byte private key at m/44'/coin_type'/account' (big-endian, as
    bip32::XPrv::to_bytes returns it)."""
    key, chain = _bip32_master(seed)
    for index in (44, coin_type, account):
        key, chain = _bip32_hardened_child(key, chain, index)
    return key.to_bytes(32, "big")


def derive_spending_key(
    seed: bytes, account: int = 0, coin_type: int = MANTA_COIN_TYPE
) -> int:
    """Reference `signer/base.rs:57-61`: the xprv key bytes interpreted
    LITTLE-endian, reduced mod the embedded scalar field."""
    xprv = derive_xprv_key(seed, account, coin_type)
    return int.from_bytes(xprv, "little") % CFG.EMBEDDED_FR.modulus


@dataclasses.dataclass
class KeySecret:
    """Account-level secret (reference `key.rs:140` KeySecret)."""

    mnemonic: str
    password: str = ""

    @classmethod
    def generate(cls) -> "KeySecret":
        return cls(mnemonic=mnemonic_from_entropy(generate_entropy()))

    @classmethod
    def from_phrase(cls, phrase: str, password: str = "") -> "KeySecret":
        """Import an existing (e.g. reference-derived) BIP-39 phrase;
        raises ValueError on bad words/checksum (`key.rs:240` from_phrase)."""
        if entropy_from_mnemonic(phrase) is None:
            raise ValueError("invalid BIP-39 mnemonic")
        return cls(mnemonic=phrase, password=password)

    def spending_key(self, account: int = 0) -> int:
        return derive_spending_key(
            seed_from_mnemonic(self.mnemonic, self.password), account
        )


# -- encrypted container (cocoon-equivalent) --

_MAGIC = b"MTPU\x01"
_KDF_ITERS = 100_000


def seal(password: bytes, plaintext: bytes) -> bytes:
    """Encrypt with ChaCha20-Poly1305; key = PBKDF2-SHA256(password, salt)."""
    salt = secrets.token_bytes(16)
    nonce = secrets.token_bytes(12)
    key = hashlib.pbkdf2_hmac("sha256", password, salt, _KDF_ITERS, dklen=32)
    ct = ChaCha20Poly1305(key).encrypt(nonce, plaintext, _MAGIC)
    return _MAGIC + salt + nonce + ct


def unseal(password: bytes, data: bytes) -> Optional[bytes]:
    """Decrypt a sealed container; None on wrong password/corruption."""
    if not data.startswith(_MAGIC):
        return None
    salt, nonce, ct = data[5:21], data[21:33], data[33:]
    key = hashlib.pbkdf2_hmac("sha256", password, salt, _KDF_ITERS, dklen=32)
    try:
        return ChaCha20Poly1305(key).decrypt(nonce, ct, _MAGIC)
    except Exception:  # noqa: BLE001 — authentication failure
        return None


def save_sealed(path: str, password: bytes, plaintext: bytes):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(seal(password, plaintext))
    os.replace(tmp, path)


def load_sealed(path: str, password: bytes) -> Optional[bytes]:
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return unseal(password, f.read())
