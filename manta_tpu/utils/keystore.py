"""Hierarchical key management + encrypted wallet persistence.

Covers the reference's key and storage layers:

- BIP-39 mnemonics + BIP-44 paths `m/44'/611'/account'` (CoinType Manta=611,
  Calamari=612 — reference `manta-pay/src/key.rs:53-214`), built on
  PBKDF2-HMAC-SHA512 seed derivation and SLIP-0010-style hardened child
  derivation for a curve-agnostic spending-key scalar.
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

MANTA_COIN_TYPE = 611
CALAMARI_COIN_TYPE = 612

# BIP-39 English wordlist is large; we embed a deterministic derivation that
# maps entropy -> mnemonic-compatible seed without shipping the wordlist:
# `mnemonic_from_entropy` renders entropy as hex-word groups (the seed math
# below is standard BIP-39 PBKDF2 over the mnemonic string, so real BIP-39
# phrases from other wallets also work via `seed_from_mnemonic`).


def generate_entropy(bits: int = 256) -> bytes:
    assert bits in (128, 160, 192, 224, 256)
    return secrets.token_bytes(bits // 8)


def mnemonic_from_entropy(entropy: bytes) -> str:
    """Deterministic textual phrase for entropy (hex groups + checksum word)."""
    checksum = hashlib.sha256(entropy).hexdigest()[:2]
    body = entropy.hex()
    return " ".join(body[i : i + 4] for i in range(0, len(body), 4)) + " " + checksum


def seed_from_mnemonic(mnemonic: str, password: str = "") -> bytes:
    """BIP-39 seed derivation: PBKDF2-HMAC-SHA512, 2048 rounds."""
    return hashlib.pbkdf2_hmac(
        "sha512",
        mnemonic.encode("utf-8"),
        b"mnemonic" + password.encode("utf-8"),
        2048,
        dklen=64,
    )


def _hardened_child(parent_key: bytes, parent_chain: bytes, index: int):
    data = b"\x00" + parent_key + (index | 0x80000000).to_bytes(4, "big")
    h = hmac.new(parent_chain, data, hashlib.sha512).digest()
    return h[:32], h[32:]


def derive_spending_key(
    seed: bytes, account: int = 0, coin_type: int = MANTA_COIN_TYPE
) -> int:
    """m/44'/coin_type'/account' hardened derivation (SLIP-0010 master +
    hardened children), reduced into the embedded scalar field."""
    master = hmac.new(b"manta-tpu seed", seed, hashlib.sha512).digest()
    key, chain = master[:32], master[32:]
    for index in (44, coin_type, account):
        key, chain = _hardened_child(key, chain, index)
    return int.from_bytes(key, "big") % CFG.EMBEDDED_FR.modulus


@dataclasses.dataclass
class KeySecret:
    """Account-level secret (reference `key.rs:140` KeySecret)."""

    mnemonic: str
    password: str = ""

    @classmethod
    def generate(cls) -> "KeySecret":
        return cls(mnemonic=mnemonic_from_entropy(generate_entropy()))

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
