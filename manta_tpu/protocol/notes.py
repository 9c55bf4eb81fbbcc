"""Note encryption: Poseidon-duplex incoming notes + AES-GCM light/outgoing.

Incoming notes (in-circuit verifiable, reference
`manta-pay/src/crypto/poseidon/encryption.rs` + `config/utxo.rs:745-757`):
hybrid KEM-DEM — ephemeral key esk, ephemeral public key [esk]G, shared
secret [esk]rk (encrypt) == [vk]epk (decrypt), then a 1-block fixed duplex
over the Poseidon arity-3 permutation:

    state = initial_state (protocol parameter)
    absorb key block  [shared.x, shared.y, 0]  (add into state[1..], permute)
    absorb plaintext  [utxo_randomness, asset_id, asset_value]:
        ciphertext block = state[1..] AFTER add, then permute
    tag = state[1] after the final permute

Light incoming + outgoing notes: AES-GCM-256 with the reference's fixed
"random nonce" nonce (`crypto/encryption/aes.rs:64`) over an
80-byte plaintext (randomness ‖ id ‖ value LE), key = Blake2s of the shared
point (reference `crypto/encryption/aes.rs`, `config/utxo.rs:760-767`).
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import List, Optional, Tuple

from cryptography.hazmat.primitives.ciphers.aead import AESGCM

from manta_tpu.protocol import config as CFG
from manta_tpu.protocol.keys import _point_unchecked_bytes
from manta_tpu.utils import grain


@dataclasses.dataclass(frozen=True)
class Asset:
    id: int
    value: int

    def is_empty(self) -> bool:
        return self.id == 0 and self.value == 0


@dataclasses.dataclass(frozen=True)
class IncomingPlaintext:
    utxo_commitment_randomness: int
    asset: Asset


@dataclasses.dataclass(frozen=True)
class IncomingNote:
    """Duplex ciphertext + KEM ephemeral public key."""

    ephemeral_public_key: Tuple[int, int]
    tag: int
    ciphertext: Tuple[int, ...]  # one width-1 block (3 elements)


def _duplex_core(cfg: CFG.MantaPayConfig, shared, blocks: List[List[int]]):
    """Runs the duplex: absorb key block, then message blocks.
    Returns (tag, io_blocks) where io_blocks[i] = state slice after add."""
    spec = cfg.incoming_permutation
    p = cfg.field.modulus
    state = list(cfg.incoming_initial_state)
    # setup: key block (padded to width-1 = 3)
    key_block = [shared[0], shared[1], 0]
    for i in range(3):
        state[1 + i] = (state[1 + i] + key_block[i]) % p
    state = grain.poseidon_permute(spec, state)
    outs = []
    for block in blocks:
        for i in range(3):
            state[1 + i] = (state[1 + i] + block[i]) % p
        outs.append(tuple(state[1:4]))
        state = grain.poseidon_permute(spec, state)
    tag = state[1]
    return tag, outs


def encrypt_incoming(
    cfg: CFG.MantaPayConfig,
    receiving_key,
    ephemeral_secret_key: int,
    plaintext: IncomingPlaintext,
) -> IncomingNote:
    epk = cfg.embedded.scalar_mul(ephemeral_secret_key, cfg.group_generator)
    shared = cfg.embedded.scalar_mul(ephemeral_secret_key, receiving_key)
    block = [
        plaintext.utxo_commitment_randomness,
        plaintext.asset.id,
        plaintext.asset.value,
    ]
    tag, outs = _duplex_core(cfg, shared, [block])
    return IncomingNote(ephemeral_public_key=epk, tag=tag, ciphertext=outs[0])


def decrypt_incoming(
    cfg: CFG.MantaPayConfig, viewing_key: int, note: IncomingNote
) -> Optional[IncomingPlaintext]:
    """Trial decryption with tag check (wallet sync hot loop)."""
    p = cfg.field.modulus
    shared = cfg.embedded.scalar_mul(viewing_key, note.ephemeral_public_key)
    spec = cfg.incoming_permutation
    state = list(cfg.incoming_initial_state)
    key_block = [shared[0], shared[1], 0]
    for i in range(3):
        state[1 + i] = (state[1 + i] + key_block[i]) % p
    state = grain.poseidon_permute(spec, state)
    plain = [(note.ciphertext[i] - state[1 + i]) % p for i in range(3)]
    for i in range(3):
        state[1 + i] = note.ciphertext[i]
    state = grain.poseidon_permute(spec, state)
    if state[1] != note.tag:
        return None
    return IncomingPlaintext(
        utxo_commitment_randomness=plain[0],
        asset=Asset(id=plain[1], value=plain[2]),
    )


# -- AES-GCM light/outgoing notes --

#: The reference's fixed nonce is the 12-byte literal "random nonce"
#: (`crypto/encryption/aes.rs:64`), safe because each key is used once.
_AES_NONCE = b"random nonce"


def _aes_key(shared) -> bytes:
    """Reference `config/utxo.rs:907-917` (IncomingAESConverter::as_target):
    Blake2s256 over the COMPRESSED shared point (`Group::to_vec` =
    CanonicalSerialize, `arkworks/algebra.rs:96-104`), untagged."""
    from manta_tpu.utils import codec

    return hashlib.blake2s(
        codec.serialize_edwards_compressed(shared, CFG.EMBEDDED),
        digest_size=32,
    ).digest()


def _plaintext_bytes(plaintext: IncomingPlaintext) -> bytes:
    return (
        plaintext.utxo_commitment_randomness.to_bytes(32, "little")
        + plaintext.asset.id.to_bytes(32, "little")
        + plaintext.asset.value.to_bytes(16, "little")
    )


@dataclasses.dataclass(frozen=True)
class LightNote:
    ephemeral_public_key: Tuple[int, int]
    ciphertext: bytes  # 96 bytes = 80 plaintext + 16 tag


def encrypt_light(
    cfg: CFG.MantaPayConfig,
    receiving_key,
    ephemeral_secret_key: int,
    plaintext: IncomingPlaintext,
) -> LightNote:
    """Fixed-nonce AES-GCM (safe: fresh key per ephemeral secret),
    reference `crypto/encryption/aes.rs:49-66`."""
    epk = cfg.embedded.scalar_mul(ephemeral_secret_key, cfg.group_generator)
    shared = cfg.embedded.scalar_mul(ephemeral_secret_key, receiving_key)
    ct = AESGCM(_aes_key(shared)).encrypt(
        _AES_NONCE, _plaintext_bytes(plaintext), None
    )
    return LightNote(ephemeral_public_key=epk, ciphertext=ct)


def decrypt_light(
    cfg: CFG.MantaPayConfig, viewing_key: int, note: LightNote
) -> Optional[IncomingPlaintext]:
    shared = cfg.embedded.scalar_mul(viewing_key, note.ephemeral_public_key)
    try:
        data = AESGCM(_aes_key(shared)).decrypt(
            _AES_NONCE, note.ciphertext, None
        )
    except Exception:  # noqa: BLE001 — authentication failure
        return None
    return IncomingPlaintext(
        utxo_commitment_randomness=int.from_bytes(data[:32], "little"),
        asset=Asset(
            id=int.from_bytes(data[32:64], "little"),
            value=int.from_bytes(data[64:80], "little"),
        ),
    )


@dataclasses.dataclass(frozen=True)
class OutgoingNote:
    """Spender-readable record of a spent asset, attached to each nullifier.

    Reference: `protocol.rs:1330-1344` builds it via Hybrid(DH, OutAes);
    `config/utxo.rs:1511-1517` fixes the 48-byte plaintext (asset id 32 LE
    ‖ value 16 LE) + 16-byte tag. Key/nonce conventions match the light
    incoming note (Blake2s of the compressed shared point, "random nonce").
    """

    ephemeral_public_key: Tuple[int, int]
    ciphertext: bytes  # 64 bytes = 48 plaintext + 16 tag


def encrypt_outgoing(
    cfg: CFG.MantaPayConfig,
    receiving_key,
    ephemeral_secret_key: int,
    asset: Asset,
) -> OutgoingNote:
    epk = cfg.embedded.scalar_mul(ephemeral_secret_key, cfg.group_generator)
    shared = cfg.embedded.scalar_mul(ephemeral_secret_key, receiving_key)
    pt = asset.id.to_bytes(32, "little") + asset.value.to_bytes(16, "little")
    ct = AESGCM(_aes_key(shared)).encrypt(_AES_NONCE, pt, None)
    return OutgoingNote(ephemeral_public_key=epk, ciphertext=ct)


def decrypt_outgoing(
    cfg: CFG.MantaPayConfig, viewing_key: int, note: OutgoingNote
) -> Optional[Asset]:
    """Trial decryption during sync: recovers the spent asset for
    nullifiers the ledger reports (reference `functions.rs:210`)."""
    shared = cfg.embedded.scalar_mul(viewing_key, note.ephemeral_public_key)
    try:
        data = AESGCM(_aes_key(shared)).decrypt(
            _AES_NONCE, note.ciphertext, None
        )
    except Exception:  # noqa: BLE001 — not our note
        return None
    return Asset(
        id=int.from_bytes(data[:32], "little"),
        value=int.from_bytes(data[32:48], "little"),
    )
