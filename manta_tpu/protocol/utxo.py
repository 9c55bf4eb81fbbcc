"""UTXO model: commitments, item hashes, nullifiers, mint/spend secrets.

Native (host) implementation of the reference's UTXO protocol v1
(`manta-accounting/src/transfer/utxo/protocol.rs`); the in-circuit twin
lives in `manta_tpu.protocol.circuits` and the two are tested for
equivalence (the ECLAIR property).
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Tuple

from manta_tpu.protocol import config as CFG
from manta_tpu.protocol import keys as K
from manta_tpu.protocol.notes import (
    Asset,
    IncomingNote,
    IncomingPlaintext,
    encrypt_incoming,
)
from manta_tpu.utils import grain


@dataclasses.dataclass(frozen=True)
class Utxo:
    is_transparent: bool
    public_asset: Asset
    commitment: int


def utxo_commitment(
    cfg: CFG.MantaPayConfig, randomness: int, asset: Asset, receiving_key
) -> int:
    """Poseidon-5(randomness, id, value, rk.x, rk.y)
    (reference `config/utxo.rs:375-393`)."""
    return grain.poseidon_hash(
        cfg.utxo_commitment,
        [randomness, asset.id, asset.value, receiving_key[0], receiving_key[1]],
    )


def item_hash(cfg: CFG.MantaPayConfig, utxo: Utxo) -> int:
    """Poseidon-4(is_transparent, public id, public value, commitment)
    (reference `config/utxo.rs:1157-1167`)."""
    return grain.poseidon_hash(
        cfg.item_hash,
        [
            int(utxo.is_transparent),
            utxo.public_asset.id,
            utxo.public_asset.value,
            utxo.commitment,
        ],
    )


def nullifier_commitment(cfg: CFG.MantaPayConfig, pak, item: int) -> int:
    """Poseidon-3(pak.x, pak.y, item) (reference `config/utxo.rs:1471-1485`)."""
    return grain.poseidon_hash(cfg.nullifier_commitment, [pak[0], pak[1], item])


def shard_index(cfg: CFG.MantaPayConfig, item: int) -> int:
    """Blake2s-1byte forest shard of an accumulator item
    (reference `config/utxo.rs:1319-1337`)."""
    h = hashlib.blake2s(digest_size=1)
    h.update(b"manta-v1.0.0/merkle-tree-shard-function")
    h.update(item.to_bytes(32, "little"))
    return h.digest()[0] % cfg.forest_width


@dataclasses.dataclass
class MintSecret:
    """Receiver-side secret data (reference `protocol.rs:1990-2098`)."""

    receiving_key: Tuple[int, int]
    ephemeral_secret_key: int  # incoming randomness (KEM part)
    plaintext: IncomingPlaintext

    def utxo(
        self,
        cfg: CFG.MantaPayConfig,
        transparent: bool = False,
        public_asset: Asset | None = None,
    ) -> Utxo:
        """Transparent UTXOs carry the real asset publicly and an *empty*
        plaintext asset (reference `protocol.rs:69-114` Visibility:
        secret() is the asset for opaque coins, public() for transparent)."""
        commitment = utxo_commitment(
            cfg,
            self.plaintext.utxo_commitment_randomness,
            self.plaintext.asset,
            self.receiving_key,
        )
        if transparent:
            assert self.plaintext.asset.is_empty()
        return Utxo(
            is_transparent=transparent,
            public_asset=(public_asset or Asset(0, 0)) if transparent else Asset(0, 0),
            commitment=commitment,
        )

    def incoming_note(self, cfg: CFG.MantaPayConfig) -> IncomingNote:
        return encrypt_incoming(
            cfg, self.receiving_key, self.ephemeral_secret_key, self.plaintext
        )


@dataclasses.dataclass
class SpendSecret:
    """Sender-side secret data (reference `protocol.rs:2478-2618`)."""

    outgoing_ephemeral_secret_key: int
    plaintext: IncomingPlaintext

    def utxo(self, cfg: CFG.MantaPayConfig, receiving_key) -> Utxo:
        commitment = utxo_commitment(
            cfg,
            self.plaintext.utxo_commitment_randomness,
            self.plaintext.asset,
            receiving_key,
        )
        return Utxo(
            is_transparent=self.plaintext.asset.is_empty(),
            public_asset=(
                self.plaintext.asset
                if self.plaintext.asset.is_empty()
                else Asset(0, 0)
            ),
            commitment=commitment,
        )

    def nullifier(
        self, cfg: CFG.MantaPayConfig, context: K.AuthorizationContext, utxo: Utxo
    ) -> int:
        return nullifier_commitment(
            cfg, context.proof_authorization_key, item_hash(cfg, utxo)
        )
