"""In-memory shielded ledger: validation + state transition.

The analogue of the reference's simulation ledger
(`manta-pay/src/simulation/ledger/mod.rs:131-766`): a Merkle forest of
UTXOs, the spent-nullifier set, public balances, and checkpointed diffs for
wallet sync.

Validation per post (reference `SenderPost::validate` `sender.rs:658`,
`ReceiverPost` checks, `TransferLedger` proof check):
- every sender's accumulator root must be a historically-valid root of its
  shard ("has_matching_utxo_accumulator_output");
- nullifiers must be unspent; receiver UTXOs unregistered;
- the Groth16 proof must verify against the shape's verifying key;
- spend shapes carry a valid Schnorr signature by the randomized
  authorization key over the post body;
- public sources/sinks adjust public balances (sinks require funds).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Set, Tuple

from manta_tpu.protocol import config as CFG
from manta_tpu.protocol import merkle as MK
from manta_tpu.protocol import transfer as TX
from manta_tpu.protocol import utxo as U


@dataclasses.dataclass
class Checkpoint:
    """Per-shard receiver indices + flat sender (nullifier) index
    (reference `config/utxo.rs:2024-2063`)."""

    receiver_index: Tuple[int, ...]
    sender_index: int

    @classmethod
    def origin(cls, cfg: CFG.MantaPayConfig):
        return cls(receiver_index=(0,) * cfg.forest_width, sender_index=0)


class LedgerError(Exception):
    pass


class Ledger:
    def __init__(self, cfg: CFG.MantaPayConfig, shape_keys: Dict[str, TX.ShapeKeys]):
        self.cfg = cfg
        self.shape_keys = shape_keys
        self.forest = MK.MerkleForest(cfg)
        self.valid_roots: Dict[int, Set[int]] = {}  # shard -> historical roots
        self.nullifiers: Set[int] = set()
        self.utxos: Set[int] = set()  # registered utxo commitments
        # per-shard ordered log of (utxo commitment, note) for wallet sync
        self.shard_log: Dict[int, List[dict]] = {}
        self.nullifier_log: List[int] = []
        # spender-readable spent-asset records, parallel to nullifier_log
        # (reference FullNullifier, `protocol.rs:2762`)
        self.outgoing_log: List[object] = []
        self.public_balances: Dict[Tuple[str, int], int] = {}  # (account, id)
        for shard in range(cfg.forest_width):
            self._record_root(shard)

    def _record_root(self, shard: int):
        self.valid_roots.setdefault(shard, set()).add(self.forest.root(shard))

    # -- public balance management --

    def deposit(self, account: str, asset_id: int, value: int):
        key = (account, asset_id)
        self.public_balances[key] = self.public_balances.get(key, 0) + value

    def balance(self, account: str, asset_id: int) -> int:
        return self.public_balances.get((account, asset_id), 0)

    # -- validation + posting --

    def validate(self, post: TX.TransferPost, source_accounts: List[str]) -> None:
        keys = self.shape_keys[post.shape]
        for s in post.sender_posts:
            if s["nullifier"] in self.nullifiers:
                raise LedgerError("nullifier already spent")
            if not any(
                s["root"] in roots for roots in self.valid_roots.values()
            ):
                raise LedgerError("unknown accumulator root")
        for r in post.receiver_posts:
            if r["bundle"].utxo.commitment in self.utxos:
                raise LedgerError("utxo already registered")
        for account, value in zip(source_accounts, post.source_values):
            if self.balance(account, post.asset_id) < value:
                raise LedgerError("insufficient public balance")
        if not TX.verify_post(self.cfg, keys, post):
            raise LedgerError("invalid proof or signature")

    def post(
        self,
        post: TX.TransferPost,
        source_accounts: Optional[List[str]] = None,
        sink_accounts: Optional[List[str]] = None,
    ) -> None:
        source_accounts = source_accounts or []
        sink_accounts = sink_accounts or []
        self.validate(post, source_accounts)
        # apply
        for account, value in zip(source_accounts, post.source_values):
            self.public_balances[(account, post.asset_id)] -= value
        for account, value in zip(sink_accounts, post.sink_values):
            self.deposit(account, post.asset_id, value)
        for s in post.sender_posts:
            self.nullifiers.add(s["nullifier"])
            self.nullifier_log.append(s["nullifier"])
            self.outgoing_log.append(s.get("outgoing_note"))
        for r in post.receiver_posts:
            bundle = r["bundle"]
            utxo = bundle.utxo
            self.utxos.add(utxo.commitment)
            item = U.item_hash(self.cfg, utxo)
            proof = self.forest.insert_item(item)
            self._record_root(proof.shard)
            self.shard_log.setdefault(proof.shard, []).append(
                {
                    "utxo": utxo,
                    "note": bundle.note,
                    "item": item,
                    "index": proof.index,
                }
            )

    # -- wallet sync: checkpointed diffs (reference `ledger/mod.rs:203-227`) --

    def pull(self, checkpoint: Checkpoint) -> dict:
        receivers = {}
        new_indices = list(checkpoint.receiver_index)
        for shard, log in self.shard_log.items():
            start = checkpoint.receiver_index[shard]
            if start < len(log):
                receivers[shard] = log[start:]
                new_indices[shard] = len(log)
        senders = self.nullifier_log[checkpoint.sender_index :]
        outgoing = self.outgoing_log[checkpoint.sender_index :]
        return {
            "receivers": receivers,
            "senders": senders,
            "outgoing_notes": outgoing,
            "checkpoint": Checkpoint(
                receiver_index=tuple(new_indices),
                sender_index=len(self.nullifier_log),
            ),
        }
