"""Wallet + signer state machines.

The client stack of the reference (`manta-accounting/src/wallet/`):

- `Signer`: the stateful prover service — holds the spending key, account
  state, the partial UTXO accumulator (provable paths only for owned coins),
  processes ledger diffs (`sync`), selects coins and builds proofs
  (`sign`), mirroring `wallet/signer/functions.rs`:
    * sync_with: trial-decrypt every new note with the viewing key, insert
      item hashes into the forest (keeping provability only for owned
      coins), drop coins whose nullifiers appear spent (`functions.rs:210`).
    * sign: coin selection (`functions.rs:490`), zero-coin padding, post
      construction for each transaction kind (`functions.rs:1058-1303`).
- `Wallet`: balance-tracking frontend gluing a ledger connection and a
  signer together (`wallet/mod.rs:85`), with sync/post flows.

This implementation keeps the signer and ledger in-process (the reference's
HTTP/WebSocket RPC wrapping is a thin layer over the same Connection
surface).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

from manta_tpu.protocol import asset as A
from manta_tpu.protocol import circuits as TC
from manta_tpu.protocol import config as CFG
from manta_tpu.protocol import keys as K
from manta_tpu.protocol import ledger as L
from manta_tpu.protocol import merkle as MK
from manta_tpu.protocol import notes as N
from manta_tpu.protocol import transfer as TX
from manta_tpu.protocol import utxo as U


@dataclasses.dataclass
class OwnedCoin:
    plaintext: N.IncomingPlaintext
    shard: int
    index: int
    nullifier: int
    spent: bool = False


class InconsistencyError(Exception):
    """Ledger/signer state desynchronization (reference `wallet/mod.rs:725`):
    the ledger's answer contradicts locally tracked state. Recoverable by
    `Wallet.recover()` (reset balances + full resync), mirroring the
    reference's documented recovery procedure."""

    def __init__(self, kind: str, detail: str = ""):
        super().__init__(f"{kind}: {detail}" if detail else kind)
        self.kind = kind


class Signer:
    """Stateful prover: owns the spending key and the synced accumulator."""

    def __init__(
        self,
        cfg: CFG.MantaPayConfig,
        shape_keys: Dict[str, TX.ShapeKeys],
        spending_key: int,
        rng,
        backend: str = "host",
    ):
        self.cfg = cfg
        self.shape_keys = shape_keys
        self.sk = spending_key
        self.rng = rng
        self.backend = backend
        self.context = K.AuthorizationContext(
            proof_authorization_key=K.proof_authorization_key(cfg, spending_key)
        )
        self.viewing_key = self.context.compute_viewing_key(cfg)
        self.address = self.context.compute_receiving_key(cfg)
        # pruned accumulator: provable paths only for owned coins
        # (reference `merkle_tree/partial.rs:60`, `functions.rs:147-209`)
        self.forest = MK.MerkleForest(cfg, prune=True)
        self.coins: List[OwnedCoin] = []
        # indexed spent-detection (reference `signer/nullifier_map.rs`):
        # nullifier -> OwnedCoin, O(1) per ledger nullifier instead of a
        # linear scan over all owned coins
        self.nullifier_map: Dict[int, OwnedCoin] = {}
        self.checkpoint = L.Checkpoint.origin(cfg)

    def _track(self, coin: OwnedCoin) -> None:
        self.coins.append(coin)
        self.nullifier_map[coin.nullifier] = coin

    # -- sync (reference functions.rs:210 sync_with) --

    def sync(self, ledger: L.Ledger) -> Dict[int, int]:
        """Pull the ledger diff, trial-decrypt, update state.
        Returns balance deltas per asset id."""
        diff = ledger.pull(self.checkpoint)
        deltas: Dict[int, int] = {}
        for shard, entries in sorted(diff["receivers"].items()):
            tree = self.forest.shard(shard)
            # keep the forest in sync with the global accumulator; entries
            # inserted speculatively while building batched transactions are
            # verified instead of re-inserted. New items append in one
            # device-batched extend (the sync hot loop, functions.rs:210).
            new_items = []
            for e in entries:
                if len(tree) > e["index"]:
                    if tree.leaf_value(e["index"]) != e["item"]:
                        raise InconsistencyError(
                            "accumulator",
                            "speculative forest diverged from ledger",
                        )
                else:
                    if e["index"] != len(tree) + len(new_items):
                        raise InconsistencyError(
                            "accumulator", "shard log out of order"
                        )
                    new_items.append(e["item"])
            tree.extend(new_items, provable=())
            for e in entries:
                pt = N.decrypt_incoming(self.cfg, self.viewing_key, e["note"])
                if pt is None or pt.asset.value == 0:
                    continue
                # confirm the utxo really pays us (commitment check)
                expected = U.utxo_commitment(
                    self.cfg,
                    pt.utxo_commitment_randomness,
                    pt.asset,
                    self.address,
                )
                if expected != e["utxo"].commitment:
                    continue
                nullifier = U.nullifier_commitment(
                    self.cfg,
                    self.context.proof_authorization_key,
                    e["item"],
                )
                tree.mark_provable(e["index"])
                if any(
                    c.shard == shard and c.index == e["index"]
                    for c in self.coins
                ):
                    # already tracked from a speculative (self-built) post
                    continue
                self._track(
                    OwnedCoin(
                        plaintext=pt,
                        shard=shard,
                        index=e["index"],
                        nullifier=nullifier,
                    )
                )
                deltas[pt.asset.id] = deltas.get(pt.asset.id, 0) + pt.asset.value
        # drop everything but owned paths + frontier (functions.rs:147-209)
        self.forest.prune()
        notes = diff.get("outgoing_notes") or [None] * len(diff["senders"])
        for nullifier, out_note in zip(diff["senders"], notes):
            coin = self.nullifier_map.get(nullifier)
            if coin is not None and not coin.spent:
                coin.spent = True
                deltas[coin.plaintext.asset.id] = (
                    deltas.get(coin.plaintext.asset.id, 0)
                    - coin.plaintext.asset.value
                )
            elif coin is None and out_note is not None:
                # spend made by another device holding this key: the
                # outgoing note recovers the withdrawn asset (reference
                # `functions.rs:210` outgoing-note trial decryption)
                asset = N.decrypt_outgoing(
                    self.cfg, self.viewing_key, out_note
                )
                if asset is not None:
                    deltas[asset.id] = deltas.get(asset.id, 0) - asset.value
        self.checkpoint = diff["checkpoint"]
        return deltas

    def initial_sync(self, ledger: L.Ledger) -> None:
        """First sync of a FRESH key (reference `functions.rs:1464`): a key
        created after the ledger's history cannot own any existing coin, so
        skip all trial decryption and just rebuild the accumulator — every
        item inserted non-provable in one device-batched extend per shard,
        then pruned to the frontier."""
        if self.coins or self.checkpoint != L.Checkpoint.origin(self.cfg):
            raise InconsistencyError(
                "initial_sync", "signer already has history"
            )
        diff = ledger.pull(self.checkpoint)
        for shard, entries in sorted(diff["receivers"].items()):
            self.forest.shard(shard).extend([e["item"] for e in entries])
        self.forest.prune()
        self.checkpoint = diff["checkpoint"]

    # -- balances / selection (reference asset.rs selection, functions.rs:490) --

    def balance(self, asset_id: int) -> int:
        return sum(
            c.plaintext.asset.value
            for c in self.coins
            if not c.spent and c.plaintext.asset.id == asset_id
        )

    def asset_map(self) -> A.AssetMap:
        """Unspent coins as a keyed AssetMap ((shard, index) keys —
        reference `asset.rs:690` + `signer/base.rs` UtxoAccumulator keys)."""
        amap = A.AssetMap()
        for c in self.coins:
            if not c.spent:
                amap.insert((c.shard, c.index), c.plaintext.asset)
        return amap

    def select(self, asset_id: int, value: int) -> List[OwnedCoin]:
        """Coin selection via `AssetMap.select` (reference
        `functions.rs:490`); may return more than 2 coins —
        `_spend_parts` consolidates the surplus through intermediate
        join-split PrivateTransfers (`functions.rs:748`)."""
        selection = self.asset_map().select(A.Asset(asset_id, value))
        if selection.is_empty():
            raise ValueError(f"insufficient private balance for asset {asset_id}")
        by_key = {
            (c.shard, c.index): c for c in self.coins if not c.spent
        }
        return [by_key[key] for key in selection.keys]

    # -- internal builders --

    def _small(self) -> int:
        limit = min(1 << self.cfg.scalar_bits, CFG.EMBEDDED_FR.modulus)
        return self.rng.randrange(1, limit)

    def _rand_field(self) -> int:
        return self.rng.randrange(CFG.FR.modulus)

    def _sender_bundle(self, coin: OwnedCoin) -> TC.SenderBundle:
        return TX.make_sender(
            self.cfg,
            self.context,
            coin.plaintext,
            self.forest,
            coin.shard,
            coin.index,
        )

    def _zero_sender(self, asset_id: int) -> TC.SenderBundle:
        pt = N.IncomingPlaintext(
            utxo_commitment_randomness=self._rand_field(),
            asset=N.Asset(id=asset_id, value=0),
        )
        secret = U.SpendSecret(outgoing_ephemeral_secret_key=1, plaintext=pt)
        utxo = secret.utxo(self.cfg, self.address)
        return TC.SenderBundle(
            secret=secret,
            utxo=utxo,
            nullifier=secret.nullifier(self.cfg, self.context, utxo),
            proof=MK.MembershipProof(
                shard=0,
                index=0,
                siblings=[0] * (self.cfg.merkle_height - 1),
            ),
            root=self.forest.root(0),
        )

    def _receiver(self, address, asset: N.Asset) -> TC.ReceiverBundle:
        return TC.make_receiver(
            self.cfg, address, self._small(), self._rand_field(), asset
        )

    # -- sign (reference functions.rs:1058-1303) --

    def sign_to_private(self, asset: N.Asset) -> TX.TransferPost:
        return TX.build_to_private(
            self.cfg,
            self.shape_keys["to_private"],
            self.address,
            asset,
            esk=self._small(),
            randomness=self._rand_field(),
            backend=self.backend,
        )

    def _join_coins(self, asset_id: int, c1: OwnedCoin, c2: OwnedCoin):
        """One intermediate join-split: spend (c1, c2) into a single coin to
        self (+ a zero coin), speculatively inserting the outputs into the
        local forest so the next proof can reference them
        (reference `functions.rs:748` compute_batched_transactions)."""
        from manta_tpu.protocol import utxo as UU

        combined_value = c1.plaintext.asset.value + c2.plaintext.asset.value
        auth = K.Authorization.from_spending_key(self.cfg, self.sk, self._small())
        senders = [self._sender_bundle(c1), self._sender_bundle(c2)]
        combined = self._receiver(self.address, N.Asset(asset_id, combined_value))
        zero = self._receiver(self.address, N.Asset(asset_id, 0))
        post = TX.build_private_transfer(
            self.cfg,
            self.shape_keys["private_transfer"],
            self.sk,
            auth,
            senders,
            [combined, zero],
            nonce=self._small(),
            backend=self.backend,
        )
        c1.spent = c2.spent = True
        # speculative accumulator update (ledger will do the same in order)
        new_coin = None
        for bundle in (combined, zero):
            item = UU.item_hash(self.cfg, bundle.utxo)
            shard = UU.shard_index(self.cfg, item)
            index = self.forest.shard(shard).insert(item)
            if bundle is combined:
                nullifier = UU.nullifier_commitment(
                    self.cfg, self.context.proof_authorization_key, item
                )
                new_coin = OwnedCoin(
                    plaintext=bundle.secret.plaintext,
                    shard=shard,
                    index=index,
                    nullifier=nullifier,
                )
                self._track(new_coin)
        return post, new_coin

    def _spend_parts(
        self, asset_id: int, value: int
    ) -> Tuple[list, K.Authorization, List[TC.SenderBundle], int]:
        coins = self.select(asset_id, value)
        pre_posts = []
        while len(coins) > 2:
            coins.sort(key=lambda c: c.plaintext.asset.value)
            post, joined = self._join_coins(asset_id, coins[0], coins[1])
            pre_posts.append(post)
            coins = coins[2:] + [joined]
        senders = [self._sender_bundle(c) for c in coins]
        if len(senders) == 1:
            senders.append(self._zero_sender(asset_id))
        total = sum(c.plaintext.asset.value for c in coins)
        auth = K.Authorization.from_spending_key(self.cfg, self.sk, self._small())
        return pre_posts, auth, senders, total - value  # change

    def sign_private_transfer(
        self, recipient_address, asset: N.Asset
    ) -> List[TX.TransferPost]:
        pre, auth, senders, change = self._spend_parts(asset.id, asset.value)
        receivers = [
            self._receiver(recipient_address, asset),
            self._receiver(self.address, N.Asset(id=asset.id, value=change)),
        ]
        final = TX.build_private_transfer(
            self.cfg,
            self.shape_keys["private_transfer"],
            self.sk,
            auth,
            senders,
            receivers,
            nonce=self._small(),
            backend=self.backend,
        )
        return pre + [final]

    def sign_to_public(self, asset: N.Asset) -> List[TX.TransferPost]:
        pre, auth, senders, change = self._spend_parts(asset.id, asset.value)
        receiver = self._receiver(self.address, N.Asset(asset.id, change))
        final = TX.build_to_public(
            self.cfg,
            self.shape_keys["to_public"],
            self.sk,
            auth,
            senders,
            receiver,
            asset_id=asset.id,
            sink_value=asset.value,
            nonce=self._small(),
            backend=self.backend,
        )
        return pre + [final]

    def consolidate(
        self, asset_id: int, coins: Optional[List[OwnedCoin]] = None
    ) -> List[TX.TransferPost]:
        """Merge owned coins of one asset into a SINGLE coin to self
        (reference `functions.rs:1303`): chains join-split PrivateTransfers
        (2-in/2-out: merged + zero) until one coin holds the whole balance.
        Returns the posts to submit; the signer tracks the merged outputs
        speculatively, exactly like batched spends."""
        if coins is None:
            coins = [
                c
                for c in self.coins
                if not c.spent and c.plaintext.asset.id == asset_id
            ]
        if any(
            c.spent or c.plaintext.asset.id != asset_id for c in coins
        ):
            raise ValueError("consolidate: coin spent or wrong asset")
        if len(coins) < 2:
            return []
        posts = []
        coins = sorted(coins, key=lambda c: c.plaintext.asset.value)
        while len(coins) > 1:
            post, joined = self._join_coins(asset_id, coins[0], coins[1])
            posts.append(post)
            coins = coins[2:] + [joined]
        return posts


class Wallet:
    """Balance-tracking frontend (reference `wallet/mod.rs:85`)."""

    def __init__(self, name: str, signer: Signer, ledger: L.Ledger):
        self.name = name
        self.signer = signer
        self.ledger = ledger
        self.balances: Dict[int, int] = {}

    @property
    def address(self):
        return self.signer.address

    def sync(self):
        deltas = self.signer.sync(self.ledger)
        for asset_id, delta in deltas.items():
            new = self.balances.get(asset_id, 0) + delta
            if new < 0:
                # the ledger reported spends exceeding tracked balance —
                # wallet and signer/ledger views have diverged
                # (reference `wallet/mod.rs:725` InconsistencyError)
                raise InconsistencyError(
                    "balance",
                    f"asset {asset_id} balance would go negative ({new})",
                )
            self.balances[asset_id] = new

    def recover(self):
        """Reset tracked balances and rebuild from the signer's coin state
        (the reference's documented response to an InconsistencyError)."""
        self.balances = {}
        for coin in self.signer.coins:
            if not coin.spent:
                a = coin.plaintext.asset
                self.balances[a.id] = self.balances.get(a.id, 0) + a.value

    def balance(self, asset_id: int) -> int:
        return self.balances.get(asset_id, 0)

    def public_balance(self, asset_id: int) -> int:
        return self.ledger.balance(self.name, asset_id)

    def to_private(self, asset: N.Asset):
        post = self.signer.sign_to_private(asset)
        self.ledger.post(post, source_accounts=[self.name])
        self.sync()

    def private_transfer(self, recipient_address, asset: N.Asset):
        self.sync()
        for post in self.signer.sign_private_transfer(recipient_address, asset):
            self.ledger.post(post)
        self.sync()

    def to_public(self, asset: N.Asset):
        self.sync()
        for post in self.signer.sign_to_public(asset):
            self.ledger.post(
                post,
                sink_accounts=[self.name] if post.shape == "to_public" else None,
            )
        self.sync()


# ---------------------------------------------------------------------------
# Signer state persistence (reference `StorageState`, `signer/mod.rs:98`,
# encrypted at rest via fs/serde + cocoon)
# ---------------------------------------------------------------------------


def save_signer_state(signer: Signer, path: str, password: bytes) -> None:
    """Snapshot the signer's synced state into a sealed container."""
    import json

    from manta_tpu.utils import keystore as KS

    state = {
        "checkpoint": {
            "receiver_index": list(signer.checkpoint.receiver_index),
            "sender_index": signer.checkpoint.sender_index,
        },
        "coins": [
            {
                "randomness": hex(c.plaintext.utxo_commitment_randomness),
                "asset": [hex(c.plaintext.asset.id), hex(c.plaintext.asset.value)],
                "shard": c.shard,
                "index": c.index,
                "nullifier": hex(c.nullifier),
                "spent": c.spent,
            }
            for c in signer.coins
        ],
        "forest": {
            str(shard): tree.to_state()
            for shard, tree in signer.forest.shards.items()
        },
    }
    KS.save_sealed(path, password, json.dumps(state).encode())


def load_signer_state(signer: Signer, path: str, password: bytes) -> bool:
    """Restore a snapshot into a freshly-constructed signer. Returns False
    on missing file or wrong password."""
    import json

    from manta_tpu.protocol import ledger as LL
    from manta_tpu.protocol import notes as NN
    from manta_tpu.utils import keystore as KS

    raw = KS.load_sealed(path, password)
    if raw is None:
        return False
    state = json.loads(raw)
    signer.checkpoint = LL.Checkpoint(
        receiver_index=tuple(state["checkpoint"]["receiver_index"]),
        sender_index=state["checkpoint"]["sender_index"],
    )
    signer.coins = []
    signer.nullifier_map = {}
    for c in state["coins"]:
        signer._track(
            OwnedCoin(
                plaintext=NN.IncomingPlaintext(
                    utxo_commitment_randomness=int(c["randomness"], 16),
                    asset=NN.Asset(
                        id=int(c["asset"][0], 16), value=int(c["asset"][1], 16)
                    ),
                ),
                shard=c["shard"],
                index=c["index"],
                nullifier=int(c["nullifier"], 16),
                spent=c["spent"],
            )
        )
    for shard_str, tree_state in state["forest"].items():
        signer.forest.shards[int(shard_str)] = MK.ShardTree.from_state(
            signer.cfg, tree_state
        )
    return True


# ---------------------------------------------------------------------------
# Identity proofs + transaction data (reference `functions.rs:1331,1383`,
# `signer/base.rs:227` identity_verification)
# ---------------------------------------------------------------------------


def identity_proof(
    signer: Signer, asset: N.Asset, identifier_randomness: int, nonce: int = 13
) -> TX.TransferPost:
    """Prove control of the signer's address: spend a *virtual* coin
    (reconstructible by the verifier from public data) in a ToPublic whose
    accumulator is a fresh forest containing only that coin. The in-circuit
    commitment check pins the coin's receiving key to the address, so only
    the address's spending key can satisfy the proof."""
    cfg = signer.cfg
    pt = N.IncomingPlaintext(
        utxo_commitment_randomness=identifier_randomness, asset=asset
    )
    secret = U.SpendSecret(outgoing_ephemeral_secret_key=1, plaintext=pt)
    utxo = secret.utxo(cfg, signer.address)
    item = U.item_hash(cfg, utxo)
    virtual_forest = MK.MerkleForest(cfg)
    proof = virtual_forest.insert_item(item)
    sender = TC.SenderBundle(
        secret=secret,
        utxo=utxo,
        nullifier=secret.nullifier(cfg, signer.context, utxo),
        proof=proof,
        root=virtual_forest.root(proof.shard),
    )
    zero = signer._zero_sender(asset.id)
    # the zero sender's escape-hatch root must also come from the virtual
    # accumulator context; any root works since its membership is skipped
    change = signer._receiver(signer.address, N.Asset(asset.id, 0))
    auth = K.Authorization.from_spending_key(cfg, signer.sk, signer._small())
    return TX.build_to_public(
        cfg,
        signer.shape_keys["to_public"],
        signer.sk,
        auth,
        [sender, zero],
        change,
        asset_id=asset.id,
        sink_value=asset.value,
        nonce=nonce,
        backend=signer.backend,
    )


def identity_verification(
    cfg: CFG.MantaPayConfig,
    shape_keys,
    post: TX.TransferPost,
    asset: N.Asset,
    identifier_randomness: int,
    address,
) -> bool:
    """Verify an identity proof against the claimed (asset, identifier,
    address): reconstruct the virtual coin and its accumulator root, check
    the post's sender root matches, then verify proof + signature."""
    if asset.is_empty() or asset.id == 0:
        return False
    commitment = U.utxo_commitment(
        cfg, identifier_randomness, asset, address
    )
    utxo = U.Utxo(
        is_transparent=False, public_asset=N.Asset(0, 0), commitment=commitment
    )
    item = U.item_hash(cfg, utxo)
    virtual_forest = MK.MerkleForest(cfg)
    proof = virtual_forest.insert_item(item)
    expected_root = virtual_forest.root(proof.shard)
    if not post.sender_posts or post.sender_posts[0]["root"] != expected_root:
        return False
    if post.shape != "to_public" or post.sink_values != [asset.value]:
        return False
    return TX.verify_post(cfg, shape_keys["to_public"], post)


def transaction_data(signer: Signer, post: TX.TransferPost):
    """Decrypt the receiver notes of `post` that belong to this signer
    (reference `functions.rs:1383`). Returns (plaintext, utxo) pairs."""
    out = []
    for r in post.receiver_posts:
        bundle = r["bundle"]
        pt = N.decrypt_incoming(signer.cfg, signer.viewing_key, bundle.note)
        if pt is None:
            continue
        expected = U.utxo_commitment(
            signer.cfg,
            pt.utxo_commitment_randomness,
            pt.asset,
            signer.address,
        )
        if expected == bundle.utxo.commitment:
            out.append((pt, bundle.utxo))
    return out
