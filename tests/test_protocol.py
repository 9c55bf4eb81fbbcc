"""MantaPay protocol tests: keys, notes, accumulator, and the full
transfer lifecycle against the in-memory ledger.

Uses the small test config (shallow trees, 32-bit user scalars) so the
Groth16 host backend proves in seconds; the circuits are identical to the
production config modulo those two size parameters.
"""

import dataclasses

import pytest

from manta_tpu.protocol import circuits as TC
from manta_tpu.protocol import config as CFG
from manta_tpu.protocol import keys as K
from manta_tpu.protocol import ledger as L
from manta_tpu.protocol import merkle as MK
from manta_tpu.protocol import notes as N
from manta_tpu.protocol import transfer as TX
from manta_tpu.protocol import utxo as U

CFG_T = CFG.test_config()


def small(rng):
    return rng.randrange(1, 1 << 31)


class TestKeysAndNotes:
    def test_address_derivation_chain(self, rng):
        cfg = CFG.production()
        sk = rng.randrange(1, CFG.EMBEDDED_FR.modulus)
        addr = K.address_from_spending_key(cfg, sk)
        assert cfg.embedded.is_on_curve(addr)
        pak = K.proof_authorization_key(cfg, sk)
        vk = K.viewing_key(cfg, pak)
        assert K.receiving_key(cfg, vk) == addr
        assert 0 <= K.address_partition(cfg, addr) < 256

    def test_authorization(self, rng):
        cfg = CFG.production()
        sk = rng.randrange(1, CFG.EMBEDDED_FR.modulus)
        rho = rng.randrange(1, CFG.EMBEDDED_FR.modulus)
        auth = K.Authorization.from_spending_key(cfg, sk, rho)
        assert auth.verify(cfg, sk)
        assert not auth.verify(cfg, sk + 1)
        # signing key's public key == rpak
        signing_key = auth.signing_key(sk)
        assert (
            cfg.embedded.scalar_mul(signing_key, cfg.group_generator)
            == auth.proof.randomized_proof_authorization_key
        )

    def test_schnorr(self, rng):
        cfg = CFG.production()
        sk = rng.randrange(1, CFG.EMBEDDED_FR.modulus)
        vk_pt = cfg.embedded.scalar_mul(sk, cfg.group_generator)
        sig = K.schnorr_sign(cfg, sk, rng.randrange(1 << 64), b"hello manta")
        assert K.schnorr_verify(cfg, vk_pt, b"hello manta", sig)
        assert not K.schnorr_verify(cfg, vk_pt, b"hello manda", sig)

    def test_incoming_note_roundtrip(self, rng):
        cfg = CFG.production()
        sk = rng.randrange(1, CFG.EMBEDDED_FR.modulus)
        addr = K.address_from_spending_key(cfg, sk)
        vk = K.viewing_key(cfg, K.proof_authorization_key(cfg, sk))
        pt = N.IncomingPlaintext(
            utxo_commitment_randomness=rng.randrange(CFG.FR.modulus),
            asset=N.Asset(id=3, value=1000),
        )
        note = N.encrypt_incoming(cfg, addr, rng.randrange(1 << 200), pt)
        assert N.decrypt_incoming(cfg, vk, note) == pt
        # wrong viewing key -> tag mismatch
        assert N.decrypt_incoming(cfg, vk + 1, note) is None

    def test_light_note_roundtrip(self, rng):
        cfg = CFG.production()
        sk = rng.randrange(1, CFG.EMBEDDED_FR.modulus)
        addr = K.address_from_spending_key(cfg, sk)
        vk = K.viewing_key(cfg, K.proof_authorization_key(cfg, sk))
        pt = N.IncomingPlaintext(
            utxo_commitment_randomness=rng.randrange(CFG.FR.modulus),
            asset=N.Asset(id=7, value=42),
        )
        note = N.encrypt_light(cfg, addr, rng.randrange(1 << 200), pt)
        assert N.decrypt_light(cfg, vk, note) == pt
        assert N.decrypt_light(cfg, vk + 1, note) is None


class TestMerkleForest:
    def test_insert_and_verify(self, rng):
        forest = MK.MerkleForest(CFG_T)
        items = [rng.randrange(CFG.FR.modulus) for _ in range(10)]
        proofs = [forest.insert_item(x) for x in items]
        for item, proof in zip(items, proofs):
            current = forest.current_proof(item, proof.shard, proof.index)
            assert forest.verify(item, current)
        # tampered item fails
        assert not forest.verify(
            items[0] + 1,
            forest.current_proof(items[0], proofs[0].shard, proofs[0].index),
        )
        bad = forest.current_proof(items[0], proofs[0].shard, proofs[0].index)
        bad_siblings = list(bad.siblings)
        bad_siblings[0] = (bad_siblings[0] + 1) % CFG.FR.modulus
        assert not MK.compute_root(
            CFG_T, items[0], bad.index, bad_siblings
        ) == forest.root(bad.shard)


@pytest.fixture(scope="module")
def shape_keys():
    """Setup for all three shapes on the test config (module-scoped: ~30s)."""
    return {
        shape: TX.setup_shape(CFG_T, shape, seed=11)
        for shape in ("to_private", "private_transfer", "to_public")
    }


class TestTransferLifecycle:
    def test_full_lifecycle(self, shape_keys, rng):
        cfg = CFG_T
        ledger = L.Ledger(cfg, shape_keys)

        # Alice keys (small scalars for the 32-bit test config)
        sk = small(rng)
        addr = K.address_from_spending_key(cfg, sk)
        asset = N.Asset(id=5, value=100)

        # 1. ToPrivate: Alice converts 100 public units into a private UTXO
        ledger.deposit("alice", 5, 150)
        post1 = TX.build_to_private(
            cfg, shape_keys["to_private"], addr, asset,
            esk=small(rng), randomness=rng.randrange(CFG.FR.modulus),
        )
        ledger.post(post1, source_accounts=["alice"])
        assert ledger.balance("alice", 5) == 50

        # second private UTXO so we have two inputs
        asset2 = N.Asset(id=5, value=40)
        post2 = TX.build_to_private(
            cfg, shape_keys["to_private"], addr, asset2,
            esk=small(rng), randomness=rng.randrange(CFG.FR.modulus),
        )
        ledger.post(post2, source_accounts=["alice"])
        assert ledger.balance("alice", 5) == 10

        # 2. PrivateTransfer: Alice sends 110 to Bob, 30 back to herself
        bob_sk = small(rng)
        bob_addr = K.address_from_spending_key(cfg, bob_sk)
        context = K.AuthorizationContext(
            proof_authorization_key=K.proof_authorization_key(cfg, sk)
        )
        rho = small(rng)
        auth = K.Authorization.from_spending_key(cfg, sk, rho)

        # locate Alice's two UTXOs in the forest
        def sender_for(post):
            rp = post.receiver_posts[0]["bundle"]
            # recover the plaintext the way a real wallet does: decrypt the note
            vk = K.viewing_key(cfg, K.proof_authorization_key(cfg, sk))
            pt = N.decrypt_incoming(cfg, vk, rp.note)
            assert pt is not None
            item = U.item_hash(cfg, rp.utxo)
            shard = U.shard_index(cfg, item)
            log = ledger.shard_log[shard]
            index = next(e["index"] for e in log if e["utxo"] == rp.utxo)
            return TX.make_sender(
                cfg, context, pt, ledger.forest, shard, index,
            )

        senders = [sender_for(post1), sender_for(post2)]
        receivers = [
            TC.make_receiver(
                cfg, bob_addr, small(rng), rng.randrange(CFG.FR.modulus),
                N.Asset(id=5, value=110),
            ),
            TC.make_receiver(
                cfg, addr, small(rng), rng.randrange(CFG.FR.modulus),
                N.Asset(id=5, value=30),
            ),
        ]
        post3 = TX.build_private_transfer(
            cfg, shape_keys["private_transfer"], sk, auth, senders, receivers
        )
        ledger.post(post3)

        # double spend must be rejected
        with pytest.raises(L.LedgerError, match="nullifier"):
            ledger.post(post3)

        # 3. Bob decrypts his note via viewing key (wallet sync path)
        bob_vk = K.viewing_key(cfg, K.proof_authorization_key(cfg, bob_sk))
        pulled = ledger.pull(L.Checkpoint.origin(cfg))
        found = []
        for shard, entries in pulled["receivers"].items():
            for e in entries:
                pt = N.decrypt_incoming(cfg, bob_vk, e["note"])
                if pt is not None:
                    found.append(pt)
        assert any(p.asset.value == 110 for p in found)

        # 4. ToPublic: Bob converts 70 back to public funds
        bob_context = K.AuthorizationContext(
            proof_authorization_key=K.proof_authorization_key(cfg, bob_sk)
        )
        bob_auth = K.Authorization.from_spending_key(cfg, bob_sk, small(rng))
        bob_pt = next(p for p in found if p.asset.value == 110)
        bob_item_entry = None
        for shard, entries in ledger.shard_log.items():
            for e in entries:
                if N.decrypt_incoming(cfg, bob_vk, e["note"]) == bob_pt:
                    bob_item_entry = (shard, e["index"])
        bob_sender = TX.make_sender(
            cfg, bob_context, bob_pt, ledger.forest, *bob_item_entry
        )
        # zero-value second sender (the padding pattern for 1-input spends)
        zero_pt = N.IncomingPlaintext(
            utxo_commitment_randomness=rng.randrange(CFG.FR.modulus),
            asset=N.Asset(id=5, value=0),
        )
        zero_secret = U.SpendSecret(
            outgoing_ephemeral_secret_key=1, plaintext=zero_pt
        )
        zero_utxo = zero_secret.utxo(
            cfg, bob_context.compute_receiving_key(cfg)
        )
        zero_sender = TC.SenderBundle(
            secret=zero_secret,
            utxo=zero_utxo,
            nullifier=zero_secret.nullifier(cfg, bob_context, zero_utxo),
            proof=MK.MembershipProof(
                shard=0, index=0,
                siblings=[0] * (cfg.merkle_height - 1),
            ),
            root=ledger.forest.root(0),
        )
        change = TC.make_receiver(
            cfg, bob_addr, small(rng), rng.randrange(CFG.FR.modulus),
            N.Asset(id=5, value=40),
        )
        post4 = TX.build_to_public(
            cfg, shape_keys["to_public"], bob_sk, bob_auth,
            [bob_sender, zero_sender], change, asset_id=5, sink_value=70,
        )
        ledger.post(post4, sink_accounts=["bob"])
        assert ledger.balance("bob", 5) == 70

    def test_tampered_signature_rejected(self, shape_keys, rng):
        """A spend post with a corrupted signature must be rejected."""
        cfg = CFG_T
        ledger = L.Ledger(cfg, shape_keys)
        sk = small(rng)
        addr = K.address_from_spending_key(cfg, sk)
        ledger.deposit("carol", 1, 100)
        post1 = TX.build_to_private(
            cfg, shape_keys["to_private"], addr, N.Asset(id=1, value=60),
            esk=small(rng), randomness=rng.randrange(CFG.FR.modulus),
        )
        ledger.post(post1, source_accounts=["carol"])
        context = K.AuthorizationContext(
            proof_authorization_key=K.proof_authorization_key(cfg, sk)
        )
        auth = K.Authorization.from_spending_key(cfg, sk, small(rng))
        rp = post1.receiver_posts[0]["bundle"]
        vk = K.viewing_key(cfg, K.proof_authorization_key(cfg, sk))
        pt_dec = N.decrypt_incoming(cfg, vk, rp.note)
        item = U.item_hash(cfg, rp.utxo)
        shard = U.shard_index(cfg, item)
        index = ledger.shard_log[shard][-1]["index"]
        sender = TX.make_sender(
            cfg, context, pt_dec, ledger.forest, shard, index
        )
        zero_pt = N.IncomingPlaintext(
            utxo_commitment_randomness=rng.randrange(CFG.FR.modulus),
            asset=N.Asset(id=1, value=0),
        )
        zs = U.SpendSecret(outgoing_ephemeral_secret_key=1, plaintext=zero_pt)
        z_utxo = zs.utxo(cfg, context.compute_receiving_key(cfg))
        zero_sender = TC.SenderBundle(
            secret=zs, utxo=z_utxo,
            nullifier=zs.nullifier(cfg, context, z_utxo),
            proof=MK.MembershipProof(
                shard=0, index=0, siblings=[0] * (cfg.merkle_height - 1)
            ),
            root=ledger.forest.root(0),
        )
        receivers = [
            TC.make_receiver(cfg, addr, small(rng),
                             rng.randrange(CFG.FR.modulus), N.Asset(1, 25)),
            TC.make_receiver(cfg, addr, small(rng),
                             rng.randrange(CFG.FR.modulus), N.Asset(1, 35)),
        ]
        post = TX.build_private_transfer(
            cfg, shape_keys["private_transfer"], sk, auth,
            [sender, zero_sender], receivers,
        )
        post.signature = dataclasses.replace(
            post.signature, scalar=(post.signature.scalar + 1)
        )
        with pytest.raises(L.LedgerError, match="invalid proof or signature"):
            ledger.post(post)


class TestForkedForest:
    def test_fork_merge_discard(self, rng):
        base = MK.MerkleForest(CFG_T)
        items = [rng.randrange(CFG.FR.modulus) for _ in range(4)]
        for x in items[:2]:
            base.insert_item(x)
        base_roots = {s: base.root(s) for s in range(CFG_T.forest_width)}

        fork = MK.ForkedForest(base)
        p = fork.insert_item(items[2])
        # fork sees the new item; trunk unchanged
        assert fork.root(p.shard) != base_roots[p.shard]
        assert base.root(p.shard) == base_roots[p.shard]
        fork.discard()
        fork2 = MK.ForkedForest(base)
        p2 = fork2.insert_item(items[3])
        fork2.merge()
        # after merge the trunk contains the item with the same index
        assert base.shard(p2.shard).leaves[p2.index] == items[3]
        assert base.verify(items[3], base.current_proof(items[3], p2.shard, p2.index))
