"""Wallet/signer state machine + randomized simulation with conservation."""

import pytest

from manta_tpu.protocol import config as CFG
from manta_tpu.protocol import notes as N
from manta_tpu.protocol import simulation as SIM
from manta_tpu.protocol import transfer as TX
from manta_tpu.protocol import wallet as W
from manta_tpu.protocol import ledger as L

import random

CFG_T = CFG.test_config()


@pytest.fixture(scope="module")
def shape_keys():
    return {
        shape: TX.setup_shape(CFG_T, shape, seed=21)
        for shape in ("to_private", "private_transfer", "to_public")
    }


def test_wallet_transfer_between_actors(shape_keys):
    ledger = L.Ledger(CFG_T, shape_keys)
    rng = random.Random(5)
    alice = W.Wallet(
        "alice", W.Signer(CFG_T, shape_keys, 12345, random.Random(1)), ledger
    )
    bob = W.Wallet(
        "bob", W.Signer(CFG_T, shape_keys, 67890, random.Random(2)), ledger
    )
    ledger.deposit("alice", 3, 500)
    alice.to_private(N.Asset(3, 200))
    assert alice.balance(3) == 200
    assert alice.public_balance(3) == 300
    alice.private_transfer(bob.address, N.Asset(3, 120))
    bob.sync()
    assert bob.balance(3) == 120
    assert alice.balance(3) == 80
    bob.to_public(N.Asset(3, 50))
    assert bob.balance(3) == 70
    assert bob.public_balance(3) == 50


def test_simulation_conserves_balance(shape_keys):
    report = SIM.run_simulation(
        num_actors=2,
        num_rounds=5,
        asset_ids=(1,),
        initial_balance=300,
        seed=9,
        cfg=CFG_T,
        shape_keys=shape_keys,
    )
    assert report["conserved"], report
    assert sum(
        v for k, v in report["actions"].items() if k != "skip"
    ) >= 1, "no actions executed"


def test_batched_multi_coin_spend(shape_keys):
    """Spending >2 coins chains an intermediate join-split post
    (reference compute_batched_transactions, functions.rs:748)."""
    ledger = L.Ledger(CFG_T, shape_keys)
    rng = random.Random(17)
    w = W.Wallet(
        "frank", W.Signer(CFG_T, shape_keys, 424242, random.Random(3)), ledger
    )
    ledger.deposit("frank", 6, 300)
    for v in (40, 50, 60):
        w.to_private(N.Asset(6, v))
    assert w.balance(6) == 150
    # needs all three coins -> one join-split + final transfer
    other = W.Wallet(
        "grace", W.Signer(CFG_T, shape_keys, 515151, random.Random(4)), ledger
    )
    w.private_transfer(other.address, N.Asset(6, 140))
    other.sync()
    assert other.balance(6) == 140
    assert w.balance(6) == 10


def test_signer_state_persistence(shape_keys, tmp_path):
    """Save a synced signer, reload into a fresh one, continue spending
    (reference StorageState + encrypted fs)."""
    ledger = L.Ledger(CFG_T, shape_keys)
    w = W.Wallet(
        "heidi", W.Signer(CFG_T, shape_keys, 777777, random.Random(6)), ledger
    )
    ledger.deposit("heidi", 8, 200)
    w.to_private(N.Asset(8, 90))
    path = str(tmp_path / "signer.sealed")
    W.save_signer_state(w.signer, path, b"pw")

    fresh = W.Signer(CFG_T, shape_keys, 777777, random.Random(7))
    assert W.load_signer_state(fresh, path, b"pw")
    assert fresh.balance(8) == 90
    # restored signer can actually spend (proofs verify against the ledger)
    w2 = W.Wallet("heidi", fresh, ledger)
    w2.balances[8] = 90
    w2.to_public(N.Asset(8, 40))
    assert ledger.balance("heidi", 8) == 150
    assert not W.load_signer_state(fresh, path, b"wrong")


def test_identity_proof_and_transaction_data(shape_keys):
    """Address-ownership attestation + note introspection
    (reference identity_proof functions.rs:1331, base.rs:227)."""
    cfg = CFG_T
    signer = W.Signer(cfg, shape_keys, 31337, random.Random(11))
    asset = N.Asset(id=2, value=55)
    ident = 987654321
    proof_post = W.identity_proof(signer, asset, ident)
    assert W.identity_verification(
        cfg, shape_keys, proof_post, asset, ident, signer.address
    )
    # wrong address fails
    other = W.Signer(cfg, shape_keys, 99999, random.Random(12))
    assert not W.identity_verification(
        cfg, shape_keys, proof_post, asset, ident, other.address
    )
    # wrong identifier fails
    assert not W.identity_verification(
        cfg, shape_keys, proof_post, asset, ident + 1, signer.address
    )

    # transaction_data: a ToPrivate to the signer is decryptable by it
    ledger = L.Ledger(cfg, shape_keys)
    ledger.deposit("ivan", 2, 100)
    post = TX.build_to_private(
        cfg, shape_keys["to_private"], signer.address, N.Asset(2, 60),
        esk=1234567, randomness=42,
    )
    data = W.transaction_data(signer, post)
    assert len(data) == 1 and data[0][0].asset == N.Asset(2, 60)
    assert W.transaction_data(other, post) == []


def test_consolidate(shape_keys):
    """N owned coins -> 1 via chained join-splits
    (reference `wallet/signer/functions.rs:1303`)."""
    ledger = L.Ledger(CFG_T, shape_keys)
    wallet = W.Wallet(
        "ivy", W.Signer(CFG_T, shape_keys, 898989, random.Random(8)), ledger
    )
    ledger.deposit("ivy", 4, 500)
    for v in (40, 30, 20, 10):
        wallet.to_private(N.Asset(4, v))
    assert wallet.balance(4) == 100
    unspent = [c for c in wallet.signer.coins if not c.spent]
    assert len(unspent) == 4
    posts = wallet.signer.consolidate(4)
    assert len(posts) == 3  # 4 coins -> 3 join-splits
    for post in posts:
        ledger.post(post)
    wallet.sync()
    assert wallet.balance(4) == 100
    live = [c for c in wallet.signer.coins if not c.spent]
    # one value-100 coin; join-splits also minted zero-value coins
    assert sorted(c.plaintext.asset.value for c in live) in (
        [100],
        [0, 0, 0, 100],
    )
    assert max(c.plaintext.asset.value for c in live) == 100
    # and the consolidated coin is spendable
    wallet.to_public(N.Asset(4, 100))
    assert wallet.balance(4) == 0
    assert wallet.public_balance(4) == 500


def test_initial_sync_fresh_signer(shape_keys):
    """Fresh-key recovery from genesis without trial decryption
    (reference `functions.rs:1464`)."""
    ledger = L.Ledger(CFG_T, shape_keys)
    old = W.Wallet(
        "judy", W.Signer(CFG_T, shape_keys, 161616, random.Random(9)), ledger
    )
    ledger.deposit("judy", 5, 300)
    old.to_private(N.Asset(5, 150))
    old.to_private(N.Asset(5, 50))
    # a brand-new key fast-syncs the accumulator without decrypting
    fresh = W.Signer(CFG_T, shape_keys, 262626, random.Random(10))
    fresh.initial_sync(ledger)
    assert fresh.checkpoint == ledger.pull(fresh.checkpoint)["checkpoint"]
    assert not fresh.coins
    # the fresh signer can now receive and spend against the synced forest
    fw = W.Wallet("kate", fresh, ledger)
    old.private_transfer(fw.address, N.Asset(5, 120))
    fw.sync()
    assert fw.balance(5) == 120
    fw.to_public(N.Asset(5, 100))
    assert fw.public_balance(5) == 100
    # initial_sync on a signer with history is a typed error
    with pytest.raises(W.InconsistencyError):
        fresh.initial_sync(ledger)


def test_wallet_desync_detection(shape_keys):
    """A wallet whose balance book diverged from the ledger raises a typed
    InconsistencyError and recovers (reference `wallet/mod.rs:725`)."""
    ledger = L.Ledger(CFG_T, shape_keys)
    wallet = W.Wallet(
        "liam", W.Signer(CFG_T, shape_keys, 737373, random.Random(13)), ledger
    )
    ledger.deposit("liam", 6, 200)
    wallet.to_private(N.Asset(6, 100))
    assert wallet.balance(6) == 100
    # corrupt the wallet's balance book (simulates missed sync / bad restore)
    wallet.balances[6] = 10
    posts = wallet.signer.sign_to_public(N.Asset(6, 60))
    for post in posts:
        ledger.post(post, sink_accounts=["liam"])
    with pytest.raises(W.InconsistencyError):
        wallet.sync()
    wallet.recover()
    assert wallet.balance(6) == 40


def test_nullifier_map_indexed(shape_keys):
    """Spent detection is O(1) per nullifier via the indexed map
    (reference `signer/nullifier_map.rs`)."""
    ledger = L.Ledger(CFG_T, shape_keys)
    wallet = W.Wallet(
        "mona", W.Signer(CFG_T, shape_keys, 848484, random.Random(14)), ledger
    )
    ledger.deposit("mona", 7, 100)
    wallet.to_private(N.Asset(7, 80))
    signer = wallet.signer
    assert set(signer.nullifier_map) == {c.nullifier for c in signer.coins}
    wallet.to_public(N.Asset(7, 30))
    assert set(signer.nullifier_map) == {c.nullifier for c in signer.coins}
    spent = [c for c in signer.coins if c.spent]
    assert spent and all(
        signer.nullifier_map[c.nullifier] is c for c in spent
    )
