"""Ceremony coordinator (queue/locks/signatures/recovery) + signer RPC e2e."""

import copy
import random
import time

import pytest

from manta_tpu import fields
from manta_tpu.ceremony import coordinator as CO
from manta_tpu.ceremony import kzg as KZG
from manta_tpu.ceremony import phase2 as P2
from manta_tpu.models import circuit as CC
from manta_tpu.models import pairing as PR
from manta_tpu.protocol import config as CFG
from manta_tpu.protocol import ledger as L
from manta_tpu.protocol import notes as N
from manta_tpu.protocol import rpc as RPC
from manta_tpu.protocol import signer_rpc as SR
from manta_tpu.protocol import transfer as TX
from manta_tpu.protocol import wallet as W

CFG_T = CFG.test_config()


class TestSignedMessages:
    def test_roundtrip_and_replay(self):
        sk, pk = CO.generate_keypair()
        sig = CO.sign_message(sk, 1, b"hello")
        assert CO.verify_message(pk, 1, b"hello", sig)
        assert not CO.verify_message(pk, 2, b"hello", sig)  # nonce mismatch
        assert not CO.verify_message(pk, 1, b"evil", sig)

    def test_registry_nonce_monotonicity(self):
        reg = CO.Registry()
        sk, pk = CO.generate_keypair()
        reg.register("alice", pk, priority=1)
        state = _tiny_phase2_state()
        c = CO.Coordinator(state, reg)
        sig = CO.sign_message(sk, 5, b"enqueue")
        assert c._check_signature("alice", 5, b"enqueue", sig.hex())
        # replay with the same nonce is rejected
        assert not c._check_signature("alice", 5, b"enqueue", sig.hex())


def _tiny_phase2_state():
    acc = KZG.Accumulator.default(PR.BN254_PAIRING, 4)
    KZG.contribute(acc, 7, 9, 11, nonce=1)
    fr = fields.BN254_FR
    com = CC.R1CS(fr, mode="setup")
    x = com.secret_witness(None)
    z = com.public_input(None)
    com.assert_eq(com.mul(x, x), z)
    matrices, _ = com.finalize()
    return P2.initialize(acc, matrices)


class TestLockQueue:
    def test_priority_and_expiry(self):
        reg = CO.Registry()
        for name, prio in (("low", 0), ("high", 5)):
            _, pk = CO.generate_keypair()
            reg.register(name, pk, priority=prio)
        q = CO.LockQueue(lock_timeout=0.05)
        q.join(reg, "low")
        q.join(reg, "high")
        assert not q.try_acquire("low")  # high priority goes first
        assert q.try_acquire("high")
        assert q.position("low") == 1
        time.sleep(0.08)
        q.update_expired_lock()
        assert q.holder is None  # lock expired
        assert q.try_acquire("low")


class TestCoordinator:
    def test_round_flow_and_recovery(self, tmp_path):
        reg = CO.Registry()
        _, pk = CO.generate_keypair()
        reg.register("carol", pk, priority=0)
        initial = _tiny_phase2_state()
        c = CO.Coordinator(
            copy.deepcopy(initial), reg, recovery_dir=str(tmp_path)
        )
        c.enqueue("carol")
        state = c.get_state("carol")
        assert state is not None
        new_state = copy.deepcopy(state)
        proof = P2.contribute(new_state, 1234, nonce=3)
        assert c.contribute("carol", new_state, proof)
        assert c.round == 1
        # wrong holder cannot contribute
        assert not c.contribute("mallory", new_state, proof)
        # transcript verification from recovery files
        assert c.verify_full_transcript(initial)
        # server recovery
        c2 = CO.Coordinator.recover(str(tmp_path), reg)
        assert c2.round == 1
        assert c2.state.delta_g1 == c.state.delta_g1


@pytest.fixture(scope="module")
def tp_keys():
    return {"to_private": TX.setup_shape(CFG_T, "to_private", seed=44)}


def test_signer_rpc_end_to_end(tp_keys):
    """wallet -> signer daemon -> ledger daemon, three processes' surfaces."""
    ledger = L.Ledger(CFG_T, tp_keys)
    ledger.deposit("erin", 4, 300)
    ledger_srv = RPC.LedgerServer(ledger).start()
    signer = W.Signer(CFG_T, tp_keys, 55555, random.Random(8))
    signer_srv = SR.SignerServer(
        signer, f"http://127.0.0.1:{ledger_srv.port}"
    ).start()
    try:
        client = SR.SignerClient(f"http://127.0.0.1:{signer_srv.port}")
        addr = client.address()
        assert addr == signer.address
        (post,) = client.sign("to_private", N.Asset(4, 120))
        ledger_client = RPC.LedgerClient(f"http://127.0.0.1:{ledger_srv.port}")
        ledger_client.push(post, sources=["erin"])
        deltas = client.sync()
        assert deltas.get(4) == 120
        assert client.balance(4) == 120
        assert ledger.balance("erin", 4) == 180
    finally:
        signer_srv.stop()
        ledger_srv.stop()


def test_signer_websocket_end_to_end(tp_keys):
    """Same wallet->signer->ledger flow over one persistent WebSocket
    (reference `signer/client/websocket.rs:40-47`)."""
    from manta_tpu.protocol import websocket as WS

    ledger = L.Ledger(CFG_T, tp_keys)
    ledger.deposit("fred", 4, 300)
    ledger_srv = RPC.LedgerServer(ledger).start()
    signer = W.Signer(CFG_T, tp_keys, 66666, random.Random(9))
    ws_srv = WS.WsSignerServer(
        signer, f"http://127.0.0.1:{ledger_srv.port}"
    ).start()
    try:
        client = WS.WsSignerClient("127.0.0.1", ws_srv.port)
        assert client.ping()
        addr = client.address()
        assert addr == signer.address
        (post,) = client.sign("to_private", N.Asset(4, 120))
        ledger_client = RPC.LedgerClient(f"http://127.0.0.1:{ledger_srv.port}")
        ledger_client.push(post, sources=["fred"])
        deltas = client.sync()
        assert deltas.get(4) == 120
        assert client.balance(4) == 120
        # unknown method surfaces as an error, connection stays usable
        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            client._call("nope")
        assert client.balance(4) == 120
        client.close()
    finally:
        ws_srv.stop()
        ledger_srv.stop()


def test_multi_network_signer(tp_keys):
    """One signer daemon serving per-network wallets; requests route by
    their network field (reference `signer/client/network.rs`,
    `client/http.rs:65-77`)."""
    from manta_tpu.protocol import network as NET

    ledger = L.Ledger(CFG_T, tp_keys)
    ledger.deposit("gil", 4, 500)
    srv = RPC.LedgerServer(ledger).start()
    signers = NET.NetworkSpecific(
        dolphin=W.Signer(CFG_T, tp_keys, 11111, random.Random(21)),
        calamari=W.Signer(CFG_T, tp_keys, 22222, random.Random(22)),
    )
    sig_srv = SR.SignerServer(
        signers, f"http://127.0.0.1:{srv.port}"
    ).start()
    try:
        url = f"http://127.0.0.1:{sig_srv.port}"
        dol = SR.SignerClient(url, NET.Network.DOLPHIN)
        cal = SR.SignerClient(url)
        cal.set_network(NET.Network.CALAMARI)
        assert dol.address() == signers[NET.Network.DOLPHIN].address
        assert cal.address() == signers[NET.Network.CALAMARI].address
        assert dol.address() != cal.address()
        # a network with no wallet -> HTTP 400, surfaced as an error
        import urllib.error

        manta = SR.SignerClient(url, NET.Network.MANTA)
        with pytest.raises(urllib.error.HTTPError):
            manta.address()
        # a multi-network daemon rejects network-less requests
        bare = SR.SignerClient(url)
        with pytest.raises(urllib.error.HTTPError):
            bare.address()
        # post a dolphin-side transfer end to end
        (post,) = dol.sign("to_private", N.Asset(4, 60))
        RPC.LedgerClient(f"http://127.0.0.1:{srv.port}").push(
            post, sources=["gil"]
        )
        assert dol.sync().get(4) == 60
        assert cal.sync() in ({}, {4: 0})  # calamari wallet saw nothing
    finally:
        sig_srv.stop()
        srv.stop()


@pytest.fixture(scope="module")
def full_keys():
    return {
        shape: TX.setup_shape(CFG_T, shape, seed=44)
        for shape in ("to_private", "private_transfer", "to_public")
    }


def test_signer_rpc_extended_surface(full_keys):
    """The full reference signer Connection over the wire
    (`wallet/signer/mod.rs:119-158`): sign (spend chains), consolidate,
    transaction_data, sign_with_transaction_data, identity_proof."""
    ledger = L.Ledger(CFG_T, full_keys)
    ledger.deposit("hana", 4, 1000)
    ledger_srv = RPC.LedgerServer(ledger).start()
    signer = W.Signer(CFG_T, full_keys, 77777, random.Random(31))
    recipient = W.Signer(CFG_T, full_keys, 88888, random.Random(32))
    signer_srv = SR.SignerServer(
        signer, f"http://127.0.0.1:{ledger_srv.port}"
    ).start()
    try:
        url = f"http://127.0.0.1:{signer_srv.port}"
        client = SR.SignerClient(url)
        ledger_client = RPC.LedgerClient(f"http://127.0.0.1:{ledger_srv.port}")
        # three coins in, so spends exercise join-split chains
        for value in (100, 150, 250):
            (post,) = client.sign("to_private", N.Asset(4, value))
            ledger_client.push(post, sources=["hana"])
        assert client.sync().get(4) == 500

        # transaction_data: the signer opens its own notes in its posts
        (tp_post,) = client.sign("to_private", N.Asset(4, 60))
        rows = client.transaction_data([tp_post])
        assert len(rows) == 1 and len(rows[0]) == 1
        pt, utxo = rows[0][0]
        assert pt.asset.id == 4 and pt.asset.value == 60
        assert utxo == tp_post.receiver_posts[0]["bundle"].utxo
        ledger_client.push(tp_post, sources=["hana"])
        client.sync()

        # consolidate: many coins -> one, all posts ledger-valid
        posts = client.consolidate(4)
        assert posts, "expected join-split consolidation posts"
        for post in posts:
            ledger_client.push(post)
        assert client.sync() is not None
        assert client.balance(4) == 560
        unspent = [c for c in signer.coins if not c.spent]
        assert len(unspent) == 1 and unspent[0].plaintext.asset.value == 560

        # sign_with_transaction_data on a spend: every post carries the
        # signer-visible note openings (change outputs)
        pairs = client.sign_with_transaction_data(
            "private_transfer", N.Asset(4, 75), address=recipient.address
        )
        assert pairs
        for post, tx_rows in pairs:
            ledger_client.push(post)
            for pt, _ in tx_rows:
                assert pt.asset.id == 4
        # final spend post: the change note (value 560-75) must be visible
        final_rows = pairs[-1][1]
        assert any(pt.asset.value == 560 - 75 for pt, _ in final_rows)

        # identity_proof round-trip through the wire + host verification
        ident_rand = 0xABCDEF
        asset = N.Asset(4, 5)
        proof_post = client.identity_proof(asset, ident_rand)
        assert W.identity_verification(
            CFG_T, full_keys, proof_post, asset, ident_rand, signer.address
        )
        assert not W.identity_verification(
            CFG_T, full_keys, proof_post, asset, ident_rand + 1, signer.address
        )
    finally:
        signer_srv.stop()
        ledger_srv.stop()
