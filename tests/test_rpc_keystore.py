"""RPC wire codecs + HTTP ledger service + keystore/persistence tests."""


import pytest

from manta_tpu.protocol import config as CFG
from manta_tpu.protocol import keys as K
from manta_tpu.protocol import ledger as L
from manta_tpu.protocol import notes as N
from manta_tpu.protocol import rpc as RPC
from manta_tpu.protocol import transfer as TX
from manta_tpu.utils import keystore as KS

CFG_T = CFG.test_config()


@pytest.fixture(scope="module")
def tp_keys():
    return {"to_private": TX.setup_shape(CFG_T, "to_private", seed=33)}


def _sample_post(rng, keys):
    sk = rng.randrange(1, 1 << 31)
    addr = K.address_from_spending_key(CFG_T, sk)
    return TX.build_to_private(
        CFG_T,
        keys["to_private"],
        addr,
        N.Asset(2, 77),
        esk=rng.randrange(1, 1 << 31),
        randomness=rng.randrange(CFG.FR.modulus),
    )


def test_post_wire_roundtrip(tp_keys, rng):
    post = _sample_post(rng, tp_keys)
    wire = RPC.encode_post(post)
    import json

    decoded = RPC.decode_post(json.loads(json.dumps(wire)))
    assert decoded.shape == post.shape
    assert decoded.proof == post.proof
    assert decoded.receiver_posts[0]["bundle"].utxo == post.receiver_posts[0]["bundle"].utxo
    assert decoded.receiver_posts[0]["bundle"].note == post.receiver_posts[0]["bundle"].note
    # decoded post verifies like the original
    assert TX.verify_post(CFG_T, tp_keys["to_private"], decoded)


def test_ledger_http_service(tp_keys, rng):
    ledger = L.Ledger(CFG_T, tp_keys)
    ledger.deposit("dora", 2, 100)
    server = RPC.LedgerServer(ledger).start()
    try:
        client = RPC.LedgerClient(f"http://127.0.0.1:{server.port}")
        post = _sample_post(rng, tp_keys)
        resp = client.push(post, sources=["dora"])
        assert resp["ok"]
        # replay rejected over the wire
        with pytest.raises(L.LedgerError):
            client.push(post, sources=["dora"])
        diff = client.pull(L.Checkpoint.origin(CFG_T))
        total = sum(len(v) for v in diff["receivers"].values())
        assert total == 1
        assert ledger.balance("dora", 2) == 23
    finally:
        server.stop()


class TestKeystore:
    def test_mnemonic_and_derivation(self):
        secret = KS.KeySecret.generate()
        sk0 = secret.spending_key(0)
        sk1 = secret.spending_key(1)
        assert sk0 != sk1
        assert 0 < sk0 < CFG.EMBEDDED_FR.modulus
        # deterministic
        again = KS.KeySecret(mnemonic=secret.mnemonic)
        assert again.spending_key(0) == sk0

    def test_bip39_seed_known_vector(self):
        # BIP-39 reference vector (Trezor test vectors, entropy 0x00*16)
        seed = KS.seed_from_mnemonic(
            "abandon abandon abandon abandon abandon abandon abandon abandon "
            "abandon abandon abandon about",
            "TREZOR",
        )
        assert (
            seed.hex()
            == "c55257c360c07c72029aebc1b53c05ed0362ada38ead3e3e9efa3708e5349553"
            "1f09a6987599d18264c1e1c92f2cf141630c7a3c4ab7c81b2f001698e7463b04"
        )

    def test_sealed_container_roundtrip(self, tmp_path):
        path = str(tmp_path / "wallet.dat")
        KS.save_sealed(path, b"hunter2", b"secret wallet state")
        assert KS.load_sealed(path, b"hunter2") == b"secret wallet state"
        assert KS.load_sealed(path, b"wrong") is None
        # corrupt the file
        data = bytearray(open(path, "rb").read())
        data[-1] ^= 0xFF
        open(path, "wb").write(bytes(data))
        assert KS.load_sealed(path, b"hunter2") is None
