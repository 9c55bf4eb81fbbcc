"""Outgoing-note parity: AES-GCM spent-asset records next to nullifiers.

Reference: `protocol.rs:1330-1344` (Hybrid(DH, OutAes) outgoing note inside
FullNullifier), `config/utxo.rs:1511-1517` (48-byte plaintext), and
`crypto/encryption/aes.rs:64` (the fixed nonce is the literal
"random nonce", shared with the light incoming note).
"""

from manta_tpu.protocol import config as CFG
from manta_tpu.protocol import keys as K
from manta_tpu.protocol import notes as N


def _cfg():
    return CFG.test_config()


def test_outgoing_note_roundtrip():
    cfg = _cfg()
    sk = 12345
    context = K.AuthorizationContext(
        proof_authorization_key=K.proof_authorization_key(cfg, sk)
    )
    rk = context.compute_receiving_key(cfg)
    vk = context.compute_viewing_key(cfg)
    asset = N.Asset(id=7, value=123456789)
    note = N.encrypt_outgoing(cfg, rk, 31337, asset)
    assert len(note.ciphertext) == 64  # 48 plaintext + 16 tag
    assert N.decrypt_outgoing(cfg, vk, note) == asset
    # wrong key fails authentication
    assert N.decrypt_outgoing(cfg, vk + 1, note) is None


def test_aes_nonce_is_reference_literal():
    assert N._AES_NONCE == b"random nonce"
    assert len(N._AES_NONCE) == 12


def test_sender_posts_carry_outgoing_notes():
    """make_sender attaches a note the spender's viewing key can open."""
    import random

    from manta_tpu.protocol import merkle as MK
    from manta_tpu.protocol import transfer as TX
    from manta_tpu.protocol import utxo as U

    cfg = _cfg()
    rng = random.Random(4)
    sk = 99
    context = K.AuthorizationContext(
        proof_authorization_key=K.proof_authorization_key(cfg, sk)
    )
    rk = context.compute_receiving_key(cfg)
    vk = context.compute_viewing_key(cfg)
    forest = MK.MerkleForest(cfg)
    asset = N.Asset(id=3, value=55)
    pt = N.IncomingPlaintext(
        utxo_commitment_randomness=rng.randrange(cfg.field.modulus),
        asset=asset,
    )
    secret = U.SpendSecret(
        outgoing_ephemeral_secret_key=777, plaintext=pt
    )
    utxo = secret.utxo(cfg, rk)
    item = U.item_hash(cfg, utxo)
    proof = forest.insert_item(item)
    sender = TX.make_sender(
        cfg, context, pt, forest, proof.shard, proof.index, outgoing_esk=777
    )
    assert sender.outgoing_note is not None
    assert N.decrypt_outgoing(cfg, vk, sender.outgoing_note) == asset
