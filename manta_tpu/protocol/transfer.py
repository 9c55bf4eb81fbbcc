"""Transfer post construction: the `Transfer::into_post` pipeline.

Builds sender/receiver bundles, runs the shape circuit in prove mode,
generates the Groth16 proof, and signs spend-shape posts with the
randomized authorization key (reference `transfer/mod.rs:739`,
`utxo/auth.rs:297`).

Posts carry everything a ledger needs to validate without secrets
(reference `TransferPostBody`): shape, public asset data, sender posts
(root + nullifier), receiver posts (utxo + note), proof, and — for spend
shapes — the authorization key and its Schnorr signature over the body.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from manta_tpu.models import circuit as CC
from manta_tpu.models import groth16 as G
from manta_tpu.models import pairing as PR
from manta_tpu.protocol import circuits as TC
from manta_tpu.protocol import config as CFG
from manta_tpu.protocol import keys as K
from manta_tpu.protocol import merkle as MK
from manta_tpu.protocol import notes as N
from manta_tpu.protocol import utxo as U


@dataclasses.dataclass
class ReceiverPost:
    """Public receiver data carried on-chain: the UTXO and its note
    (NEVER the mint secret — reference `ReceiverPost`)."""

    utxo: U.Utxo
    note: N.IncomingNote


def strip_receiver(bundle: TC.ReceiverBundle) -> ReceiverPost:
    return ReceiverPost(utxo=bundle.utxo, note=bundle.note)


@dataclasses.dataclass
class TransferPost:
    shape: str
    asset_id: Optional[int]  # public asset id (ToPrivate / ToPublic)
    source_values: List[int]
    sink_values: List[int]
    sender_posts: List[dict]  # {root, nullifier}
    receiver_posts: List[dict]  # {utxo commitment, note fields}
    authorization_key: Optional[tuple]  # rpak for spend shapes
    signature: Optional[K.Signature]
    proof: G.Proof

    def body_bytes(self) -> bytes:
        """Canonical byte encoding of the signed body (everything except the
        authorization signature)."""
        h_parts: List[bytes] = [self.shape.encode()]

        def add_int(x):
            h_parts.append(int(x).to_bytes(32, "little"))

        add_int(self.asset_id or 0)
        for v in self.source_values + self.sink_values:
            add_int(v)
        for s in self.sender_posts:
            add_int(s["root"])
            add_int(s["nullifier"])
        for r in self.receiver_posts:
            for v in TC.receiver_public_inputs(r["bundle"]):
                add_int(v)
        # proof bytes (compressed G1/G2 host encoding)
        from manta_tpu.utils import codec
        from manta_tpu.utils.hostmath import BN254_G1, BN254_G2

        h_parts.append(codec.serialize_g1_compressed(self.proof.a, BN254_G1))
        h_parts.append(codec.serialize_g2_compressed(self.proof.b, BN254_G2))
        h_parts.append(codec.serialize_g1_compressed(self.proof.c, BN254_G1))
        return b"".join(h_parts)


@dataclasses.dataclass
class ShapeKeys:
    matrices: object
    pk: G.ProvingKey
    vk: G.VerifyingKey


def compile_shape(cfg: CFG.MantaPayConfig, shape: str):
    com = CC.R1CS(cfg.field, mode="setup")
    TC.SHAPES[shape](com, cfg, None)
    matrices, _ = com.finalize()
    return matrices


def setup_shape(cfg: CFG.MantaPayConfig, shape: str, seed: int = 0) -> ShapeKeys:
    matrices = compile_shape(cfg, shape)
    # stable per-shape tweak: Python's str hash is salted per process,
    # which silently made "deterministic" setup keys process-local
    shape_tweak = int.from_bytes(
        __import__("hashlib").sha256(shape.encode()).digest()[:2], "little"
    )
    pk, vk = G.setup(PR.BN254_PAIRING, matrices, seed=seed + shape_tweak)
    return ShapeKeys(matrices=matrices, pk=pk, vk=vk)


def prove_shape(
    cfg: CFG.MantaPayConfig,
    keys: ShapeKeys,
    shape: str,
    data: dict,
    r_rand: int = 0,
    s_rand: int = 0,
    backend: str = "host",
) -> G.Proof:
    com = CC.R1CS(cfg.field, mode="prove")
    TC.SHAPES[shape](com, cfg, data)
    matrices, assignment = com.finalize()
    assert matrices.num_constraints == keys.matrices.num_constraints
    assert matrices.is_satisfied(assignment), "transfer circuit unsatisfied"
    return G.prove(
        keys.pk, keys.matrices, assignment, r_rand, s_rand, backend=backend
    )


def verify_post(
    cfg: CFG.MantaPayConfig, keys: ShapeKeys, post: TransferPost
) -> bool:
    data = _post_to_data(post)
    inputs = TC.public_inputs(post.shape, data)
    if post.shape in ("private_transfer", "to_public"):
        if post.authorization_key is None or post.signature is None:
            return False
        if not K.schnorr_verify(
            cfg, post.authorization_key, post.body_bytes(), post.signature
        ):
            return False
    return G.verify(keys.vk, post.proof, inputs)


def _post_to_data(post: TransferPost) -> dict:
    """Reassemble the circuit-facing public data view from a post."""

    class _AuthView:
        def __init__(self, rpak):
            self.proof = type(
                "P", (), {"randomized_proof_authorization_key": rpak}
            )()

    if post.shape == "to_private":
        return {
            "asset_id": post.asset_id,
            "source_value": post.source_values[0],
            "receiver": post.receiver_posts[0]["bundle"],
        }
    if post.shape == "private_transfer":
        return {
            "authorization": _AuthView(post.authorization_key),
            "senders": [
                TC.SenderBundle(
                    secret=None,
                    utxo=None,
                    nullifier=s["nullifier"],
                    proof=None,
                    root=s["root"],
                )
                for s in post.sender_posts
            ],
            "receivers": [r["bundle"] for r in post.receiver_posts],
        }
    if post.shape == "to_public":
        return {
            "asset_id": post.asset_id,
            "sink_value": post.sink_values[0],
            "authorization": _AuthView(post.authorization_key),
            "senders": [
                TC.SenderBundle(
                    secret=None,
                    utxo=None,
                    nullifier=s["nullifier"],
                    proof=None,
                    root=s["root"],
                )
                for s in post.sender_posts
            ],
            "receiver": post.receiver_posts[0]["bundle"],
        }
    raise ValueError(post.shape)


# ---------------------------------------------------------------------------
# High-level transaction builders
# ---------------------------------------------------------------------------


def build_to_private(
    cfg: CFG.MantaPayConfig,
    keys: ShapeKeys,
    address,
    asset: N.Asset,
    esk: int,
    randomness: int,
    backend: str = "host",
) -> TransferPost:
    receiver = TC.make_receiver(cfg, address, esk, randomness, asset)
    data = {
        "asset_id": asset.id,
        "source_value": asset.value,
        "receiver": receiver,
    }
    proof = prove_shape(cfg, keys, "to_private", data, backend=backend)
    return TransferPost(
        shape="to_private",
        asset_id=asset.id,
        source_values=[asset.value],
        sink_values=[],
        sender_posts=[],
        receiver_posts=[{"bundle": strip_receiver(receiver)}],
        authorization_key=None,
        signature=None,
        proof=proof,
    )


def make_sender(
    cfg: CFG.MantaPayConfig,
    context: K.AuthorizationContext,
    plaintext: N.IncomingPlaintext,
    forest: MK.MerkleForest,
    shard: int,
    index: int,
    outgoing_esk: int = 1,
) -> TC.SenderBundle:
    secret = U.SpendSecret(
        outgoing_ephemeral_secret_key=outgoing_esk, plaintext=plaintext
    )
    rk = context.compute_receiving_key(cfg)
    utxo = secret.utxo(cfg, rk)
    item = U.item_hash(cfg, utxo)
    proof = forest.current_proof(item, shard, index)
    return TC.SenderBundle(
        secret=secret,
        utxo=utxo,
        nullifier=secret.nullifier(cfg, context, utxo),
        proof=proof,
        root=forest.root(shard),
        outgoing_note=N.encrypt_outgoing(
            cfg, rk, outgoing_esk, plaintext.asset
        ),
    )


def _spend_post(
    cfg,
    keys,
    shape,
    data,
    auth: K.Authorization,
    sk: int,
    post_kwargs: dict,
    nonce: int,
    backend: str,
) -> TransferPost:
    proof = prove_shape(cfg, keys, shape, data, backend=backend)
    post = TransferPost(
        shape=shape,
        proof=proof,
        authorization_key=auth.proof.randomized_proof_authorization_key,
        signature=None,
        **post_kwargs,
    )
    signing_key = auth.signing_key(sk)
    post.signature = K.schnorr_sign(cfg, signing_key, nonce, post.body_bytes())
    return post


def build_private_transfer(
    cfg: CFG.MantaPayConfig,
    keys: ShapeKeys,
    sk: int,
    auth: K.Authorization,
    senders: List[TC.SenderBundle],
    receivers: List[TC.ReceiverBundle],
    nonce: int = 7,
    backend: str = "host",
) -> TransferPost:
    data = {"authorization": auth, "senders": senders, "receivers": receivers}
    return _spend_post(
        cfg,
        keys,
        "private_transfer",
        data,
        auth,
        sk,
        dict(
            asset_id=None,
            source_values=[],
            sink_values=[],
            sender_posts=[
                {"root": s.root, "nullifier": s.nullifier,
                 "outgoing_note": s.outgoing_note} for s in senders
            ],
            receiver_posts=[{"bundle": strip_receiver(r)} for r in receivers],
        ),
        nonce,
        backend,
    )


def build_to_public(
    cfg: CFG.MantaPayConfig,
    keys: ShapeKeys,
    sk: int,
    auth: K.Authorization,
    senders: List[TC.SenderBundle],
    receiver: TC.ReceiverBundle,
    asset_id: int,
    sink_value: int,
    nonce: int = 9,
    backend: str = "host",
) -> TransferPost:
    data = {
        "asset_id": asset_id,
        "sink_value": sink_value,
        "authorization": auth,
        "senders": senders,
        "receiver": receiver,
    }
    return _spend_post(
        cfg,
        keys,
        "to_public",
        data,
        auth,
        sk,
        dict(
            asset_id=asset_id,
            source_values=[],
            sink_values=[sink_value],
            sender_posts=[
                {"root": s.root, "nullifier": s.nullifier,
                 "outgoing_note": s.outgoing_note} for s in senders
            ],
            receiver_posts=[{"bundle": strip_receiver(receiver)}],
        ),
        nonce,
        backend,
    )
