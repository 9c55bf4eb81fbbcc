"""Process-boundary RPC: JSON wire codecs + HTTP ledger/signer services.

The reference exposes the ledger and the signer over HTTP/WebSocket
(`manta-pay/src/simulation/ledger/http/server.rs`,
`manta-pay/src/signer/client/http.rs`); this module provides the same
process boundary with a JSON-over-HTTP wire format:

- Ledger service:  POST /pull  {checkpoint}          -> diff
                   POST /push  {post, sources, sinks} -> ok/error
- Signer service:  POST /sync                          -> balance deltas
                   POST /sign  {kind, ...}             -> posts the transfer

Wire format: field elements as hex strings, points as [x, y] hex pairs,
proofs as compressed point hex (the arkworks-compatible compressed
encodings from `manta_tpu.utils.codec`).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.request import Request, urlopen

from manta_tpu.models import groth16 as G
from manta_tpu.protocol import keys as K
from manta_tpu.protocol import ledger as L
from manta_tpu.protocol import notes as N
from manta_tpu.protocol import transfer as TX
from manta_tpu.protocol import utxo as U
from manta_tpu.utils import codec
from manta_tpu.utils.hostmath import BN254_G1, BN254_G2

# ---------------------------------------------------------------------------
# JSON wire codecs
# ---------------------------------------------------------------------------


def _hx(x: int) -> str:
    return hex(int(x))


def _unhx(s: str) -> int:
    return int(s, 16)


def _point(pt) -> Optional[list]:
    return None if pt is None else [_hx(pt[0]), _hx(pt[1])]


def _unpoint(v) -> Optional[tuple]:
    return None if v is None else (_unhx(v[0]), _unhx(v[1]))


def encode_note(note: N.IncomingNote) -> dict:
    return {
        "epk": _point(note.ephemeral_public_key),
        "tag": _hx(note.tag),
        "ct": [_hx(c) for c in note.ciphertext],
    }


def decode_note(d: dict) -> N.IncomingNote:
    return N.IncomingNote(
        ephemeral_public_key=_unpoint(d["epk"]),
        tag=_unhx(d["tag"]),
        ciphertext=tuple(_unhx(c) for c in d["ct"]),
    )


def encode_utxo(utxo: U.Utxo) -> dict:
    return {
        "transparent": utxo.is_transparent,
        "asset": [_hx(utxo.public_asset.id), _hx(utxo.public_asset.value)],
        "commitment": _hx(utxo.commitment),
    }


def decode_utxo(d: dict) -> U.Utxo:
    return U.Utxo(
        is_transparent=d["transparent"],
        public_asset=N.Asset(id=_unhx(d["asset"][0]), value=_unhx(d["asset"][1])),
        commitment=_unhx(d["commitment"]),
    )


def encode_proof(proof: G.Proof) -> dict:
    return {
        "a": codec.serialize_g1_compressed(proof.a, BN254_G1).hex(),
        "b": codec.serialize_g2_compressed(proof.b, BN254_G2).hex(),
        "c": codec.serialize_g1_compressed(proof.c, BN254_G1).hex(),
    }


def decode_proof(d: dict) -> G.Proof:
    return G.Proof(
        a=codec.deserialize_g1_compressed(bytes.fromhex(d["a"]), BN254_G1),
        b=codec.deserialize_g2_compressed(bytes.fromhex(d["b"]), BN254_G2),
        c=codec.deserialize_g1_compressed(bytes.fromhex(d["c"]), BN254_G1),
    )


def encode_post(post: TX.TransferPost) -> dict:
    return {
        "shape": post.shape,
        "asset_id": None if post.asset_id is None else _hx(post.asset_id),
        "sources": [_hx(v) for v in post.source_values],
        "sinks": [_hx(v) for v in post.sink_values],
        "senders": [
            {
                "root": _hx(s["root"]),
                "nullifier": _hx(s["nullifier"]),
                "outgoing_note": (
                    None
                    if s.get("outgoing_note") is None
                    else {
                        "epk": [
                            _hx(s["outgoing_note"].ephemeral_public_key[0]),
                            _hx(s["outgoing_note"].ephemeral_public_key[1]),
                        ],
                        "ct": s["outgoing_note"].ciphertext.hex(),
                    }
                ),
            }
            for s in post.sender_posts
        ],
        "receivers": [
            {
                "utxo": encode_utxo(r["bundle"].utxo),
                "note": encode_note(r["bundle"].note),
            }
            for r in post.receiver_posts
        ],
        "auth_key": _point(post.authorization_key),
        "signature": (
            None
            if post.signature is None
            else {
                "scalar": _hx(post.signature.scalar),
                "nonce_point": _point(post.signature.nonce_point),
            }
        ),
        "proof": encode_proof(post.proof),
    }


def decode_post(d: dict) -> TX.TransferPost:
    return TX.TransferPost(
        shape=d["shape"],
        asset_id=None if d["asset_id"] is None else _unhx(d["asset_id"]),
        source_values=[_unhx(v) for v in d["sources"]],
        sink_values=[_unhx(v) for v in d["sinks"]],
        sender_posts=[
            {
                "root": _unhx(s["root"]),
                "nullifier": _unhx(s["nullifier"]),
                "outgoing_note": (
                    None
                    if s.get("outgoing_note") is None
                    else N.OutgoingNote(
                        ephemeral_public_key=(
                            _unhx(s["outgoing_note"]["epk"][0]),
                            _unhx(s["outgoing_note"]["epk"][1]),
                        ),
                        ciphertext=bytes.fromhex(s["outgoing_note"]["ct"]),
                    )
                ),
            }
            for s in d["senders"]
        ],
        receiver_posts=[
            {
                "bundle": TX.ReceiverPost(
                    utxo=decode_utxo(r["utxo"]), note=decode_note(r["note"])
                )
            }
            for r in d["receivers"]
        ],
        authorization_key=_unpoint(d["auth_key"]),
        signature=(
            None
            if d["signature"] is None
            else K.Signature(
                scalar=_unhx(d["signature"]["scalar"]),
                nonce_point=_unpoint(d["signature"]["nonce_point"]),
            )
        ),
        proof=decode_proof(d["proof"]),
    )


def encode_checkpoint(cp: L.Checkpoint) -> dict:
    return {"receiver_index": list(cp.receiver_index), "sender_index": cp.sender_index}


def decode_checkpoint(d: dict) -> L.Checkpoint:
    return L.Checkpoint(
        receiver_index=tuple(d["receiver_index"]), sender_index=d["sender_index"]
    )


def encode_pull(diff: dict) -> dict:
    return {
        "receivers": {
            str(shard): [
                {
                    "utxo": encode_utxo(e["utxo"]),
                    "note": encode_note(e["note"]),
                    "item": _hx(e["item"]),
                    "index": e["index"],
                }
                for e in entries
            ]
            for shard, entries in diff["receivers"].items()
        },
        "senders": [_hx(x) for x in diff["senders"]],
        "outgoing_notes": [
            None
            if n is None
            else {
                "epk": [_hx(n.ephemeral_public_key[0]), _hx(n.ephemeral_public_key[1])],
                "ct": n.ciphertext.hex(),
            }
            for n in diff.get("outgoing_notes", [])
        ],
        "checkpoint": encode_checkpoint(diff["checkpoint"]),
    }


def decode_pull(d: dict) -> dict:
    return {
        "receivers": {
            int(shard): [
                {
                    "utxo": decode_utxo(e["utxo"]),
                    "note": decode_note(e["note"]),
                    "item": _unhx(e["item"]),
                    "index": e["index"],
                }
                for e in entries
            ]
            for shard, entries in d["receivers"].items()
        },
        "senders": [_unhx(x) for x in d["senders"]],
        "outgoing_notes": [
            None
            if n is None
            else N.OutgoingNote(
                ephemeral_public_key=(_unhx(n["epk"][0]), _unhx(n["epk"][1])),
                ciphertext=bytes.fromhex(n["ct"]),
            )
            for n in d.get("outgoing_notes", [])
        ],
        "checkpoint": decode_checkpoint(d["checkpoint"]),
    }


# ---------------------------------------------------------------------------
# Ledger HTTP service
# ---------------------------------------------------------------------------


class LedgerServer:
    """Threaded HTTP server wrapping a Ledger (one writer lock)."""

    def __init__(self, ledger: L.Ledger, host: str = "127.0.0.1", port: int = 0):
        self.ledger = ledger
        self.lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                data = json.loads(self.rfile.read(length) or b"{}")
                try:
                    if self.path == "/pull":
                        cp = decode_checkpoint(data["checkpoint"])
                        with outer.lock:
                            diff = outer.ledger.pull(cp)
                        self._reply(200, encode_pull(diff))
                    elif self.path == "/push":
                        post = decode_post(data["post"])
                        with outer.lock:
                            outer.ledger.post(
                                post,
                                source_accounts=data.get("sources") or [],
                                sink_accounts=data.get("sinks") or [],
                            )
                        self._reply(200, {"ok": True})
                    else:
                        self._reply(404, {"error": "unknown endpoint"})
                except L.LedgerError as e:
                    self._reply(400, {"error": str(e)})
                except Exception as e:  # noqa: BLE001
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)

    def start(self):
        self.thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()


class LedgerClient:
    """Remote ledger connection implementing the pull/push surface the
    wallet expects (reference `wallet/ledger.rs` Connection)."""

    def __init__(self, url: str):
        self.url = url.rstrip("/")

    def _call(self, path: str, payload: dict) -> dict:
        req = Request(
            self.url + path,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urlopen(req) as resp:
            return json.loads(resp.read())

    def pull(self, checkpoint: L.Checkpoint) -> dict:
        return decode_pull(self._call("/pull", {"checkpoint": encode_checkpoint(checkpoint)}))

    def push(self, post: TX.TransferPost, sources=None, sinks=None):
        from urllib.error import HTTPError

        try:
            return self._call(
                "/push",
                {
                    "post": encode_post(post),
                    "sources": sources or [],
                    "sinks": sinks or [],
                },
            )
        except HTTPError as e:
            raise L.LedgerError(json.loads(e.read()).get("error", "push failed"))
