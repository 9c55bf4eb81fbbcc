"""Signer HTTP service: the prover as a standalone process.

Mirrors the reference's signer RPC surface
(`manta-pay/src/signer/{mod,base}.rs` + `signer/client/http.rs`): the
wallet talks to a signer daemon holding the spending key:

    POST /sync     {}                                  -> balance deltas
    POST /sign     {kind, asset_id, value, [address]}  -> transfer post
    POST /address  {}                                  -> receiving address
    POST /balance  {asset_id}                          -> spendable balance

The signer pulls ledger state through a LedgerClient (its own HTTP
connection), so wallet / signer / ledger are three separate processes —
the reference's deployment topology.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from manta_tpu.protocol import ledger as L
from manta_tpu.protocol import notes as N
from manta_tpu.protocol import rpc as RPC
from manta_tpu.protocol import wallet as W
from manta_tpu.protocol.network import NonexistentWallet as NET_ERR


def _encode_tx_data(rows) -> list:
    """(IncomingPlaintext, Utxo) pairs -> wire JSON."""
    return [
        {
            "randomness": RPC._hx(pt.utxo_commitment_randomness),
            "asset_id": RPC._hx(pt.asset.id),
            "value": RPC._hx(pt.asset.value),
            "utxo": RPC.encode_utxo(utxo),
        }
        for pt, utxo in rows
    ]


def _decode_tx_data(rows) -> list:
    from manta_tpu.protocol import utxo as U  # noqa: F401 — type source

    out = []
    for r in rows:
        pt = N.IncomingPlaintext(
            utxo_commitment_randomness=RPC._unhx(r["randomness"]),
            asset=N.Asset(
                id=RPC._unhx(r["asset_id"]), value=RPC._unhx(r["value"])
            ),
        )
        out.append((pt, RPC.decode_utxo(r["utxo"])))
    return out


class _RemoteLedgerAdapter:
    """Gives Signer.sync the `pull` surface over a LedgerClient."""

    def __init__(self, client: RPC.LedgerClient):
        self.client = client

    def pull(self, checkpoint: L.Checkpoint) -> dict:
        return self.client.pull(checkpoint)


class SignerServer:
    """`signer` may be a single `wallet.Signer` (single-network daemon) or
    a `network.NetworkSpecific` of signers — one wallet per network, with
    each request routed by its `network` field (reference
    `signer/client/network.rs`, `client/http.rs:71-77`)."""

    def __init__(
        self,
        signer,
        ledger_url: str,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        from manta_tpu.protocol import network as NET

        self._networks = (
            signer if isinstance(signer, NET.NetworkSpecific) else None
        )
        self.signer = (
            signer
            if self._networks is None
            else next(iter(self._networks.items()))[1]
        )
        self.ledger = _RemoteLedgerAdapter(RPC.LedgerClient(ledger_url))
        self.lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def _reply(self, code, payload):
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
                    self._reply(200, outer.handle(self.path.lstrip("/"), data))
                except NET_ERR as e:
                    self._reply(
                        400, {"error": f"no wallet for network {e.network.value}"}
                    )
                except KeyError:
                    self._reply(404, {"error": "unknown endpoint"})
                except ValueError as e:
                    self._reply(400, {"error": str(e)})
                except Exception as e:  # noqa: BLE001
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)

    def _resolve(self, data: dict) -> W.Signer:
        """Pick the signer for the request's network (multi-network daemon)
        or the sole signer (single-network)."""
        from manta_tpu.protocol import network as NET

        net = NET.unwrap_network(data)
        if self._networks is None:
            return self.signer
        if net is None:
            raise ValueError("multi-network signer requires a network field")
        return self._networks[net]  # raises NonexistentWallet

    def handle(self, method: str, data: dict) -> dict:
        """Transport-agnostic request dispatch (shared by the HTTP daemon
        and the WebSocket binding, `protocol/websocket.py`).

        Wire surface mirrors the reference signer `Connection`
        (`manta-accounting/src/wallet/signer/mod.rs:119-158`): sync,
        address, balance, sign, sign_with_transaction_data,
        transaction_data, identity_proof, consolidate."""
        with self.lock:
            signer = self._resolve(data)
            if method == "sync":
                deltas = signer.sync(self.ledger)
                return {"deltas": {str(k): v for k, v in deltas.items()}}
            if method == "address":
                return {"address": RPC._point(signer.address)}
            if method == "balance":
                return {"balance": signer.balance(int(data["asset_id"]))}
            if method == "sign":
                posts = self._sign(signer, data)
                return {"posts": [RPC.encode_post(p) for p in posts]}
            if method == "sign_with_transaction_data":
                # `SignWithTransactionData` (`signer/mod.rs:151-158`): the
                # posts plus, per post, the note plaintexts the signer can
                # already open (its own change/self outputs)
                posts = self._sign(signer, data)
                return {
                    "posts": [RPC.encode_post(p) for p in posts],
                    "transaction_data": [
                        _encode_tx_data(W.transaction_data(signer, p))
                        for p in posts
                    ],
                }
            if method == "transaction_data":
                # `TransactionData` (`signer/mod.rs:131-138`)
                posts = [RPC.decode_post(p) for p in data["posts"]]
                return {
                    "transaction_data": [
                        _encode_tx_data(W.transaction_data(signer, p))
                        for p in posts
                    ]
                }
            if method == "identity_proof":
                # `IdentityProof` (`signer/mod.rs:139-143`,
                # `signer/base.rs:227` identity_verification)
                asset = N.Asset(
                    id=int(data["asset_id"]), value=int(data["value"])
                )
                post = W.identity_proof(
                    signer,
                    asset,
                    RPC._unhx(data["identifier_randomness"]),
                    nonce=int(data.get("nonce", 13)),
                )
                return {"post": RPC.encode_post(post)}
            if method == "consolidate":
                # `Consolidate` (`signer/mod.rs:144-150`)
                posts = signer.consolidate(int(data["asset_id"]))
                return {"posts": [RPC.encode_post(p) for p in posts]}
            raise KeyError(method)

    def _sign(self, signer: W.Signer, data: dict) -> list:
        """Always returns the full post chain (spends may be preceded by
        join-split ToPrivate posts, reference `functions.rs:748`)."""
        kind = data["kind"]
        asset = N.Asset(id=int(data["asset_id"]), value=int(data["value"]))
        if kind == "to_private":
            return [signer.sign_to_private(asset)]
        if kind == "private_transfer":
            address = RPC._unpoint(data["address"])
            return signer.sign_private_transfer(address, asset)
        if kind == "to_public":
            return signer.sign_to_public(asset)
        raise ValueError(f"unknown sign kind {kind}")

    def start(self):
        self.thread.start()
        return self

    def stop(self):
        # shutdown() blocks on serve_forever's exit handshake — only valid
        # when the serving thread actually started (the WebSocket binding
        # reuses `handle` without ever starting the HTTP daemon)
        if self.thread.is_alive():
            self.httpd.shutdown()
        self.httpd.server_close()


class SignerClient:
    """Wallet-side connection to a remote signer (reference
    `signer/client/http.rs:44`). `set_network` scopes every request to one
    network of a multi-network daemon (`http.rs:65-77`)."""

    def __init__(self, url: str, network=None):
        self.url = url.rstrip("/")
        self.network = network

    def set_network(self, network) -> None:
        self.network = network

    def _call(self, path: str, payload: dict) -> dict:
        from urllib.request import Request, urlopen

        from manta_tpu.protocol import network as NET

        req = Request(
            self.url + path,
            data=json.dumps(NET.wrap_request(payload, self.network)).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urlopen(req) as resp:
            return json.loads(resp.read())

    def sync(self) -> dict:
        return {
            int(k): v for k, v in self._call("/sync", {})["deltas"].items()
        }

    def address(self):
        return RPC._unpoint(self._call("/address", {})["address"])

    def balance(self, asset_id: int) -> int:
        return self._call("/balance", {"asset_id": asset_id})["balance"]

    def _sign_payload(self, kind: str, asset: N.Asset, address=None) -> dict:
        payload = {"kind": kind, "asset_id": asset.id, "value": asset.value}
        if address is not None:
            payload["address"] = RPC._point(address)
        return payload

    def sign(self, kind: str, asset: N.Asset, address=None):
        """Returns the full post chain (reference `SignResponse { posts }`,
        `wallet/signer/mod.rs:726`)."""
        reply = self._call("/sign", self._sign_payload(kind, asset, address))
        return [RPC.decode_post(p) for p in reply["posts"]]

    def sign_with_transaction_data(self, kind: str, asset: N.Asset, address=None):
        """-> list of (post, [(IncomingPlaintext, Utxo), ...]) pairs."""
        reply = self._call(
            "/sign_with_transaction_data",
            self._sign_payload(kind, asset, address),
        )
        posts = [RPC.decode_post(p) for p in reply["posts"]]
        tx_data = [_decode_tx_data(rows) for rows in reply["transaction_data"]]
        return list(zip(posts, tx_data))

    def transaction_data(self, posts):
        reply = self._call(
            "/transaction_data",
            {"posts": [RPC.encode_post(p) for p in posts]},
        )
        return [_decode_tx_data(rows) for rows in reply["transaction_data"]]

    def identity_proof(self, asset: N.Asset, identifier_randomness: int):
        reply = self._call(
            "/identity_proof",
            {
                "asset_id": asset.id,
                "value": asset.value,
                "identifier_randomness": RPC._hx(identifier_randomness),
            },
        )
        return RPC.decode_post(reply["post"])

    def consolidate(self, asset_id: int):
        reply = self._call("/consolidate", {"asset_id": asset_id})
        return [RPC.decode_post(p) for p in reply["posts"]]
