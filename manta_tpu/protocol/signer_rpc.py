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


class _RemoteLedgerAdapter:
    """Gives Signer.sync the `pull` surface over a LedgerClient."""

    def __init__(self, client: RPC.LedgerClient):
        self.client = client

    def pull(self, checkpoint: L.Checkpoint) -> dict:
        return self.client.pull(checkpoint)


class SignerServer:
    def __init__(
        self,
        signer: W.Signer,
        ledger_url: str,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.signer = signer
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
                except KeyError:
                    self._reply(404, {"error": "unknown endpoint"})
                except ValueError as e:
                    self._reply(400, {"error": str(e)})
                except Exception as e:  # noqa: BLE001
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)

    def handle(self, method: str, data: dict) -> dict:
        """Transport-agnostic request dispatch (shared by the HTTP daemon
        and the WebSocket binding, `protocol/websocket.py`)."""
        with self.lock:
            if method == "sync":
                deltas = self.signer.sync(self.ledger)
                return {"deltas": {str(k): v for k, v in deltas.items()}}
            if method == "address":
                return {"address": RPC._point(self.signer.address)}
            if method == "balance":
                return {"balance": self.signer.balance(int(data["asset_id"]))}
            if method == "sign":
                post = self._sign(data)
                return {"post": RPC.encode_post(post)}
            raise KeyError(method)

    def _sign(self, data: dict):
        kind = data["kind"]
        asset = N.Asset(id=int(data["asset_id"]), value=int(data["value"]))
        if kind == "to_private":
            return self.signer.sign_to_private(asset)
        if kind == "private_transfer":
            address = RPC._unpoint(data["address"])
            return self.signer.sign_private_transfer(address, asset)
        if kind == "to_public":
            return self.signer.sign_to_public(asset)
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
    `signer/client/http.rs:44`)."""

    def __init__(self, url: str):
        self.url = url.rstrip("/")

    def _call(self, path: str, payload: dict) -> dict:
        from urllib.request import Request, urlopen

        req = Request(
            self.url + path,
            data=json.dumps(payload).encode(),
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

    def sign(self, kind: str, asset: N.Asset, address=None):
        payload = {"kind": kind, "asset_id": asset.id, "value": asset.value}
        if address is not None:
            payload["address"] = RPC._point(address)
        return RPC.decode_post(self._call("/sign", payload)["post"])
