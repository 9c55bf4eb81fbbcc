"""Minimal RFC 6455 WebSocket transport + signer client/server bindings.

The reference ships a WebSocket signer client alongside its HTTP one
(`manta-pay/src/signer/client/websocket.rs:40-47`, tokio-tungstenite) so
wallets can hold one persistent duplex connection to the signer daemon.
Python ships no websocket library in this image, so this module carries a
small from-spec RFC 6455 implementation — enough for same-process/LAN
signer traffic: HTTP/1.1 upgrade handshake (Sec-WebSocket-Accept), text
frames with client-side masking, ping/pong, close.

`WsSignerServer` exposes the same JSON request surface as
`signer_rpc.SignerServer` ({method, payload} per message) over one
socket; `WsSignerClient` matches `signer_rpc.SignerClient`'s API.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import socketserver
import struct
import threading
from typing import Optional

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

_OP_TEXT = 0x1
_OP_CLOSE = 0x8
_OP_PING = 0x9
_OP_PONG = 0xA


def _accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("websocket peer closed")
        buf += chunk
    return buf


def send_frame(
    sock: socket.socket, payload: bytes, opcode: int = _OP_TEXT, mask: bool = False
) -> None:
    """One FIN frame. Clients MUST mask (RFC 6455 §5.3); servers must not."""
    header = bytes([0x80 | opcode])
    n = len(payload)
    mask_bit = 0x80 if mask else 0
    if n < 126:
        header += bytes([mask_bit | n])
    elif n < (1 << 16):
        header += bytes([mask_bit | 126]) + struct.pack(">H", n)
    else:
        header += bytes([mask_bit | 127]) + struct.pack(">Q", n)
    if mask:
        key = os.urandom(4)
        masked = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
        sock.sendall(header + key + masked)
    else:
        sock.sendall(header + payload)


def recv_frame(sock: socket.socket):
    """Returns (opcode, payload) of the next FIN frame (fragmentation is
    not used by either side of this module)."""
    b0, b1 = _recv_exact(sock, 2)
    opcode = b0 & 0x0F
    masked = bool(b1 & 0x80)
    n = b1 & 0x7F
    if n == 126:
        n = struct.unpack(">H", _recv_exact(sock, 2))[0]
    elif n == 127:
        n = struct.unpack(">Q", _recv_exact(sock, 8))[0]
    key = _recv_exact(sock, 4) if masked else None
    payload = _recv_exact(sock, n) if n else b""
    if key:
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return opcode, payload


class _WsHandler(socketserver.BaseRequestHandler):
    def handle(self):
        sock = self.request
        # HTTP upgrade handshake
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = sock.recv(4096)
            if not chunk:
                return
            data += chunk
        headers = {}
        for line in data.decode("latin1").split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        key = headers.get("sec-websocket-key")
        if headers.get("upgrade", "").lower() != "websocket" or not key:
            sock.sendall(b"HTTP/1.1 400 Bad Request\r\n\r\n")
            return
        sock.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {_accept_key(key)}\r\n\r\n"
            ).encode()
        )
        while True:
            try:
                opcode, payload = recv_frame(sock)
            except (ConnectionError, OSError):
                return
            if opcode == _OP_CLOSE:
                try:
                    send_frame(sock, payload, _OP_CLOSE)
                finally:
                    return
            if opcode == _OP_PING:
                send_frame(sock, payload, _OP_PONG)
                continue
            if opcode != _OP_TEXT:
                continue
            try:
                req = json.loads(payload)
                reply = self.server.dispatch(req)  # type: ignore[attr-defined]
            except Exception as e:  # noqa: BLE001
                reply = {"error": f"{type(e).__name__}: {e}"}
            send_frame(sock, json.dumps(reply).encode())


class WsSignerServer:
    """Signer daemon over one persistent WebSocket per wallet
    (reference `signer/client/websocket.rs` topology, server side)."""

    def __init__(self, signer, ledger_url: str, host="127.0.0.1", port=0):
        from manta_tpu.protocol import signer_rpc as SR

        self._core = SR.SignerServer(signer, ledger_url)
        outer = self

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

            def dispatch(self, req):
                return outer._dispatch(req)

        self._ws = Server((host, port), _WsHandler)
        self.port = self._ws.server_address[1]
        self.thread = threading.Thread(
            target=self._ws.serve_forever, daemon=True
        )

    def _dispatch(self, req: dict) -> dict:
        method = req.get("method")
        payload = req.get("payload", {})
        return self._core.handle(method, payload)

    def start(self):
        self.thread.start()
        return self

    def stop(self):
        self._ws.shutdown()
        self._ws.server_close()
        try:
            self._core.stop()
        except Exception:  # noqa: BLE001 — core HTTP server may not be started
            pass


class WsSignerClient:
    """Wallet-side signer connection over WebSocket; same surface as
    `signer_rpc.SignerClient` (reference `signer/client/websocket.rs:40`)."""

    def __init__(self, host: str, port: int):
        self.sock = socket.create_connection((host, port))
        key = base64.b64encode(os.urandom(16)).decode()
        self.sock.sendall(
            (
                f"GET / HTTP/1.1\r\nHost: {host}:{port}\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\n"
                "Sec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise ConnectionError("websocket handshake failed")
            data += chunk
        head = data.decode("latin1")
        if "101" not in head.split("\r\n")[0]:
            raise ConnectionError(f"websocket upgrade rejected: {head!r}")
        expected = _accept_key(key)
        assert f"Sec-WebSocket-Accept: {expected}" in head, "bad accept key"
        self._lock = threading.Lock()

    def set_network(self, network) -> None:
        """Scope subsequent requests to one network of a multi-network
        signer (reference `client/network.rs` + `http.rs:65-77`)."""
        self.network = network

    def _call(self, method: str, payload: Optional[dict] = None) -> dict:
        from manta_tpu.protocol import network as NET

        body = NET.wrap_request(payload or {}, getattr(self, "network", None))
        with self._lock:
            send_frame(
                self.sock,
                json.dumps({"method": method, "payload": body}).encode(),
                mask=True,
            )
            while True:
                opcode, data = recv_frame(self.sock)
                if opcode == _OP_TEXT:
                    reply = json.loads(data)
                    if "error" in reply:
                        raise RuntimeError(reply["error"])
                    return reply

    def ping(self) -> bool:
        with self._lock:
            send_frame(self.sock, b"hello", _OP_PING, mask=True)
            opcode, data = recv_frame(self.sock)
            return opcode == _OP_PONG and data == b"hello"

    def close(self):
        try:
            with self._lock:
                send_frame(self.sock, b"", _OP_CLOSE, mask=True)
                recv_frame(self.sock)
        except Exception:  # noqa: BLE001
            pass
        self.sock.close()

    # -- signer surface (mirrors signer_rpc.SignerClient) --

    def sync(self) -> dict:
        from manta_tpu.protocol import rpc as RPC  # noqa: F401 (parity)

        return {
            int(k): v for k, v in self._call("sync")["deltas"].items()
        }

    def address(self):
        from manta_tpu.protocol import rpc as RPC

        return RPC._unpoint(self._call("address")["address"])

    def balance(self, asset_id: int) -> int:
        return self._call("balance", {"asset_id": asset_id})["balance"]

    def sign(self, kind: str, asset, address=None):
        """Full post chain, as the HTTP client (`SignResponse { posts }`)."""
        from manta_tpu.protocol import rpc as RPC

        payload = {"kind": kind, "asset_id": asset.id, "value": asset.value}
        if address is not None:
            payload["address"] = RPC._point(address)
        return [RPC.decode_post(p) for p in self._call("sign", payload)["posts"]]

    def consolidate(self, asset_id: int):
        from manta_tpu.protocol import rpc as RPC

        reply = self._call("consolidate", {"asset_id": asset_id})
        return [RPC.decode_post(p) for p in reply["posts"]]

    def identity_proof(self, asset, identifier_randomness: int):
        from manta_tpu.protocol import rpc as RPC

        reply = self._call(
            "identity_proof",
            {
                "asset_id": asset.id,
                "value": asset.value,
                "identifier_randomness": RPC._hx(identifier_randomness),
            },
        )
        return RPC.decode_post(reply["post"])

    def transaction_data(self, posts):
        from manta_tpu.protocol import rpc as RPC
        from manta_tpu.protocol import signer_rpc as SR

        reply = self._call(
            "transaction_data",
            {"posts": [RPC.encode_post(p) for p in posts]},
        )
        return [SR._decode_tx_data(rows) for rows in reply["transaction_data"]]
