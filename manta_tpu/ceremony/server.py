"""Networked trusted-setup ceremony: multi-circuit rounds over HTTP.

The reference runs its phase-2 ceremony as a tide HTTP server + reqwest
client loop (`manta-trusted-setup/src/groth16/ceremony/server.rs:60,118`,
`client.rs`), with each round's contribution covering ALL THREE MantaPay
circuits atomically via `Parallel<T>` (`mpc.rs:287`,
`ceremony/config/ppot.rs:887-914`). This module is that stack:

- a compact binary wire codec for `Phase2State` / `RatioProof` (compressed
  arkworks point encoding via `manta_tpu.utils.codec` — the reference's
  CanonicalSerialize analogue),
- `ParallelCoordinator`: lock-queue rounds over N circuits, verifying and
  persisting every circuit's transform per round (recoverable from disk),
- `CeremonyServer` / `CeremonyClient`: HTTP endpoints with ed25519-signed,
  nonce-monotonic requests (`ceremony/signature.rs:91`),
- transcript verification for the `groth16_phase2_verifier` CLI analogue.
"""

from __future__ import annotations

import base64
import json
import os
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

from manta_tpu.ceremony import coordinator as CO
from manta_tpu.ceremony import phase2 as P2
from manta_tpu.ceremony import ratio as RT
from manta_tpu.models import pairing as PR
from manta_tpu.utils import codec


# ---------------------------------------------------------------------------
# Wire codec (CanonicalSerialize analogue over our compressed point formats)
# ---------------------------------------------------------------------------


class _Writer:
    def __init__(self, cfg: PR.PairingConfig):
        self.cfg = cfg
        self.parts: List[bytes] = []

    def u64(self, v: int):
        self.parts.append(struct.pack("<Q", v))

    def g1(self, pt):
        self.parts.append(codec.serialize_g1_compressed(pt, self.cfg.g1))

    def g2(self, pt):
        self.parts.append(codec.serialize_g2_compressed(pt, self.cfg.g2))

    def g1_list(self, pts):
        self.u64(len(pts))
        for pt in pts:
            self.g1(pt)

    def g2_list(self, pts):
        self.u64(len(pts))
        for pt in pts:
            self.g2(pt)

    def bytes_out(self) -> bytes:
        return b"".join(self.parts)


class _Reader:
    def __init__(self, cfg: PR.PairingConfig, data: bytes):
        self.cfg = cfg
        self.data = data
        self.pos = 0
        fq_bytes = (cfg.g1.field.modulus.bit_length() + 7) // 8
        self._g1_len = fq_bytes
        self._g2_len = 2 * fq_bytes

    def take(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        assert len(out) == n, "truncated ceremony message"
        self.pos += n
        return out

    def u64(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def g1(self):
        return codec.deserialize_g1_compressed(self.take(self._g1_len), self.cfg.g1)

    def g2(self):
        return codec.deserialize_g2_compressed(self.take(self._g2_len), self.cfg.g2)

    def g1_list(self):
        return [self.g1() for _ in range(self.u64())]

    def g2_list(self):
        return [self.g2() for _ in range(self.u64())]

    def at_end(self) -> bool:
        return self.pos == len(self.data)


def state_to_bytes(state: P2.Phase2State) -> bytes:
    w = _Writer(state.cfg)
    w.u64(state.domain_size)
    w.u64(state.num_instance)
    w.g1(state.alpha_g1)
    w.g1(state.beta_g1)
    w.g2(state.beta_g2)
    w.g1(state.delta_g1)
    w.g2(state.delta_g2)
    w.g1_list(state.a_query)
    w.g1_list(state.b_g1_query)
    w.g2_list(state.b_g2_query)
    w.g1_list(state.gamma_abc_g1)
    w.g1_list(state.l_query)
    w.g1_list(state.h_query)
    return w.bytes_out()


def state_from_bytes(cfg: PR.PairingConfig, data: bytes) -> P2.Phase2State:
    r = _Reader(cfg, data)
    domain_size = r.u64()
    num_instance = r.u64()
    state = P2.Phase2State(
        cfg=cfg,
        domain_size=domain_size,
        alpha_g1=r.g1(),
        beta_g1=r.g1(),
        beta_g2=r.g2(),
        delta_g1=r.g1(),
        delta_g2=r.g2(),
        a_query=r.g1_list(),
        b_g1_query=r.g1_list(),
        b_g2_query=r.g2_list(),
        gamma_abc_g1=r.g1_list(),
        l_query=r.g1_list(),
        h_query=r.g1_list(),
        num_instance=num_instance,
    )
    assert r.at_end(), "trailing ceremony state bytes"
    return state


def proof_to_bytes(cfg: PR.PairingConfig, proof: RT.RatioProof) -> bytes:
    w = _Writer(cfg)
    w.g1(proof.ratio[0])
    w.g1(proof.ratio[1])
    w.g2(proof.matching_point)
    return w.bytes_out()


def proof_from_bytes(cfg: PR.PairingConfig, data: bytes) -> RT.RatioProof:
    r = _Reader(cfg, data)
    ratio = (r.g1(), r.g1())
    matching = r.g2()
    assert r.at_end()
    return RT.RatioProof(ratio=ratio, matching_point=matching)


# ---------------------------------------------------------------------------
# Round files (canonical, replaces pickle — the verifier CLI re-reads
# CONTRIBUTOR-produced files, and unpickling untrusted bytes is arbitrary
# code execution; the reference persists every round in arkworks canonical
# form, `manta-crypto/src/arkworks/groth16.rs:216-500`)
# ---------------------------------------------------------------------------

_ROUNDS_MAGIC = b"MTC2"
_ROUND_CURVES = {"bn254": 0, "bls12_381": 1}
_ROUND_CONFIGS = {0: PR.BN254_PAIRING, 1: PR.BLS12_381_PAIRING}


def rounds_to_bytes(
    states: Dict[str, P2.Phase2State],
    transcript: List[Dict[str, RT.RatioProof]],
) -> bytes:
    """Serialize a ceremony round file: the current multi-circuit states
    plus the proof transcript accumulated so far."""
    names = list(states)
    cfg = states[names[0]].cfg
    parts = [
        _ROUNDS_MAGIC,
        struct.pack("<BB", 1, _ROUND_CURVES[cfg.name]),
        struct.pack("<Q", len(names)),
    ]
    for name in names:
        raw = name.encode()
        parts.append(struct.pack("<H", len(raw)))
        parts.append(raw)
    for name in names:
        blob = state_to_bytes(states[name])
        parts.append(struct.pack("<Q", len(blob)))
        parts.append(blob)
    parts.append(struct.pack("<Q", len(transcript)))
    for round_proofs in transcript:
        for name in names:
            blob = proof_to_bytes(cfg, round_proofs[name])
            parts.append(struct.pack("<Q", len(blob)))
            parts.append(blob)
    return b"".join(parts)


def rounds_from_bytes(data: bytes):
    """Inverse of `rounds_to_bytes` -> (states, transcript)."""
    if data[:4] != _ROUNDS_MAGIC:
        raise ValueError("not a ceremony round file")
    version, curve_id = struct.unpack("<BB", data[4:6])
    if version != 1:
        raise ValueError(f"unsupported round-file version {version}")
    cfg = _ROUND_CONFIGS[curve_id]
    pos = 6

    def take(n):
        nonlocal pos
        out = data[pos : pos + n]
        if len(out) != n:
            raise ValueError("truncated round file")
        pos += n
        return out

    (n_names,) = struct.unpack("<Q", take(8))
    names = []
    for _ in range(n_names):
        (ln,) = struct.unpack("<H", take(2))
        names.append(take(ln).decode())
    states = {}
    for name in names:
        (ln,) = struct.unpack("<Q", take(8))
        states[name] = state_from_bytes(cfg, take(ln))
    (n_rounds,) = struct.unpack("<Q", take(8))
    transcript = []
    for _ in range(n_rounds):
        round_proofs = {}
        for name in names:
            (ln,) = struct.unpack("<Q", take(8))
            round_proofs[name] = proof_from_bytes(cfg, take(ln))
        transcript.append(round_proofs)
    if pos != len(data):
        raise ValueError("trailing bytes in round file")
    return states, transcript


# ---------------------------------------------------------------------------
# Parallel (multi-circuit) rounds — reference `mpc.rs:287`
# ---------------------------------------------------------------------------


class ParallelCoordinator:
    """Lock-queue rounds where each contribution rescales ALL circuits.

    `states` is an ordered {name: Phase2State}; a contribution is accepted
    only if every circuit's transform verifies (atomic round, like the
    reference's `Parallel<T>: Contribute + Verify`)."""

    def __init__(
        self,
        states: Dict[str, P2.Phase2State],
        registry: CO.Registry,
        recovery_dir: Optional[str] = None,
        lock_timeout: float = 60.0,
    ):
        self.states = dict(states)
        self.names = list(states)
        self.registry = registry
        self.queue = CO.LockQueue(lock_timeout)
        self.round = 0
        self.recovery_dir = recovery_dir
        self.transcript: List[Dict[str, RT.RatioProof]] = []
        self.mutex = threading.Lock()
        self._save_round()

    def _save_round(self):
        if self.recovery_dir:
            os.makedirs(self.recovery_dir, exist_ok=True)
            path = os.path.join(
                self.recovery_dir, f"round_{self.round:04d}.parallel"
            )
            with open(path, "wb") as f:
                f.write(rounds_to_bytes(self.states, self.transcript))

    @classmethod
    def recover(
        cls, recovery_dir: str, registry: CO.Registry
    ) -> "ParallelCoordinator":
        """Restart from the latest persisted round (`server.rs:118`)."""
        rounds = sorted(
            f for f in os.listdir(recovery_dir) if f.endswith(".parallel")
        )
        assert rounds, "no recovery states found"
        with open(os.path.join(recovery_dir, rounds[-1]), "rb") as f:
            states, transcript = rounds_from_bytes(f.read())
        coordinator = cls(states, registry, recovery_dir)
        coordinator.round = int(rounds[-1].split("_")[1].split(".")[0])
        coordinator.transcript = transcript
        return coordinator

    def enqueue(self, identifier: str):
        self.queue.join(self.registry, identifier)

    def get_states(self, identifier: str) -> Optional[Dict[str, P2.Phase2State]]:
        if not self.queue.try_acquire(identifier):
            return None
        return self.states

    def contribute(
        self,
        identifier: str,
        new_states: Dict[str, P2.Phase2State],
        proofs: Dict[str, RT.RatioProof],
    ) -> bool:
        if self.queue.holder != identifier:
            return False
        if set(new_states) != set(self.names) or set(proofs) != set(self.names):
            return False
        for name in self.names:
            if not P2.verify_transform(
                self.states[name], new_states[name], proofs[name]
            ):
                return False
        self.states = dict(new_states)
        self.round += 1
        self.transcript.append(dict(proofs))
        self.registry.participants[identifier].has_contributed = True
        self.queue.release(identifier)
        self._save_round()
        return True

    def verify_full_transcript(
        self, initial: Dict[str, P2.Phase2State]
    ) -> bool:
        """Re-verify every round of every circuit from the persisted states
        (the `groth16_phase2_verifier` binary, `bin/` 222 LoC)."""
        if not self.recovery_dir:
            return False
        rounds = sorted(
            f for f in os.listdir(self.recovery_dir) if f.endswith(".parallel")
        )
        prev = initial
        for fname, proofs in zip(rounds[1:], self.transcript):
            with open(os.path.join(self.recovery_dir, fname), "rb") as f:
                nxt, _ = rounds_from_bytes(f.read())
            for name in self.names:
                if not P2.verify_transform(prev[name], nxt[name], proofs[name]):
                    return False
            prev = nxt
        return True


# ---------------------------------------------------------------------------
# HTTP server / client
# ---------------------------------------------------------------------------


def _b64(data: bytes) -> str:
    return base64.b64encode(data).decode()


def _unb64(s: str) -> bytes:
    return base64.b64decode(s.encode())


class CeremonyServer:
    """HTTP front end over a ParallelCoordinator.

    Endpoints (all POST, JSON bodies; reference `server.rs` tide routes):
      /enqueue     {id, nonce, sig}                 -> {position}
      /state       {id, nonce, sig}                 -> {round, states} | {position}
      /contribute  {id, nonce, sig, states, proofs} -> {ok, round}
      /status      {}                               -> {round, circuits, holder}

    Signatures cover nonce||path so a captured message cannot be replayed
    on another endpoint or reused (nonces are strictly increasing per
    participant — `ceremony/signature.rs:91`).
    """

    def __init__(
        self,
        coordinator: ParallelCoordinator,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.coordinator = coordinator
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
                try:
                    req = json.loads(self.rfile.read(length) or b"{}")
                except json.JSONDecodeError:
                    return self._reply(400, {"error": "bad json"})
                try:
                    self._reply(200, outer._route(self.path, req))
                except PermissionError as e:
                    self._reply(403, {"error": str(e)})
                except Exception as e:  # noqa: BLE001
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_port
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )

    def start(self):
        self.thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()

    # -- request routing (runs in handler threads) --

    def _check(self, path: str, req: dict) -> str:
        ident = req.get("id", "")
        nonce = int(req.get("nonce", -1))
        sig = req.get("sig", "")
        with self.coordinator.mutex:
            participant = self.coordinator.registry.participants.get(ident)
            if participant is None:
                raise PermissionError("unknown participant")
            if nonce <= participant.nonce:
                raise PermissionError("stale nonce")
            if not CO.verify_message(
                participant.public_key,
                nonce,
                path.encode(),
                bytes.fromhex(sig),
            ):
                raise PermissionError("bad signature")
            participant.nonce = nonce
        return ident

    def _route(self, path: str, req: dict) -> dict:
        co = self.coordinator
        if path == "/status":
            with co.mutex:
                return {
                    "round": co.round,
                    "circuits": co.names,
                    "holder": co.queue.holder,
                }
        ident = self._check(path, req)
        if path == "/enqueue":
            with co.mutex:
                co.enqueue(ident)
                return {"position": co.queue.position(ident)}
        if path == "/state":
            with co.mutex:
                states = co.get_states(ident)
                if states is None:
                    return {"position": co.queue.position(ident)}
                return {
                    "round": co.round,
                    "states": {
                        name: _b64(state_to_bytes(s))
                        for name, s in states.items()
                    },
                }
        if path == "/contribute":
            cfg0 = next(iter(co.states.values())).cfg
            new_states = {
                name: state_from_bytes(cfg0, _unb64(b))
                for name, b in req["states"].items()
            }
            proofs = {
                name: proof_from_bytes(cfg0, _unb64(b))
                for name, b in req["proofs"].items()
            }
            with co.mutex:
                ok = co.contribute(ident, new_states, proofs)
                return {"ok": ok, "round": co.round}
        raise ValueError(f"unknown endpoint {path}")


class CeremonyClient:
    """Contributor loop (reference `client.rs` + `groth16_phase2_client.rs`)."""

    def __init__(
        self,
        url: str,
        identifier: str,
        signing_key,
        start_nonce: int = 1,
    ):
        self.url = url.rstrip("/")
        self.identifier = identifier
        self.sk = signing_key
        self.nonce = start_nonce

    def _post(self, path: str, extra: Optional[dict] = None) -> dict:
        import urllib.request

        payload = dict(extra or {})
        if path != "/status":
            self.nonce += 1
            payload.update(
                id=self.identifier,
                nonce=self.nonce,
                sig=CO.sign_message(self.sk, self.nonce, path.encode()).hex(),
            )
        req = urllib.request.Request(
            self.url + path,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    def status(self) -> dict:
        return self._post("/status")

    def enqueue(self) -> dict:
        return self._post("/enqueue")

    def try_contribute(self, cfg, deltas: Dict[str, int], nonce: int = 7):
        """One attempt: fetch states if we hold the lock, rescale every
        circuit by its delta, submit. Returns the server reply, or the
        queue position dict if not yet our turn."""
        reply = self._post("/state")
        if "states" not in reply:
            return reply
        states = {
            name: state_from_bytes(cfg, _unb64(b))
            for name, b in reply["states"].items()
        }
        proofs = {}
        for name, state in states.items():
            proofs[name] = P2.contribute(state, deltas[name], nonce=nonce)
        return self._post(
            "/contribute",
            {
                "states": {
                    name: _b64(state_to_bytes(s)) for name, s in states.items()
                },
                "proofs": {
                    name: _b64(proof_to_bytes(cfg, p))
                    for name, p in proofs.items()
                },
            },
        )
