"""Ceremony coordination: priority queue, timed contributor locks, signed
messages, server/client over HTTP.

Mirrors the reference's ceremony framework
(`manta-trusted-setup/src/groth16/ceremony/`):

- ed25519-signed participant messages with monotonically increasing nonces
  (`ceremony/signature.rs:91`, `config/ppot.rs:73` Ed25519<RawMessage<u64>>)
- a registry of participants with priorities (`ceremony/registry/csv.rs`)
- `LockQueue`: priority queue + a timed lock so one contributor at a time
  holds the round, expiring after `lock_timeout` seconds
  (`coordinator.rs:63-180`)
- a coordinator driving phase-2 rounds: serve (state, challenge) to the
  lock holder, verify their contribution transform, advance the round,
  persist per-round state files for recovery (`server.rs:60-513`)
"""

from __future__ import annotations

import dataclasses
import os
import threading
import time
from typing import Dict, List, Optional

from cryptography.hazmat.primitives.asymmetric.ed25519 import (
    Ed25519PrivateKey,
    Ed25519PublicKey,
)

from manta_tpu.ceremony import phase2 as P2
from manta_tpu.ceremony import ratio as RT


# -- signed messages --


def generate_keypair():
    sk = Ed25519PrivateKey.generate()
    pk = sk.public_key().public_bytes_raw()
    return sk, pk


def sign_message(sk: Ed25519PrivateKey, nonce: int, payload: bytes) -> bytes:
    return sk.sign(nonce.to_bytes(8, "little") + payload)


def verify_message(pk_bytes: bytes, nonce: int, payload: bytes, sig: bytes) -> bool:
    try:
        Ed25519PublicKey.from_public_bytes(pk_bytes).verify(
            sig, nonce.to_bytes(8, "little") + payload
        )
        return True
    except Exception:  # noqa: BLE001
        return False


# -- registry + lock queue --


@dataclasses.dataclass
class Participant:
    identifier: str
    public_key: bytes
    priority: int = 0
    nonce: int = 0
    has_contributed: bool = False


class Registry:
    def __init__(self):
        self.participants: Dict[str, Participant] = {}

    def register(self, identifier: str, public_key: bytes, priority: int = 0):
        self.participants[identifier] = Participant(
            identifier=identifier, public_key=public_key, priority=priority
        )

    @classmethod
    def from_csv(cls, path: str) -> "Registry":
        """id,pubkey_hex,priority per line (reference registry/csv.rs)."""
        reg = cls()
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ident, pk_hex, prio = line.split(",")
                reg.register(ident, bytes.fromhex(pk_hex), int(prio))
        return reg


class LockQueue:
    """Priority queue + expiring contributor lock (coordinator.rs:63-180)."""

    def __init__(self, lock_timeout: float = 60.0):
        self.lock_timeout = lock_timeout
        self.queue: List[str] = []
        self.holder: Optional[str] = None
        self.lock_expiry: float = 0.0

    def join(self, registry: Registry, identifier: str):
        if identifier not in self.queue and identifier != self.holder:
            self.queue.append(identifier)
            self.queue.sort(
                key=lambda i: -registry.participants[i].priority
            )

    def update_expired_lock(self):
        if self.holder is not None and time.monotonic() > self.lock_expiry:
            self.holder = None

    def try_acquire(self, identifier: str) -> bool:
        self.update_expired_lock()
        if self.holder is None and self.queue and self.queue[0] == identifier:
            self.holder = self.queue.pop(0)
            self.lock_expiry = time.monotonic() + self.lock_timeout
            return True
        return self.holder == identifier

    def release(self, identifier: str):
        if self.holder == identifier:
            self.holder = None

    def position(self, identifier: str) -> Optional[int]:
        if self.holder == identifier:
            return 0
        try:
            return 1 + self.queue.index(identifier)
        except ValueError:
            return None


# -- coordinator --


class Coordinator:
    """Drives phase-2 rounds over one circuit's state."""

    def __init__(
        self,
        state: P2.Phase2State,
        registry: Registry,
        recovery_dir: Optional[str] = None,
        lock_timeout: float = 60.0,
    ):
        self.state = state
        self.registry = registry
        self.queue = LockQueue(lock_timeout)
        self.round = 0
        self.recovery_dir = recovery_dir
        self.transcript: List[RT.RatioProof] = []
        self.mutex = threading.Lock()
        self._save_round()

    def _save_round(self):
        # canonical round files (the multi-circuit container with one
        # circuit) — never pickle: the verifier CLI re-reads these
        from manta_tpu.ceremony import server as _wire

        if self.recovery_dir:
            os.makedirs(self.recovery_dir, exist_ok=True)
            with open(
                os.path.join(self.recovery_dir, f"round_{self.round:04d}.state"),
                "wb",
            ) as f:
                f.write(_wire.rounds_to_bytes(
                    {"_": self.state}, [{"_": p} for p in self.transcript]
                ))

    @classmethod
    def recover(cls, recovery_dir: str, registry: Registry) -> "Coordinator":
        """Restart from the latest persisted round (server.rs:118)."""
        rounds = sorted(
            f for f in os.listdir(recovery_dir) if f.endswith(".state")
        )
        assert rounds, "no recovery states found"
        from manta_tpu.ceremony import server as _wire

        with open(os.path.join(recovery_dir, rounds[-1]), "rb") as f:
            states, wrapped = _wire.rounds_from_bytes(f.read())
        state = states["_"]
        transcript = [p["_"] for p in wrapped]
        coordinator = cls(state, registry, recovery_dir)
        coordinator.round = int(rounds[-1].split("_")[1].split(".")[0])
        coordinator.transcript = transcript
        return coordinator

    def _check_signature(self, identifier: str, nonce: int, payload: bytes, sig_hex: str) -> bool:
        participant = self.registry.participants.get(identifier)
        if participant is None or nonce <= participant.nonce:
            return False
        if not verify_message(
            participant.public_key, nonce, payload, bytes.fromhex(sig_hex)
        ):
            return False
        participant.nonce = nonce
        return True

    # -- round operations (called under self.mutex by the server) --

    def enqueue(self, identifier: str):
        self.queue.join(self.registry, identifier)

    def get_state(self, identifier: str):
        if not self.queue.try_acquire(identifier):
            return None
        return self.state

    def contribute(self, identifier: str, new_state: P2.Phase2State, proof: RT.RatioProof) -> bool:
        if self.queue.holder != identifier:
            return False
        if not P2.verify_transform(self.state, new_state, proof):
            return False
        self.state = new_state
        self.round += 1
        self.transcript.append(proof)
        participant = self.registry.participants[identifier]
        participant.has_contributed = True
        self.queue.release(identifier)
        self._save_round()
        return True

    def verify_full_transcript(self, initial: P2.Phase2State) -> bool:
        """Re-verify the whole ceremony from the initial state using the
        persisted per-round states (the `groth16_phase2_verifier` binary)."""
        if not self.recovery_dir:
            return False
        rounds = sorted(
            f for f in os.listdir(self.recovery_dir) if f.endswith(".state")
        )
        from manta_tpu.ceremony import server as _wire

        prev = initial
        for fname, proof in zip(rounds[1:], self.transcript):
            with open(os.path.join(self.recovery_dir, fname), "rb") as f:
                nxt = _wire.rounds_from_bytes(f.read())[0]["_"]
            if not P2.verify_transform(prev, nxt, proof):
                return False
            prev = nxt
        return True
