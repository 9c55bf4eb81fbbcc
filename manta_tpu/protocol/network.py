"""Multi-network signer support.

Mirrors the reference's network-scoped signer clients
(`manta-pay/src/signer/client/network.rs:34-120`): a `Network` enum
(Dolphin / Calamari / Manta), a `NetworkSpecific` per-network container,
and request wrapping — one signer daemon can serve one wallet per network,
with every RPC carrying its target network
(`signer/client/http.rs:49-77` `set_network` / `wrap_request`).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Dict, Generic, Optional, TypeVar

T = TypeVar("T")


class Network(enum.Enum):
    DOLPHIN = "Dolphin"
    CALAMARI = "Calamari"
    MANTA = "Manta"

    @classmethod
    def parse(cls, name: str) -> "Network":
        for n in cls:
            if n.value.lower() == name.lower():
                return n
        raise ValueError(f"unknown network {name!r}")

    def __index__(self) -> int:
        return list(Network).index(self)


class NonexistentWallet(KeyError):
    """No wallet configured for the requested network (reference
    `network.rs:75` NetworkError::NonexistentWallet)."""

    def __init__(self, network: Network):
        super().__init__(network.value)
        self.network = network


@dataclass
class NetworkSpecific(Generic[T]):
    """Per-network data container (reference `network.rs:86-120`)."""

    dolphin: Optional[T] = None
    calamari: Optional[T] = None
    manta: Optional[T] = None

    def __getitem__(self, network: Network) -> T:
        value = getattr(self, network.value.lower())
        if value is None:
            raise NonexistentWallet(network)
        return value

    def __setitem__(self, network: Network, value: T) -> None:
        setattr(self, network.value.lower(), value)

    def items(self):
        for n in Network:
            v = getattr(self, n.value.lower())
            if v is not None:
                yield n, v


def wrap_request(payload: dict, network: Optional[Network]) -> dict:
    """Wrap an outgoing request with its target network (reference
    `http.rs:71-77`); no-op when the client is single-network."""
    if network is None:
        return payload
    return {**payload, "network": network.value}


def unwrap_network(payload: dict) -> Optional[Network]:
    name = payload.get("network")
    return Network.parse(name) if name else None
