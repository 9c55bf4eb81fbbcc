"""Key hierarchy, addresses, authorization, and Schnorr signing.

Mirrors the reference key chain (reference
`manta-accounting/src/transfer/utxo/protocol.rs:895-1077`):

    spending_key sk (embedded scalar)
      └─ proof_authorization_key pak = [sk]G
           └─ viewing_key vk = VKDF(pak) = Poseidon2(pak.x, pak.y) mod r_emb
                └─ receiving_key rk = [vk]G      (== the Address)

Authorization for spend shapes: randomness rho, randomized key
rpak = [rho]pak (public in-circuit); signing key for posts = sk·rho, whose
Schnorr verification key is rpak (`protocol.rs:1062-1077`).

Schnorr signature (reference `config/utxo.rs:1875-1907`):
    hash = Blake2s-256("manta-pay/1.0.0/Schnorr-hash" || vk_bytes ||
                       nonce_point_bytes || message)  (LE, mod r_emb)
    s = nonce + hash · sk;  signature = (s, [nonce]G)
    verify: [s]G == nonce_point + [hash]vk_point
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Optional, Tuple

from manta_tpu.protocol import config as CFG
from manta_tpu.utils import grain


def _h2(cfg: CFG.MantaPayConfig, a: int, b: int) -> int:
    return grain.poseidon_hash(cfg.viewing_key_derivation, [a, b])


def proof_authorization_key(cfg: CFG.MantaPayConfig, sk: int):
    return cfg.embedded.scalar_mul(sk, cfg.group_generator)


def viewing_key(cfg: CFG.MantaPayConfig, pak) -> int:
    """VKDF: Poseidon2(pak.x, pak.y) reduced into the embedded scalar field
    (reference `config/utxo.rs:528-544` rem_mod_prime)."""
    return _h2(cfg, pak[0], pak[1]) % CFG.EMBEDDED_FR.modulus


def receiving_key(cfg: CFG.MantaPayConfig, vk: int):
    return cfg.embedded.scalar_mul(vk, cfg.group_generator)


def address_from_spending_key(cfg: CFG.MantaPayConfig, sk: int):
    """Address = [VKDF([sk]G)]G (reference `protocol.rs:895-909`)."""
    return receiving_key(cfg, viewing_key(cfg, proof_authorization_key(cfg, sk)))


def address_partition(cfg: CFG.MantaPayConfig, address) -> int:
    """Blake2s 1-byte partition of the receiving key
    (reference `config/utxo.rs:1808-1831`)."""
    h = hashlib.blake2s(digest_size=1)
    h.update(b"manta-v1.0.0/address-partition-function")
    h.update(_point_unchecked_bytes(address))
    return h.digest()[0]


def _point_unchecked_bytes(pt) -> bytes:
    """ark serialize_unchecked for an Edwards affine point: x || y LE."""
    return pt[0].to_bytes(32, "little") + pt[1].to_bytes(32, "little")


@dataclasses.dataclass
class AuthorizationContext:
    proof_authorization_key: Tuple[int, int]
    viewing_key: Optional[int] = None
    receiving_key: Optional[Tuple[int, int]] = None

    def compute_viewing_key(self, cfg: CFG.MantaPayConfig) -> int:
        if self.viewing_key is None:
            self.viewing_key = viewing_key(cfg, self.proof_authorization_key)
        return self.viewing_key

    def compute_receiving_key(self, cfg: CFG.MantaPayConfig):
        if self.receiving_key is None:
            self.receiving_key = receiving_key(
                cfg, self.compute_viewing_key(cfg)
            )
        return self.receiving_key


@dataclasses.dataclass
class AuthorizationProof:
    randomness: int  # rho
    randomized_proof_authorization_key: Tuple[int, int]  # rpak = [rho]pak


@dataclasses.dataclass
class Authorization:
    context: AuthorizationContext
    proof: AuthorizationProof

    @classmethod
    def from_spending_key(cls, cfg: CFG.MantaPayConfig, sk: int, rho: int):
        pak = proof_authorization_key(cfg, sk)
        rpak = cfg.embedded.scalar_mul(rho, pak)
        return cls(
            context=AuthorizationContext(proof_authorization_key=pak),
            proof=AuthorizationProof(
                randomness=rho, randomized_proof_authorization_key=rpak
            ),
        )

    def verify(self, cfg: CFG.MantaPayConfig, sk: int) -> bool:
        pak = proof_authorization_key(cfg, sk)
        return (
            self.context.proof_authorization_key == pak
            and self.proof.randomized_proof_authorization_key
            == cfg.embedded.scalar_mul(self.proof.randomness, pak)
        )

    def signing_key(self, sk: int) -> int:
        """sk · rho (its public key is rpak)."""
        return sk * self.proof.randomness % CFG.EMBEDDED_FR.modulus


# -- Schnorr over the embedded curve --


def _schnorr_hash(cfg: CFG.MantaPayConfig, vk_point, nonce_point, message: bytes) -> int:
    h = hashlib.blake2s(digest_size=32)
    h.update(b"manta-pay/1.0.0/Schnorr-hash")
    h.update(_point_unchecked_bytes(vk_point))
    h.update(_point_unchecked_bytes(nonce_point))
    h.update(message)
    return int.from_bytes(h.digest(), "little") % CFG.EMBEDDED_FR.modulus


@dataclasses.dataclass
class Signature:
    scalar: int
    nonce_point: Tuple[int, int]


def schnorr_sign(
    cfg: CFG.MantaPayConfig, signing_key: int, nonce: int, message: bytes
) -> Signature:
    r_emb = CFG.EMBEDDED_FR.modulus
    nonce %= r_emb
    nonce_point = cfg.embedded.scalar_mul(nonce, cfg.group_generator)
    vk_point = cfg.embedded.scalar_mul(signing_key, cfg.group_generator)
    e = _schnorr_hash(cfg, vk_point, nonce_point, message)
    s = (nonce + e * signing_key) % r_emb
    return Signature(scalar=s, nonce_point=nonce_point)


def schnorr_verify(
    cfg: CFG.MantaPayConfig, vk_point, message: bytes, sig: Signature
) -> bool:
    e = _schnorr_hash(cfg, vk_point, sig.nonce_point, message)
    lhs = cfg.embedded.scalar_mul(sig.scalar, cfg.group_generator)
    rhs = cfg.embedded.add(
        sig.nonce_point, cfg.embedded.scalar_mul(e, vk_point)
    )
    return lhs == rhs
