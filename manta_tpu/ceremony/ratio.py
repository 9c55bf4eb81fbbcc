"""Schnorr-style ratio proofs of knowledge for ceremony contributions.

Mirrors the reference (`manta-crypto/src/arkworks/ratio.rs:71-130`):
a contributor proves knowledge of the scalar x linking two accumulator
states by publishing (P, xP) in G1 plus x·H in G2, where
H = HashToGroup(challenge, (P, xP)) — verified with the same-ratio pairing
check e(P, x·H) == e(x·P, H).

Hash-to-G2 is try-and-increment over candidate x-coordinates followed by
cofactor clearing (the point's discrete log stays unknown, which the proof
of knowledge requires).
"""

from __future__ import annotations

import dataclasses
import hashlib

from manta_tpu.models import pairing as PR
from manta_tpu.utils import codec, hostmath


def hash_to_g2(cfg: PR.PairingConfig, data: bytes):
    """Try-and-increment hash onto the G2 prime-order subgroup."""
    g2 = cfg.g2
    p = g2.field.modulus
    counter = 0
    while True:
        h0 = hashlib.blake2b(
            b"manta-tpu/hash-to-g2/c0" + counter.to_bytes(4, "little") + data
        ).digest()
        h1 = hashlib.blake2b(
            b"manta-tpu/hash-to-g2/c1" + counter.to_bytes(4, "little") + data
        ).digest()
        x = (int.from_bytes(h0, "little") % p, int.from_bytes(h1, "little") % p)
        y2 = hostmath.fq2_add(
            hostmath.fq2_mul(hostmath.fq2_square(x, p), x, p), g2.b, p
        )
        y = codec.fq2_sqrt(y2, p)
        counter += 1
        if y is None:
            continue
        pt = _cofactor_mul(g2, (x, y))  # clear cofactor into the subgroup
        if pt is not None:
            return pt


def _cofactor_mul(curve, pt):
    """Multiply by the cofactor (plain double-and-add over the integer)."""
    k = curve.cofactor
    result, addend = None, pt
    while k:
        if k & 1:
            result = curve.add(result, addend)
        addend = curve.double(addend)
        k >>= 1
    return result


@dataclasses.dataclass
class RatioProof:
    ratio: Tuple[tuple, tuple]  # (P, xP) in G1
    matching_point: tuple  # x·H in G2

    @classmethod
    def prove(cls, cfg: PR.PairingConfig, challenge: bytes, scalar: int, nonce: int):
        g1 = cfg.g1
        base = g1.scalar_mul(nonce % g1.scalar_field.modulus, g1.generator)
        scaled = g1.scalar_mul(scalar, base)
        if base is None or scaled is None:
            return None
        h = hash_to_g2(cfg, _challenge_bytes(cfg, challenge, base, scaled))
        matching = cfg.g2.scalar_mul(scalar, h)
        if h is None or matching is None:
            return None
        return cls(ratio=(base, scaled), matching_point=matching)

    def verify(self, cfg: PR.PairingConfig, challenge: bytes) -> bool:
        h = hash_to_g2(
            cfg, _challenge_bytes(cfg, challenge, self.ratio[0], self.ratio[1])
        )
        return same_ratio(cfg, self.ratio, (h, self.matching_point))


def _challenge_bytes(cfg, challenge: bytes, p0, p1) -> bytes:
    return (
        challenge
        + codec.serialize_g1_compressed(p0, cfg.g1)
        + codec.serialize_g1_compressed(p1, cfg.g1)
    )


def same_ratio(cfg: PR.PairingConfig, g1_pair, g2_pair) -> bool:
    """e(a, d) == e(b, c) for g1_pair = (a, b), g2_pair = (c, d):
    checks b = x·a and d = x·c share the same x
    (reference `pairing.rs:69` PairingEngineExt::same_ratio)."""
    (a, b) = g1_pair
    (c, d) = g2_pair
    if a is None or b is None or c is None or d is None:
        return False
    eng = PR.engine(cfg)
    return eng.multi_pairing_is_one([(a, d), (cfg.g1.neg(b), c)])
