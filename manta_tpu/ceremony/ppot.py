"""Perpetual-Powers-of-Tau (bellman format) import/export.

Byte-level port of the reference's PPoT (de)serializer
(`manta-trusted-setup/src/groth16/ppot/serialization.rs:40-200`), used to
seed Groth16 phase 2 from the community BN254 ceremony:

- G1 uncompressed: 64 bytes — big-endian x ‖ y; the first byte's bit 7 is
  the compression flag (must be 0), bit 6 the infinity flag.
- G1 compressed: 32 bytes — big-endian x, bit 7 = "greatest y", bit 6 =
  infinity.
- G2 uncompressed: 128 bytes — x.c1 ‖ x.c0 ‖ y.c1 ‖ y.c0 (c1 FIRST).
- G2 compressed: 64 bytes — x.c1 ‖ x.c0 with the same flag bits.
- Challenge files: a 64-byte BLAKE2b header hash, then
  tau_g1[2N−1] ‖ tau_g2[N] ‖ alpha_tau_g1[N] ‖ beta_tau_g1[N] ‖ beta_g2,
  all uncompressed (`serialization.rs:439`, `read_subaccumulator`).
"""

from __future__ import annotations

import hashlib
from typing import Optional

from manta_tpu.ceremony import kzg as KZG
from manta_tpu.models import pairing as PR
from manta_tpu.utils import codec, hostmath

CFG = PR.BN254_PAIRING
_P = CFG.g1.field.modulus


class PpotFormatError(ValueError):
    pass


def _is_greatest(y: int) -> bool:
    return y > (_P - y) % _P


def _fq2_is_greatest(y) -> bool:
    neg = hostmath.fq2_neg(y, _P)
    return (y[1], y[0]) > (neg[1], neg[0])


# -- G1 --


def serialize_g1_uncompressed(pt: Optional[tuple]) -> bytes:
    if pt is None:
        out = bytearray(64)
        out[0] |= 1 << 6
        return bytes(out)
    return pt[0].to_bytes(32, "big") + pt[1].to_bytes(32, "big")


def deserialize_g1_uncompressed(data: bytes) -> Optional[tuple]:
    copy = bytearray(data[:64])
    if copy[0] & (1 << 7):
        raise PpotFormatError("expected uncompressed point")
    if copy[0] & (1 << 6):
        copy[0] &= 0x3F
        if any(copy):
            raise PpotFormatError("malformed point at infinity")
        return None
    copy[0] &= 0x3F
    x = int.from_bytes(copy[:32], "big") % _P
    y = int.from_bytes(copy[32:], "big") % _P
    pt = (x, y)
    if not CFG.g1.is_on_curve(pt):
        raise PpotFormatError("G1 point not on curve")
    return pt


def serialize_g1_compressed(pt: Optional[tuple]) -> bytes:
    if pt is None:
        out = bytearray(32)
        out[0] |= 1 << 6
        return bytes(out)
    out = bytearray(pt[0].to_bytes(32, "big"))
    if _is_greatest(pt[1]):
        out[0] |= 1 << 7
    return bytes(out)


def deserialize_g1_compressed(data: bytes) -> Optional[tuple]:
    copy = bytearray(data[:32])
    if copy[0] & (1 << 6):
        copy[0] &= 0x3F
        if any(copy):
            raise PpotFormatError("malformed point at infinity")
        return None
    greatest = bool(copy[0] & (1 << 7))
    copy[0] &= 0x3F
    x = int.from_bytes(copy, "big")
    y2 = (x * x % _P * x + CFG.g1.b) % _P
    y = hostmath.fsqrt(y2, _P)
    if y is None:
        raise PpotFormatError("G1 x not on curve")
    if _is_greatest(y) != greatest:
        y = (_P - y) % _P
    return (x, y)


# -- G2 --


def serialize_g2_uncompressed(pt: Optional[tuple]) -> bytes:
    if pt is None:
        out = bytearray(128)
        out[0] |= 1 << 6
        return bytes(out)
    (x0, x1), (y0, y1) = pt
    return (
        x1.to_bytes(32, "big")
        + x0.to_bytes(32, "big")
        + y1.to_bytes(32, "big")
        + y0.to_bytes(32, "big")
    )


def deserialize_g2_uncompressed(data: bytes) -> Optional[tuple]:
    copy = bytearray(data[:128])
    if copy[0] & (1 << 7):
        raise PpotFormatError("expected uncompressed point")
    if copy[0] & (1 << 6):
        copy[0] &= 0x3F
        if any(copy):
            raise PpotFormatError("malformed point at infinity")
        return None
    copy[0] &= 0x3F
    x_c1 = int.from_bytes(copy[:32], "big") % _P
    x_c0 = int.from_bytes(copy[32:64], "big") % _P
    y_c1 = int.from_bytes(copy[64:96], "big") % _P
    y_c0 = int.from_bytes(copy[96:128], "big") % _P
    pt = ((x_c0, x_c1), (y_c0, y_c1))
    if not CFG.g2.is_on_curve(pt):
        raise PpotFormatError("G2 point not on curve")
    return pt


def serialize_g2_compressed(pt: Optional[tuple]) -> bytes:
    if pt is None:
        out = bytearray(64)
        out[0] |= 1 << 6
        return bytes(out)
    (x0, x1), y = pt
    out = bytearray(x1.to_bytes(32, "big") + x0.to_bytes(32, "big"))
    if _fq2_is_greatest(y):
        out[0] |= 1 << 7
    return bytes(out)


def deserialize_g2_compressed(data: bytes) -> Optional[tuple]:
    copy = bytearray(data[:64])
    if copy[0] & (1 << 6):
        copy[0] &= 0x3F
        if any(copy):
            raise PpotFormatError("malformed point at infinity")
        return None
    greatest = bool(copy[0] & (1 << 7))
    copy[0] &= 0x3F
    x = (
        int.from_bytes(copy[32:64], "big") % _P,
        int.from_bytes(copy[:32], "big") % _P,
    )
    y2 = hostmath.fq2_add(
        hostmath.fq2_mul(hostmath.fq2_square(x, _P), x, _P), CFG.g2.b, _P
    )
    y = codec.fq2_sqrt(y2, _P)
    if y is None:
        raise PpotFormatError("G2 x not on curve")
    if _fq2_is_greatest(y) != greatest:
        y = hostmath.fq2_neg(y, _P)
    return (x, y)


# -- challenge files --

HASH_SIZE = 64


def write_challenge(acc: KZG.Accumulator, prev_hash: bytes = b"") -> bytes:
    """Serialize an accumulator in the PPoT challenge layout."""
    header = (prev_hash or bytes(HASH_SIZE))[:HASH_SIZE].ljust(HASH_SIZE, b"\x00")
    parts = [header]
    parts += [serialize_g1_uncompressed(p) for p in acc.tau_powers_g1]
    parts += [serialize_g2_uncompressed(p) for p in acc.tau_powers_g2]
    parts += [serialize_g1_uncompressed(p) for p in acc.alpha_tau_powers_g1]
    parts += [serialize_g1_uncompressed(p) for p in acc.beta_tau_powers_g1]
    parts.append(serialize_g2_uncompressed(acc.beta_g2))
    return b"".join(parts)


def read_challenge(data: bytes, size: int) -> tuple:
    """Parse a PPoT challenge into (Accumulator, header_hash, file_hash).

    `size` = N (tau G2 power count); tau G1 has 2N−1 entries
    (reference `read_subaccumulator`, `ceremony/config/ppot.rs:698-699`)."""
    header = data[:HASH_SIZE]
    off = HASH_SIZE

    def g1():
        nonlocal off
        pt = deserialize_g1_uncompressed(data[off : off + 64])
        off += 64
        return pt

    def g2():
        nonlocal off
        pt = deserialize_g2_uncompressed(data[off : off + 128])
        off += 128
        return pt

    tau_g1 = [g1() for _ in range(2 * size - 1)]
    tau_g2 = [g2() for _ in range(size)]
    alpha = [g1() for _ in range(size)]
    beta = [g1() for _ in range(size)]
    beta_g2 = g2()
    acc = KZG.Accumulator(
        cfg=CFG,
        tau_powers_g1=tau_g1,
        tau_powers_g2=tau_g2,
        alpha_tau_powers_g1=alpha,
        beta_tau_powers_g1=beta,
        beta_g2=beta_g2,
    )
    file_hash = hashlib.blake2b(data[: off]).digest()
    return acc, header, file_hash
