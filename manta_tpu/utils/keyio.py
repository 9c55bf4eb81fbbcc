"""Canonical (non-pickle) serialization for Groth16 keys and R1CS matrices.

The reference serializes ProvingContext/VerifyingContext in arkworks
canonical form (`manta-crypto/src/arkworks/groth16.rs:216-500`): points in
the ark-serialize 0.3 layout (LE field bytes, infinity/sign flags in the
top byte), lists with u64 length prefixes. This module is the analogue for
our key structures, so CLI-exported keys and ceremony artifacts are plain
binary data — loadable without unpickling (a trust-pipeline requirement:
the verifier re-reads contributor-produced files, and `pickle.load` on
untrusted bytes is arbitrary code execution).

Layout (all integers little-endian):
  header:  magic "MTKS" | u32 version | u8 curve-id (0 = BN254)
  matrices: u64 num_instance | u64 num_witness | u64 num_rows |
            rows of 3 linear combinations, each u64 n + n * (u64 col, Fr)
  vk:      alpha_g1 | beta_g2 | gamma_g2 | delta_g2 | g1_list gamma_abc
  pk:      u64 domain_size | alpha_g1 | beta_g1 | delta_g1 |
           beta_g2 | delta_g2 | g1_list a_query | g1_list b_g1_query |
           g2_list b_g2_query | g1_list h_query | g1_list l_query

Points are stored UNCOMPRESSED (x||y): proving keys hold ~4 * domain G1 +
domain G2 points, and the compressed form costs a modular square root per
point on load — minutes at production scale for zero benefit on disk that
zstd would not also deliver.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

from manta_tpu.models import groth16 as G
from manta_tpu.models import pairing as PR
from manta_tpu.models.circuit import ConstraintMatrices
from manta_tpu.utils import codec

MAGIC = b"MTKS"
VERSION = 1

_CURVES = {"bn254": 0, "bls12_381": 1}
_CURVES_REV = {v: k for k, v in _CURVES.items()}
_CONFIGS = {"bn254": PR.BN254_PAIRING, "bls12_381": PR.BLS12_381_PAIRING}


class Writer:
    def __init__(self, cfg: PR.PairingConfig):
        self.cfg = cfg
        self.parts: List[bytes] = []

    def u64(self, v: int) -> None:
        self.parts.append(struct.pack("<Q", v))

    def fr(self, v: int) -> None:
        self.parts.append(
            codec.serialize_field(v % self.cfg.g1.scalar_field.modulus,
                                  self.cfg.g1.scalar_field)
        )

    def g1(self, pt) -> None:
        self.parts.append(codec.serialize_g1_uncompressed(pt, self.cfg.g1))

    def g2(self, pt) -> None:
        self.parts.append(codec.serialize_g2_uncompressed(pt, self.cfg.g2))

    def g1_list(self, pts) -> None:
        self.u64(len(pts))
        for pt in pts:
            self.g1(pt)

    def g2_list(self, pts) -> None:
        self.u64(len(pts))
        for pt in pts:
            self.g2(pt)

    def out(self) -> bytes:
        return b"".join(self.parts)


class Reader:
    def __init__(self, cfg: PR.PairingConfig, data: bytes):
        self.cfg = cfg
        self.data = data
        self.pos = 0
        fq = codec.field_byte_size(cfg.g1.field)
        self._fr = codec.field_byte_size(cfg.g1.scalar_field)
        self._g1 = 2 * fq
        self._g2 = 4 * fq

    def take(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("truncated key data")
        self.pos += n
        return out

    def u64(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def fr(self) -> int:
        return codec.deserialize_field(self.take(self._fr),
                                       self.cfg.g1.scalar_field)

    def g1(self):
        return codec.deserialize_g1_uncompressed(self.take(self._g1), self.cfg.g1)

    def g2(self):
        return codec.deserialize_g2_uncompressed(self.take(self._g2), self.cfg.g2)

    def g1_list(self):
        return [self.g1() for _ in range(self.u64())]

    def g2_list(self):
        return [self.g2() for _ in range(self.u64())]

    def at_end(self) -> bool:
        return self.pos == len(self.data)


def _write_lc(w: Writer, lc: dict) -> None:
    w.u64(len(lc))
    for col in sorted(lc):
        w.u64(col)
        w.fr(lc[col])


def _read_lc(r: Reader) -> dict:
    return {r.u64(): r.fr() for _ in range(r.u64())}


def _write_matrices(w: Writer, m: ConstraintMatrices) -> None:
    w.u64(m.num_instance)
    w.u64(m.num_witness)
    w.u64(len(m.rows))
    for a, b, c in m.rows:
        _write_lc(w, a)
        _write_lc(w, b)
        _write_lc(w, c)


def _read_matrices(r: Reader) -> ConstraintMatrices:
    ni, nw, nr = r.u64(), r.u64(), r.u64()
    rows: List[Tuple[dict, dict, dict]] = [
        (_read_lc(r), _read_lc(r), _read_lc(r)) for _ in range(nr)
    ]
    return ConstraintMatrices(
        field=r.cfg.g1.scalar_field, num_instance=ni, num_witness=nw, rows=rows
    )


def write_vk(w: Writer, vk: G.VerifyingKey) -> None:
    w.g1(vk.alpha_g1)
    w.g2(vk.beta_g2)
    w.g2(vk.gamma_g2)
    w.g2(vk.delta_g2)
    w.g1_list(vk.gamma_abc_g1)


def read_vk(r: Reader) -> G.VerifyingKey:
    return G.VerifyingKey(
        cfg=r.cfg,
        alpha_g1=r.g1(),
        beta_g2=r.g2(),
        gamma_g2=r.g2(),
        delta_g2=r.g2(),
        gamma_abc_g1=r.g1_list(),
    )


def write_pk(w: Writer, pk: G.ProvingKey) -> None:
    w.u64(pk.domain_size)
    w.g1(pk.alpha_g1)
    w.g1(pk.beta_g1)
    w.g1(pk.delta_g1)
    w.g2(pk.beta_g2)
    w.g2(pk.delta_g2)
    w.g1_list(pk.a_query)
    w.g1_list(pk.b_g1_query)
    w.g2_list(pk.b_g2_query)
    w.g1_list(pk.h_query)
    w.g1_list(pk.l_query)


def read_pk(r: Reader) -> G.ProvingKey:
    return G.ProvingKey(
        cfg=r.cfg,
        domain_size=r.u64(),
        alpha_g1=r.g1(),
        beta_g1=r.g1(),
        delta_g1=r.g1(),
        beta_g2=r.g2(),
        delta_g2=r.g2(),
        a_query=r.g1_list(),
        b_g1_query=r.g1_list(),
        b_g2_query=r.g2_list(),
        h_query=r.g1_list(),
        l_query=r.g1_list(),
    )


def _header(cfg: PR.PairingConfig) -> bytes:
    return MAGIC + struct.pack("<IB", VERSION, _CURVES[cfg.name])


def _check_header(data: bytes) -> PR.PairingConfig:
    if data[:4] != MAGIC:
        raise ValueError("not a manta_tpu key file")
    version, curve_id = struct.unpack("<IB", data[4:9])
    if version != VERSION:
        raise ValueError(f"unsupported key-file version {version}")
    return _CONFIGS[_CURVES_REV[curve_id]]


def vk_to_bytes(vk: G.VerifyingKey) -> bytes:
    w = Writer(vk.cfg)
    write_vk(w, vk)
    return _header(vk.cfg) + w.out()


def vk_from_bytes(data: bytes) -> G.VerifyingKey:
    cfg = _check_header(data)
    r = Reader(cfg, data[9:])
    vk = read_vk(r)
    if not r.at_end():
        raise ValueError("trailing bytes in vk file")
    return vk


def shape_keys_to_bytes(keys) -> bytes:
    """Serialize a `transfer.ShapeKeys` (matrices + pk + vk)."""
    cfg = keys.pk.cfg
    w = Writer(cfg)
    _write_matrices(w, keys.matrices)
    write_vk(w, keys.vk)
    write_pk(w, keys.pk)
    return _header(cfg) + w.out()


def shape_keys_from_bytes(data: bytes):
    from manta_tpu.protocol.transfer import ShapeKeys

    cfg = _check_header(data)
    r = Reader(cfg, data[9:])
    matrices = _read_matrices(r)
    vk = read_vk(r)
    pk = read_pk(r)
    if not r.at_end():
        raise ValueError("trailing bytes in key file")
    return ShapeKeys(matrices=matrices, pk=pk, vk=vk)
