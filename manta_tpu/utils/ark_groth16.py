"""arkworks Groth16 verifying-key (.dat) parsing.

Byte-level reader for the reference's `VerifyingContext` serialization
(`manta-crypto/src/arkworks/groth16.rs:308-500`): a prepared verifying key
written as

    VerifyingKey {
        alpha_g1 (compressed G1, 32B)
        beta_g2 / gamma_g2 / delta_g2 (compressed G2, 64B each)
        gamma_abc_g1: u64 length + n × compressed G1
    }
    alpha_g1_beta_g2: Fq12 (12 × 32B Fq, tower order c0..c5 per Fq6)
    gamma_g2_neg_pc / delta_g2_neg_pc: G2Prepared {
        ell_coeffs: u64 length + c × (Fq2, Fq2, Fq2)   (64B each Fq2)
        infinity: bool (1B)
    }

Parsing the plain VK is enough to verify reference proofs with our own
pairing (the Groth16 equation is pairing-agnostic); the prepared Miller
coefficients are retained for a future ark-identical optimal-ate path.

Validated against the published `manta-parameters/data/pay/verifying/*.dat`
(ToPrivate: 12 public inputs + 1, 91 Miller coefficients per prepared G2).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

from manta_tpu import fields
from manta_tpu.models import groth16 as G
from manta_tpu.models import pairing as PR
from manta_tpu.utils import codec, hostmath


@dataclasses.dataclass
class ArkPreparedVk:
    vk: G.VerifyingKey
    alpha_g1_beta_g2: tuple  # Fq12 coefficients as ((c0..c2),(c3..c5)) Fq2s
    gamma_ell_coeffs: List[Tuple[tuple, tuple, tuple]]
    delta_ell_coeffs: List[Tuple[tuple, tuple, tuple]]


def _read_fq2(r: codec.Reader) -> tuple:
    c0 = r.field(fields.BN254_FQ)
    c1 = r.field(fields.BN254_FQ)
    return (c0, c1)


def _read_fq12(r: codec.Reader) -> tuple:
    """ark QuadExtField<Fp12ParamsWrapper> serializes c0 (Fq6) then c1,
    each Fq6 as three Fq2s, each Fq2 as two Fq."""
    c0 = tuple(_read_fq2(r) for _ in range(3))
    c1 = tuple(_read_fq2(r) for _ in range(3))
    return (c0, c1)


def _read_g2_prepared(r: codec.Reader):
    count = r.u64()
    coeffs = [
        (_read_fq2(r), _read_fq2(r), _read_fq2(r)) for _ in range(count)
    ]
    infinity = r.bytes(1)[0] != 0
    return coeffs, infinity


def load_verifying_context(data: bytes) -> ArkPreparedVk:
    r = codec.Reader(data)
    g1, g2 = hostmath.BN254_G1, hostmath.BN254_G2
    alpha_g1 = codec.deserialize_g1_compressed(r.bytes(32), g1)
    beta_g2 = codec.deserialize_g2_compressed(r.bytes(64), g2)
    gamma_g2 = codec.deserialize_g2_compressed(r.bytes(64), g2)
    delta_g2 = codec.deserialize_g2_compressed(r.bytes(64), g2)
    n = r.u64()
    gamma_abc = [
        codec.deserialize_g1_compressed(r.bytes(32), g1) for _ in range(n)
    ]
    alpha_beta = _read_fq12(r)
    gamma_pc, _ = _read_g2_prepared(r)
    delta_pc, _ = _read_g2_prepared(r)
    assert r.at_end(), "trailing bytes in verifying context"
    vk = G.VerifyingKey(
        cfg=PR.BN254_PAIRING,
        alpha_g1=alpha_g1,
        beta_g2=beta_g2,
        gamma_g2=gamma_g2,
        delta_g2=delta_g2,
        gamma_abc_g1=gamma_abc,
    )
    return ArkPreparedVk(
        vk=vk,
        alpha_g1_beta_g2=alpha_beta,
        gamma_ell_coeffs=gamma_pc,
        delta_ell_coeffs=delta_pc,
    )


def load_verifying_context_file(path: str) -> ArkPreparedVk:
    with open(path, "rb") as f:
        return load_verifying_context(f.read())
