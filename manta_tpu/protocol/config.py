"""MantaPay protocol configuration: binds every abstract scheme to concrete
primitives (the analogue of reference `manta-pay/src/config/utxo.rs`).

Production parameters:
- Pairing curve BN254, constraint field = BN254 Fr
  (reference `config/mod.rs:40,67`).
- Embedded curve ed-on-bn254 (Baby Jubjub) for keys/DH/Schnorr (`:52`).
- Poseidon hashers over BN254 Fr with Grain-LFSR parameters and domain tag 0
  (validated byte-exact against `manta-parameters` blobs):
    UtxoCommitmentScheme     = Poseidon arity-5 (width 6)   `utxo.rs:297`
    ViewingKeyDerivation     = Poseidon arity-2 (width 3)   `utxo.rs:453`
    UtxoAccumulatorItemHash  = Poseidon arity-4 (width 5)   `utxo.rs:1083`
    NullifierCommitment      = Poseidon arity-3 (width 4)   `utxo.rs:1395`
    Merkle inner hash        = Poseidon arity-2 (width 3)   `utxo.rs:1226`
- Incoming notes: Poseidon-duplex AEAD over the arity-3 permutation
  (`utxo.rs:745-757`); light incoming + outgoing notes: AES-GCM-256 with
  the fixed "random nonce" nonce (`utxo.rs:760-767`, `aes.rs:64`).
- Merkle forest: 256 trees, HEIGHT = 20 (capacity 2^19, path length 18),
  identity leaf hash, Blake2s shard index (`utxo.rs:1282,1296,1319`).

The group generator and the duplexer initial states are protocol parameters
sampled at setup; when the published `manta-parameters` blobs are present we
load them byte-exactly, otherwise we derive deterministic stand-ins.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
import os
from typing import Optional, Tuple

from manta_tpu import fields
from manta_tpu.utils import codec, grain, hostmath

REF_PARAMS_DIR = os.environ.get(
    "MANTA_PARAMS_DIR", "/root/reference/manta-parameters/data/pay/parameters"
)

FR = fields.BN254_FR
EMBEDDED = hostmath.ED_ON_BN254
EMBEDDED_FR = fields.ED_ON_BN254_FR

MERKLE_HEIGHT = 20
FOREST_WIDTH = 256


@functools.lru_cache(maxsize=None)
def poseidon(arity: int) -> grain.PoseidonSpec:
    return grain.poseidon_spec(FR, arity + 1)


def _deterministic_field(tag: str) -> int:
    return (
        int.from_bytes(
            hashlib.blake2s(f"manta-tpu/{tag}".encode()).digest(), "little"
        )
        % FR.modulus
    )


def _read_published(fname: str) -> Optional[bytes]:
    """Read a published parameter blob, verifying its blake3 checksum from
    the repo checkfile (reference `manta-parameters/src/lib.rs:174-177`
    `verify` + `data.checkfile`). A checksum mismatch is a hard error —
    never silently fall back to stand-ins on corrupt data."""
    path = os.path.join(REF_PARAMS_DIR, fname)
    if not os.path.exists(path):
        return None
    blob = open(path, "rb").read()
    checkfile = os.path.join(REF_PARAMS_DIR, "..", "..", "..", "data.checkfile")
    checkfile = os.path.normpath(checkfile)
    if os.path.exists(checkfile):
        from manta_tpu.utils import blake3 as B3

        rel = f"data/pay/parameters/{fname}"
        for line in open(checkfile):
            parts = line.split()
            if len(parts) == 2 and parts[1] == rel:
                if not B3.verify(blob, bytes.fromhex(parts[0])):
                    raise ValueError(
                        f"{fname}: blake3 checksum mismatch with data.checkfile"
                    )
                break
    return blob


def _load_duplex_initial_state(
    fname: str, width: int
) -> Optional[Tuple[int, ...]]:
    """Published duplexer blob = Poseidon params ++ u64 len ++ initial state."""
    blob = _read_published(fname)
    if blob is None:
        return None
    spec = grain.poseidon_spec(FR, width)
    r = codec.Reader(blob)
    keys = r.fields_list(FR, spec.rounds * width)
    mds = r.fields_list(FR, width * width)
    if tuple(keys) != spec.round_keys or tuple(mds) != spec.mds:
        raise ValueError(f"{fname}: Poseidon params mismatch")
    n = r.u64()
    assert n == width, f"{fname}: unexpected initial state length {n}"
    return tuple(r.fields_list(FR, width))


@dataclasses.dataclass(frozen=True)
class MantaPayConfig:
    """All protocol parameters in one place."""

    #: group generator for keys/DH (an ed-on-bn254 point). Production value
    #: comes from `group-generator.dat`.
    group_generator: Tuple[int, int]
    #: duplexer initial state for incoming notes (width 4 = Poseidon3)
    incoming_initial_state: Tuple[int, ...]
    #: scalar bit length used by in-circuit scalar multiplications (the
    #: constraint-field bit width; test configs may shrink it together with
    #: small scalars to keep circuits tiny)
    scalar_bits: int = 254
    merkle_height: int = MERKLE_HEIGHT
    forest_width: int = FOREST_WIDTH

    @property
    def field(self) -> fields.FieldSpec:
        return FR

    @property
    def embedded(self) -> hostmath.EdwardsCurve:
        return EMBEDDED

    @property
    def utxo_commitment(self) -> grain.PoseidonSpec:
        return poseidon(5)

    @property
    def viewing_key_derivation(self) -> grain.PoseidonSpec:
        return poseidon(2)

    @property
    def item_hash(self) -> grain.PoseidonSpec:
        return poseidon(4)

    @property
    def nullifier_commitment(self) -> grain.PoseidonSpec:
        return poseidon(3)

    @property
    def merkle_inner(self) -> grain.PoseidonSpec:
        return poseidon(2)

    @property
    def incoming_permutation(self) -> grain.PoseidonSpec:
        """Duplex permutation = Poseidon arity-3 / width 4
        (`IncomingPoseidonEncryptionScheme = FixedDuplexer<1, Poseidon3>`)."""
        return poseidon(3)

    @property
    def path_length(self) -> int:
        """Number of inner-path levels (reference `tree.rs:227`)."""
        return self.merkle_height - 2

    @property
    def capacity(self) -> int:
        return 1 << (self.merkle_height - 1)


@functools.lru_cache(maxsize=None)
def production() -> MantaPayConfig:
    """Production config; loads published parameters when available."""
    gen_blob = _read_published("group-generator.dat")
    if gen_blob is not None:
        generator = codec.deserialize_edwards_compressed(gen_blob, EMBEDDED)
    else:
        generator = EMBEDDED.scalar_mul(
            _deterministic_field("group-generator") % EMBEDDED_FR.modulus,
            EMBEDDED.generator,
        )
    initial = _load_duplex_initial_state(
        "incoming-base-encryption-scheme.dat", 4
    )
    if initial is None:
        initial = tuple(
            _deterministic_field(f"incoming-initial-state/{i}") for i in range(4)
        )
    return MantaPayConfig(
        group_generator=generator, incoming_initial_state=initial
    )


@functools.lru_cache(maxsize=None)
def test_config(merkle_height: int = 5, scalar_bits: int = 32) -> MantaPayConfig:
    """Small config for fast circuit tests: shallow trees and short scalar
    decompositions (callers must use scalars < 2^scalar_bits)."""
    base = production()
    return MantaPayConfig(
        group_generator=base.group_generator,
        incoming_initial_state=base.incoming_initial_state,
        scalar_bits=scalar_bits,
        merkle_height=merkle_height,
        forest_width=4,
    )
