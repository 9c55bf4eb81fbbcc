"""Command-line entry points (the reference's `manta-pay/src/bin/*`).

    python -m manta_tpu.cli generate-parameters <outdir> [--test-config]
        Write all protocol parameter blobs + Groth16 shape keys
        (reference `bin/generate_parameters.rs:37-220`).

    python -m manta_tpu.cli precompute-ledger <outdir> <num_coins>
        Fill a fresh ledger with coins and persist its sync diff
        (reference `bin/precompute_ledger.rs`).

    python -m manta_tpu.cli simulation [actors] [rounds]
        Multi-actor randomized simulation (reference `bin/simulation.rs`).

    python -m manta_tpu.cli measure
        Constraint/variable counts per shape circuit — the reference's
        `Measure`/`Instrument` reporting (`manta-crypto/src/constraint.rs`).
"""

from __future__ import annotations

import json
import os
import pickle
import random
import sys

from manta_tpu.protocol import config as CFG
from manta_tpu.protocol import keys as K
from manta_tpu.protocol import ledger as L
from manta_tpu.protocol import notes as N
from manta_tpu.protocol import rpc as RPC
from manta_tpu.protocol import transfer as TX


def cmd_generate_parameters(outdir: str, test_config: bool = False):
    cfg = CFG.test_config() if test_config else CFG.production()
    os.makedirs(outdir, exist_ok=True)
    fr = cfg.field
    # Poseidon parameter blobs, byte-compatible with manta-parameters
    blobs = {
        "viewing-key-derivation-function.dat": cfg.viewing_key_derivation,
        "nullifier-commitment-scheme.dat": cfg.nullifier_commitment,
        "utxo-accumulator-item-hash.dat": cfg.item_hash,
        "utxo-commitment-scheme.dat": cfg.utxo_commitment,
    }
    for fname, spec in blobs.items():
        data = b"".join(
            codec.serialize_field(x, fr)
            for x in list(spec.round_keys) + list(spec.mds) + [spec.domain_tag]
        )
        open(os.path.join(outdir, fname), "wb").write(data)
    # group generator
    from manta_tpu.utils import hostmath

    open(os.path.join(outdir, "group-generator.dat"), "wb").write(
        codec.serialize_edwards_compressed(cfg.group_generator, hostmath.ED_ON_BN254)
    )
    # incoming duplexer: permutation params + u64 len + initial state
    perm = cfg.incoming_permutation
    dup = b"".join(
        codec.serialize_field(x, fr)
        for x in list(perm.round_keys) + list(perm.mds)
    )
    dup += (4).to_bytes(8, "little")
    dup += b"".join(
        codec.serialize_field(x, fr) for x in cfg.incoming_initial_state
    )
    open(
        os.path.join(outdir, "incoming-base-encryption-scheme.dat"), "wb"
    ).write(dup)
    # Groth16 shape keys (pickled; arkworks-format export is the widening path)
    print("generating Groth16 shape keys (setup)...", flush=True)
    for shape in ("to_private", "private_transfer", "to_public"):
        keys = TX.setup_shape(cfg, shape, seed=0)
        with open(os.path.join(outdir, f"{shape}.keys"), "wb") as f:
            pickle.dump(keys, f)
        print(
            f"  {shape}: {keys.matrices.num_constraints} constraints, "
            f"domain {keys.pk.domain_size}",
            flush=True,
        )
    print(f"parameters written to {outdir}")


def cmd_precompute_ledger(outdir: str, num_coins: int, test_config: bool = True):
    cfg = CFG.test_config() if test_config else CFG.production()
    os.makedirs(outdir, exist_ok=True)
    rng = random.Random(0)
    keys = {"to_private": TX.setup_shape(cfg, "to_private", seed=0)}
    ledger = L.Ledger(cfg, keys)
    for i in range(num_coins):
        sk = rng.randrange(1, 1 << 31)
        addr = K.address_from_spending_key(cfg, sk)
        ledger.deposit(f"actor{i}", 1, 1000)
        post = TX.build_to_private(
            cfg,
            keys["to_private"],
            addr,
            N.Asset(1, rng.randrange(1, 500)),
            esk=rng.randrange(1, 1 << 31),
            randomness=rng.randrange(CFG.FR.modulus),
        )
        ledger.post(post, source_accounts=[f"actor{i}"])
        if (i + 1) % 10 == 0:
            print(f"  {i + 1}/{num_coins} coins", flush=True)
    diff = ledger.pull(L.Checkpoint.origin(cfg))
    with open(os.path.join(outdir, "ledger.json"), "w") as f:
        json.dump(RPC.encode_pull(diff), f)
    print(f"ledger with {num_coins} coins written to {outdir}/ledger.json")


def cmd_measure():
    """Per-shape constraint accounting (reference `Instrument`)."""
    for name, cfg in (("test", CFG.test_config()), ("production", CFG.production())):
        print(f"[{name} config]")
        for shape in ("to_private", "private_transfer", "to_public"):
            from manta_tpu.models import circuit as CC
            from manta_tpu.protocol import circuits as TCC

            com = CC.R1CS(cfg.field, mode="setup")
            TCC.SHAPES[shape](com, cfg, None)
            matrices, _ = com.finalize()
            print(
                f"  {shape:18s} constraints={matrices.num_constraints:7d} "
                f"instance={matrices.num_instance:4d} "
                f"witness={matrices.num_witness:7d}"
            )
            for label, dc, dw in com.measurements:
                print(f"      {label:14s} +{dc} constraints, +{dw} witnesses")


def main(argv):
    if not argv:
        print(__doc__)
        return 1
    cmd, *rest = argv
    if cmd == "generate-parameters":
        cmd_generate_parameters(rest[0], "--test-config" in rest)
    elif cmd == "precompute-ledger":
        cmd_precompute_ledger(rest[0], int(rest[1]) if len(rest) > 1 else 10)
    elif cmd == "simulation":
        from manta_tpu.protocol import simulation as SIM

        actors = int(rest[0]) if rest else 2
        rounds = int(rest[1]) if len(rest) > 1 else 6
        result = SIM.run_simulation(actors, rounds, verbose=True)
        print(result)
        assert result["conserved"]
    elif cmd == "measure":
        cmd_measure()
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
