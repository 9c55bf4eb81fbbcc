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

    Trusted-setup ceremony CLIs (reference `manta-trusted-setup/src/bin/*`):

    python -m manta_tpu.cli ceremony-prepare <dir> [--test-config] [--size N]
        Initialize per-circuit phase-2 states from a fresh phase-1
        accumulator + registry skeleton (reference
        `groth16_phase2_prepare.rs`, `coordinator.rs:446` prepare).

    python -m manta_tpu.cli ceremony-server <dir> [port]
        Serve (or recover) the multi-circuit ceremony over HTTP
        (reference `groth16_phase2_server.rs`, `server.rs:60,118`).

    python -m manta_tpu.cli ceremony-client register <dir> <identity>
        Generate a contributor keypair -> registry line on stdout
        (reference `groth16_phase2_client.rs:46` Register).

    python -m manta_tpu.cli ceremony-client contribute <url> <identity> <keyfile>
        Join the queue and contribute to every circuit when the lock is
        granted (reference `groth16_phase2_client.rs:84` Contribute).

    python -m manta_tpu.cli ceremony-verify <dir>
        Re-verify the full persisted transcript from the initial states
        (reference `groth16_phase2_verifier.rs`).
"""

from __future__ import annotations

import json
import os
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
    # Groth16 shape keys in the canonical binary format (the reference
    # writes proving/verifying contexts via CanonicalSerialize —
    # `manta-crypto/src/arkworks/groth16.rs:216-500`)
    from manta_tpu.utils import keyio

    print("generating Groth16 shape keys (setup)...", flush=True)
    for shape in ("to_private", "private_transfer", "to_public"):
        keys = TX.setup_shape(cfg, shape, seed=0)
        with open(os.path.join(outdir, f"{shape}.keys"), "wb") as f:
            f.write(keyio.shape_keys_to_bytes(keys))
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


# -- ceremony CLIs (reference `manta-trusted-setup/src/bin/*`) --


def cmd_ceremony_prepare(
    outdir: str, test_config: bool, size: int, shapes=None
):
    """Build the initial multi-circuit phase-2 states + an empty registry."""
    from manta_tpu.ceremony import kzg as KZG
    from manta_tpu.ceremony import phase2 as P2
    from manta_tpu.models import circuit as CC
    from manta_tpu.models import pairing as PR
    from manta_tpu.protocol import circuits as TCC

    cfg = CFG.test_config() if test_config else CFG.production()
    os.makedirs(outdir, exist_ok=True)
    acc = KZG.Accumulator.default(PR.BN254_PAIRING, size)
    states = {}
    for shape in shapes or ("to_private", "private_transfer", "to_public"):
        com = CC.R1CS(cfg.field, mode="setup")
        TCC.SHAPES[shape](com, cfg, None)
        matrices, _ = com.finalize()
        print(f"[prepare] {shape}: {matrices.num_constraints} constraints")
        states[shape] = P2.initialize(acc, matrices)
    from manta_tpu.ceremony import server as CS

    with open(os.path.join(outdir, "initial.states"), "wb") as f:
        f.write(CS.rounds_to_bytes(states, []))
    reg_path = os.path.join(outdir, "registry.csv")
    if not os.path.exists(reg_path):
        with open(reg_path, "w") as f:
            f.write("# identity,pubkey_hex,priority\n")
    print(f"[prepare] wrote {outdir}/initial.states and registry.csv")


def cmd_ceremony_server(dirpath: str, port: int):
    from manta_tpu.ceremony import coordinator as CO
    from manta_tpu.ceremony import server as CS

    registry = CO.Registry.from_csv(os.path.join(dirpath, "registry.csv"))
    recovery = os.path.join(dirpath, "rounds")
    if os.path.isdir(recovery) and any(
        f.endswith(".parallel") for f in os.listdir(recovery)
    ):
        coordinator = CS.ParallelCoordinator.recover(recovery, registry)
        print(f"[server] recovered at round {coordinator.round}")
    else:
        with open(os.path.join(dirpath, "initial.states"), "rb") as f:
            states = CS.rounds_from_bytes(f.read())[0]
        coordinator = CS.ParallelCoordinator(
            states, registry, recovery_dir=recovery
        )
    server = CS.CeremonyServer(coordinator, port=port).start()
    print(f"[server] listening on :{server.port} — Ctrl-C to stop")
    try:
        server.thread.join()
    except KeyboardInterrupt:
        server.stop()


def cmd_ceremony_client(args):
    from manta_tpu.ceremony import coordinator as CO
    from manta_tpu.ceremony import server as CS
    from manta_tpu.models import pairing as PR

    mode, *rest = args
    if mode == "register":
        dirpath, identity = rest
        sk, pk = CO.generate_keypair()
        keyfile = os.path.join(dirpath, f"{identity}.key")
        from cryptography.hazmat.primitives import serialization

        with open(keyfile, "wb") as f:
            f.write(
                sk.private_bytes(
                    serialization.Encoding.Raw,
                    serialization.PrivateFormat.Raw,
                    serialization.NoEncryption(),
                )
            )
        print(f"{identity},{pk.hex()},0")
        print(f"[client] key written to {keyfile}; append the line above "
              f"to registry.csv", file=sys.stderr)
        return
    if mode == "contribute":
        import time

        url, identity, keyfile = rest
        from cryptography.hazmat.primitives.asymmetric.ed25519 import (
            Ed25519PrivateKey,
        )

        with open(keyfile, "rb") as f:
            sk = Ed25519PrivateKey.from_private_bytes(f.read())
        client = CS.CeremonyClient(
            url, identity, sk, start_nonce=int(time.time())
        )
        names = client.status()["circuits"]
        sysrandom = random.SystemRandom()
        deltas = {
            n: sysrandom.randrange(1, PR.BN254_PAIRING.g1.scalar_field.modulus)
            for n in names
        }
        client.enqueue()
        while True:
            reply = client.try_contribute(PR.BN254_PAIRING, deltas)
            if reply.get("ok"):
                print(f"[client] contributed at round {reply['round']}")
                return
            if reply.get("ok") is False:
                raise SystemExit(f"contribution rejected: {reply}")
            print(f"[client] queue position {reply.get('position')}; waiting")
            time.sleep(2)
    raise SystemExit(f"unknown ceremony-client mode {mode}")


def cmd_ceremony_verify(dirpath: str) -> bool:
    from manta_tpu.ceremony import coordinator as CO
    from manta_tpu.ceremony import server as CS

    registry = CO.Registry.from_csv(os.path.join(dirpath, "registry.csv"))
    coordinator = CS.ParallelCoordinator.recover(
        os.path.join(dirpath, "rounds"), registry
    )
    with open(os.path.join(dirpath, "initial.states"), "rb") as f:
        initial = CS.rounds_from_bytes(f.read())[0]
    ok = coordinator.verify_full_transcript(initial)
    print(f"[verify] {coordinator.round} rounds: {'OK' if ok else 'FAILED'}")
    return ok


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

        args = [a for a in rest if a != "--wire"]
        actors = int(args[0]) if args else 2
        rounds = int(args[1]) if len(args) > 1 else 6
        runner = (
            SIM.run_simulation_wire if "--wire" in rest else SIM.run_simulation
        )
        result = runner(actors, rounds, verbose=True)
        print(result)
        assert result["conserved"]
    elif cmd == "measure":
        cmd_measure()
    elif cmd == "ceremony-prepare":
        size = 16
        if "--size" in rest:
            size = int(rest[rest.index("--size") + 1])
        shapes = None
        if "--shapes" in rest:
            shapes = rest[rest.index("--shapes") + 1].split(",")
        cmd_ceremony_prepare(rest[0], "--test-config" in rest, size, shapes)
    elif cmd == "ceremony-server":
        port = int(rest[1]) if len(rest) > 1 else 8808
        cmd_ceremony_server(rest[0], port)
    elif cmd == "ceremony-client":
        cmd_ceremony_client(rest)
    elif cmd == "ceremony-verify":
        if not cmd_ceremony_verify(rest[0]):
            return 1
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
