"""Measure the device-resident Groth16 prover on the production circuits.

Runs on the attached TPU: builds the production MantaPay ToPrivate
circuit, derives keys (host setup — the published proving keys are LFS
stubs), and times the DeviceProver end to end:

- single-proof latency, both split-dispatch and monolithic one-program
  paths;
- proofs/sec for a batch (BASELINE config 5, single chip).

Every proof is verified with the host pairing before a number is
reported. Round-1 baseline to beat: 18.3 s/proof ToPrivate
(host-roundtripping prover); reference CPU figure ~1 s
(`ark_groth16::prove`, `manta-crypto/src/arkworks/groth16.rs:589`).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("MANTA_TPU_PALLAS", "1")
sys.path.insert(0, "/root/repo")

import jax

from manta_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

import random

from manta_tpu.models import circuit as CC
from manta_tpu.models import groth16 as G
from manta_tpu.models import groth16_device as GD
from manta_tpu.protocol import circuits as TC
from manta_tpu.protocol import config as CFG
from manta_tpu.protocol import keys as K
from manta_tpu.protocol import transfer as TX
from manta_tpu.protocol import notes as N

WINDOW = int(os.environ.get("PROVER_WINDOW", "13"))
BATCH = int(os.environ.get("PROVER_BATCH", "4"))
BACKEND = os.environ.get("PROVER_BACKEND", "fused")
SHAPE = os.environ.get("PROVER_SHAPE", "to_private")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def witness_for(cfg, rng, i):
    """Production ToPrivate witness via the protocol builders."""
    address = K.AuthorizationContext(
        proof_authorization_key=K.proof_authorization_key(cfg, 1234 + i)
    ).compute_receiving_key(cfg)
    asset = N.Asset(3, 50 + i)
    receiver = TC.make_receiver(
        cfg,
        address,
        rng.randrange(1, CFG.EMBEDDED_FR.modulus),
        rng.randrange(CFG.FR.modulus),
        asset,
    )
    data = {
        "asset_id": asset.id,
        "source_value": asset.value,
        "receiver": receiver,
    }
    com = CC.R1CS(cfg.field, mode="prove")
    TC.SHAPES["to_private"](com, cfg, data)
    matrices, assignment = com.finalize()
    assert matrices.is_satisfied(assignment)
    public = assignment[1 : matrices.num_instance]
    return assignment, public


def spend_witness_for(cfg, rng, i, shape):
    """Production PrivateTransfer / ToPublic witness: two owned coins in a
    fresh forest, spent to two receivers (or one receiver + public sink)."""
    from manta_tpu.protocol import merkle as MK
    from manta_tpu.protocol import utxo as U

    sk = rng.randrange(1, CFG.EMBEDDED_FR.modulus)
    context = K.AuthorizationContext(
        proof_authorization_key=K.proof_authorization_key(cfg, sk)
    )
    rk = context.compute_receiving_key(cfg)
    forest = MK.MerkleForest(cfg)
    senders = []
    for j in range(2):
        pt = N.IncomingPlaintext(
            utxo_commitment_randomness=rng.randrange(cfg.field.modulus),
            asset=N.Asset(3, 60 + i + j),
        )
        secret = U.SpendSecret(
            outgoing_ephemeral_secret_key=rng.randrange(
                1, CFG.EMBEDDED_FR.modulus
            ),
            plaintext=pt,
        )
        utxo = secret.utxo(cfg, rk)
        item = U.item_hash(cfg, utxo)
        proof = forest.insert_item(item)
        senders.append(
            TX.make_sender(
                cfg, context, pt, forest, proof.shard, proof.index,
                outgoing_esk=secret.outgoing_ephemeral_secret_key,
            )
        )
    auth = K.Authorization.from_spending_key(
        cfg, sk, rng.randrange(1, CFG.EMBEDDED_FR.modulus)
    )
    address = K.address_from_spending_key(cfg, sk)
    total = sum(s.secret.plaintext.asset.value for s in senders)

    def receiver(value):
        return TC.make_receiver(
            cfg,
            address,
            rng.randrange(1, CFG.EMBEDDED_FR.modulus),
            rng.randrange(cfg.field.modulus),
            N.Asset(3, value),
        )

    if shape == "private_transfer":
        data = {
            "authorization": auth,
            "senders": senders,
            "receivers": [receiver(total - 10), receiver(10)],
        }
    else:  # to_public: one receiver keeps change, rest exits to a sink
        data = {
            "asset_id": 3,
            "sink_value": 10,
            "authorization": auth,
            "senders": senders,
            "receiver": receiver(total - 10),
        }
    com = CC.R1CS(cfg.field, mode="prove")
    TC.SHAPES[shape](com, cfg, data)
    matrices, assignment = com.finalize()
    assert matrices.is_satisfied(assignment)
    public = assignment[1 : matrices.num_instance]
    return assignment, public


def main():
    log(f"devices: {jax.devices()}")
    cfg = CFG.production()
    rng = random.Random(99)

    log(f"[prover] building production {SHAPE} keys (host setup) ...")
    t0 = time.time()
    keys = TX.setup_shape(cfg, SHAPE, seed=77)
    log(
        f"[prover] setup: {time.time() - t0:.1f}s "
        f"({keys.matrices.num_constraints} constraints, "
        f"domain {keys.pk.domain_size})"
    )

    if SHAPE == "to_private":
        cases = [witness_for(cfg, rng, i) for i in range(BATCH)]
    else:
        cases = [spend_witness_for(cfg, rng, i, SHAPE) for i in range(BATCH)]
    log(f"[prover] {BATCH} witnesses built")

    t0 = time.time()
    prover = GD.DeviceProver(
        keys.pk, keys.matrices, backend=BACKEND, window_bits=WINDOW
    )
    log(
        f"[prover] init (encode queries): {time.time() - t0:.1f}s "
        f"(n_ab={prover.n_ab}, n_lh={prover.n_lh})"
    )

    # --- split-dispatch single proof ---
    t0 = time.time()
    proof = prover.prove(cases[0][0], r_rand=7, s_rand=9)
    log(f"[prover] split path compile+first proof: {time.time() - t0:.1f}s")
    assert G.verify(keys.vk, proof, cases[0][1]), "proof did not verify"
    log("[prover] verify: PASS")
    times = []
    for i in range(3):
        t0 = time.time()
        proof = prover.prove(cases[0][0], r_rand=5 + i, s_rand=3 + i)
        times.append(time.time() - t0)
        log(f"[prover] split warm rep {i}: {times[-1]:.3f}s")
    split_best = min(times)

    # --- batched throughput (single chip) ---
    t0 = time.time()
    proofs = prover.prove_batch(
        [a for a, _ in cases], rands=[(i + 1, i + 2) for i in range(BATCH)]
    )
    batch_t = time.time() - t0
    for p, (_, pub) in zip(proofs, cases):
        assert G.verify(keys.vk, p, pub)
    log(
        f"[prover] batch of {BATCH}: {batch_t:.2f}s = "
        f"{BATCH / batch_t:.3f} proofs/s (all verified)"
    )

    print(
        {
            "shape": SHAPE,
            f"{SHAPE}_split_s": round(split_best, 3),
            "proofs_per_s_batch": round(BATCH / batch_t, 4),
        },
        flush=True,
    )


if __name__ == "__main__":
    main()
