"""Build the disk cache for bench.py's Groth16 PrivateTransfer stage.

Runs the minutes-long host work ONCE (production circuit compile, host
setup keygen, witness construction, query-point encoding) and dumps:

- `.bench_prover_pt.npz` — encoded DeviceProver state
  (`DeviceProver.save_cache`)
- `.bench_prover_pt_aux.npz` — witness assignments, public inputs, and
  the canonical VerifyingKey bytes (`utils.keyio`)

so the driver's cold bench process only loads arrays and runs the device
pipeline. Deterministic: seed 77 keys, seeded witnesses.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

# CPU is fine (and preferred): encoding is numpy, no device programs run
os.environ.setdefault("JAX_PLATFORMS", "cpu")


from manta_tpu.models import groth16_device as GD
from manta_tpu.protocol import config as CFG
from manta_tpu.protocol import transfer as TX
from manta_tpu.utils import keyio

WINDOW = int(os.environ.get("PROVER_WINDOW", "13"))
BATCH = int(os.environ.get("PROVER_BATCH", "4"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import random

    from measure_prover import spend_witness_for

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = CFG.production()
    rng = random.Random(99)

    t0 = time.time()
    log("[cache] building production private_transfer keys (host setup)...")
    keys = TX.setup_shape(cfg, "private_transfer", seed=77)
    log(f"[cache] setup: {time.time() - t0:.1f}s "
        f"({keys.matrices.num_constraints} constraints, "
        f"domain {keys.pk.domain_size})")

    t0 = time.time()
    cases = [
        spend_witness_for(cfg, rng, i, "private_transfer")
        for i in range(BATCH)
    ]
    log(f"[cache] {BATCH} witnesses: {time.time() - t0:.1f}s")

    t0 = time.time()
    prover = GD.DeviceProver(
        keys.pk, keys.matrices, backend="fused", window_bits=WINDOW
    )
    log(f"[cache] prover encode: {time.time() - t0:.1f}s "
        f"(n_ab={prover.n_ab}, n_lh={prover.n_lh})")

    prover.save_cache(os.path.join(root, ".bench_prover_pt.npz"))
    # decimal-string JSON for the witnesses (no pickle anywhere near the
    # bench path), canonical binary for the verifying key
    aux_json = {
        "assignments": [[str(x) for x in a] for a, _ in cases],
        "publics": [[str(x) for x in p] for _, p in cases],
    }
    with open(os.path.join(root, ".bench_prover_pt_aux.json"), "w") as f:
        json.dump(aux_json, f)
    with open(os.path.join(root, ".bench_prover_pt_vk.bin"), "wb") as f:
        f.write(keyio.vk_to_bytes(keys.vk))
    size = os.path.getsize(os.path.join(root, ".bench_prover_pt.npz"))
    log(f"[cache] written (.npz {size/1e6:.0f} MB + aux json + vk)")


if __name__ == "__main__":
    main()
