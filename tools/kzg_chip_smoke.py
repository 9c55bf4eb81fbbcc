"""KZG phase-1 chip smoke at production-adjacent scale.

Runs `ceremony.kzg.contribute(backend="device")` at 2^16 G2 powers
(2^17-1 G1 powers — the reference ceremony's actual size bracket,
`ceremony/config/ppot.rs:698-699` G2_POWERS = 2^17) on the attached TPU,
then `verify_transform` with the constant-pairing-count RLC checks, and
spot-checks powers against host bignum ground truth.

Usage: python tools/kzg_chip_smoke.py [log2_size]   (default 16)
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from manta_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

import copy

from manta_tpu.ceremony import kzg as KZG
from manta_tpu.models import pairing as PR


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    log2_size = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = 1 << log2_size
    cfg = PR.BN254_PAIRING
    r = cfg.g1.scalar_field.modulus

    t0 = time.time()
    acc = KZG.Accumulator.default(cfg, size)
    prev = copy.deepcopy(acc)
    log(f"[kzg] default accumulator 2^{log2_size}: {time.time() - t0:.1f}s")

    tau, alpha, beta = 0xA11CE, 0xB0B, 0xC0DE
    t0 = time.time()
    contribution = KZG.contribute(acc, tau, alpha, beta, nonce=7, backend="device")
    t_contribute = time.time() - t0
    log(f"[kzg] device contribute ({2 * size - 1} G1 + {size} G2 + "
        f"2x{size} G1 powers): {t_contribute:.1f}s")

    # spot-check against host ground truth
    t0 = time.time()
    for i in (1, 7, size - 1, 2 * size - 2):
        want = cfg.g1.scalar_mul(pow(tau, i, r), cfg.g1.generator)
        assert acc.tau_powers_g1[i] == want, f"tau_g1[{i}] mismatch"
    assert acc.tau_powers_g2[3] == cfg.g2.scalar_mul(
        pow(tau, 3, r), cfg.g2.generator
    )
    assert acc.alpha_tau_powers_g1[5] == cfg.g1.scalar_mul(
        alpha * pow(tau, 5, r) % r, cfg.g1.generator
    )
    log(f"[kzg] host spot-checks: {time.time() - t0:.1f}s")

    t0 = time.time()
    ok = KZG.verify_transform(prev, acc, contribution, rng=random.SystemRandom())
    t_verify = time.time() - t0
    assert ok, "verify_transform rejected an honest contribution"
    log(f"[kzg] verify_transform (constant pairing count): {t_verify:.1f}s")
    print(
        {
            "log2_size": log2_size,
            "contribute_s": round(t_contribute, 1),
            "verify_s": round(t_verify, 1),
        },
        flush=True,
    )


if __name__ == "__main__":
    main()
