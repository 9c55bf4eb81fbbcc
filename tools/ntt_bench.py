"""NTT throughput on the attached TPU (BASELINE config 2).

Times coset NTT / iNTT over BLS12-381 Fr at 2^16-2^20, verified against
the host big-int evaluation at the smallest size. Prints one JSON line
per (size, variant).

Usage: python tools/ntt_bench.py [log2_sizes...]   (default 16 18 20)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from manta_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from manta_tpu import fields
from manta_tpu.ops import field_ops as F
from manta_tpu.ops import ntt as NTT


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [16, 18, 20]
    spec = fields.BLS12_381_FR
    rng = np.random.default_rng(7)
    log(f"devices: {jax.devices()}")

    # tables ride as device-resident ARGUMENTS: baked-constant tables at
    # 2^20 are ~1.4 GB of HLO, which the relay request path cannot carry
    def coset_fwd(spec, a, pw, perm, partner, hi, tw):
        return NTT.ntt_with_tables(
            spec, F.mont_mul(spec, a, pw), perm, partner, hi, tw, False
        )

    def coset_inv(spec, a, pw, perm, partner, hi, tw):
        x = NTT.ntt_with_tables(spec, a, perm, partner, hi, tw, True)
        return F.mont_mul(spec, x, pw)

    jfwd = jax.jit(coset_fwd, static_argnums=(0,))
    jinv = jax.jit(coset_inv, static_argnums=(0,))

    for log2n in sizes:
        n = 1 << log2n
        vals = [int(x) for x in rng.integers(0, 1 << 63, n)]
        a = jnp.asarray(F.encode_ints(spec, vals))
        pw_f = jnp.asarray(NTT._coset_powers(spec, n, False))
        pw_i = jnp.asarray(NTT._coset_powers(spec, n, True))
        tf = NTT.device_tables(spec, n, False)
        ti = NTT.device_tables(spec, n, True)

        def fwd(x):
            return jfwd(spec, x, pw_f, *tf)

        def inv(x):
            return jinv(spec, x, pw_i, *ti)

        t0 = time.time()
        ev = fwd(a)
        jax.block_until_ready(ev)
        compile_s = time.time() - t0
        # round-trip correctness on device
        back = inv(ev)
        np.testing.assert_array_equal(
            np.asarray(F.normalize(spec, back)),
            np.asarray(F.normalize(spec, a)),
        )
        if log2n == sizes[0]:
            # host oracle: lane 0 of the coset NTT evaluates f at the
            # coset shift g (g * omega^0); decode_ints leaves Montgomery
            r, g = spec.modulus, spec.generator
            got0 = F.decode_ints(spec, ev[:, :1])[0]
            acc, xp = 0, 1
            for v in vals:
                acc = (acc + v * xp) % r
                xp = xp * g % r
            assert got0 == acc, "coset NTT lane 0 mismatch vs host"
            log(f"[ntt] host oracle check at 2^{log2n}: OK")
        times = {"ntt": [], "intt": []}
        for _ in range(3):
            t0 = time.time()
            out = fwd(a)
            jax.device_get(out.block_until_ready()[0, :1])
            times["ntt"].append(time.time() - t0)
            t0 = time.time()
            out = inv(ev)
            jax.device_get(out.block_until_ready()[0, :1])
            times["intt"].append(time.time() - t0)
        for variant in ("ntt", "intt"):
            best = min(times[variant])
            print(
                json.dumps(
                    {
                        "metric": f"coset_{variant}_bls12_381_fr_2pow{log2n}",
                        "seconds": round(best, 4),
                        "melems_per_s": round(n / best / 1e6, 2),
                        "compile_s": round(compile_s, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
