"""Microbenchmark suite mirroring `manta-benchmark` (Criterion benches).

Covers the reference's benchmark matrix (`manta-benchmark/benches/`):
crypto.rs (Poseidon hash, AES-GCM decrypt), ecc.rs (point add variants,
scalar mul, 2^16 batch normalization), and the per-shape prove/verify
benches — on whatever backend `jax.devices()` provides.

Run: `python benchmarks.py [--device]`. Prints a table; `bench.py` remains
the driver's single-JSON-line entry point.
"""

from __future__ import annotations

import os
import sys
import time

if "--device" not in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if jax.config.jax_platforms not in (None, "cpu") and "--device" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    from jax.extend.backend import clear_backends

    clear_backends()

from manta_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

import random

import jax.numpy as jnp

ROWS = []


def fetch(x):
    """Value fetch: the only trustworthy completion barrier through the
    TPU relay (block_until_ready can return early for pure-XLA programs)."""
    import jax

    return jax.device_get(jax.tree.leaves(x)[0])


def bench(name, fn, reps=3, warmup=1):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    best = min(times)
    ROWS.append((name, best))
    print(f"{name:55s} {best * 1e3:10.3f} ms", flush=True)


def main():
    rng = random.Random(7)
    from manta_tpu.ops import curve as C
    from manta_tpu.ops import field_ops as F
    from manta_tpu.ops import poseidon as P
    from manta_tpu.protocol import config as CFG
    from manta_tpu.protocol import keys as K
    from manta_tpu.protocol import notes as N
    from manta_tpu.utils import hostmath

    print(f"backend: {jax.devices()[0].platform}", flush=True)

    # -- crypto.rs: Poseidon-2 hash (batched device) --
    spec = P.production_spec(2)
    fr = spec.field
    batch = 4096
    inputs = jnp.asarray(
        F.encode_ints(fr, [rng.randrange(fr.modulus) for _ in range(2 * batch)])
    ).reshape(fr.num_limbs, 2, batch).transpose(1, 0, 2)
    out = P.hash_jit(spec, inputs)  # compile
    jax.block_until_ready(out)
    bench(
        f"poseidon-2 hash x{batch} (device)",
        lambda: fetch(P.hash_jit(spec, inputs)),
    )

    # -- crypto.rs: AES-GCM decrypt (host) --
    cfg = CFG.production()
    sk = rng.randrange(1, CFG.EMBEDDED_FR.modulus)
    addr = K.address_from_spending_key(cfg, sk)
    vk = K.viewing_key(cfg, K.proof_authorization_key(cfg, sk))
    pt = N.IncomingPlaintext(
        utxo_commitment_randomness=1, asset=N.Asset(1, 2)
    )
    light = N.encrypt_light(cfg, addr, 12345, pt)
    bench("aes-gcm light note decrypt (host)", lambda: N.decrypt_light(cfg, vk, light))
    note = N.encrypt_incoming(cfg, addr, 12345, pt)
    bench("poseidon duplex note decrypt (host)", lambda: N.decrypt_incoming(cfg, vk, note))

    # -- ecc.rs: BLS12-381 G1 adds / scalar mul / batch normalization --
    curve = hostmath.BLS12_381_G1
    ops = C.curve_ops_for(curve)
    n = 1 << 12 if "--device" in sys.argv else 1 << 9
    pts_host = [curve.scalar_mul(k + 1, curve.generator) for k in range(64)] * (n // 64)
    pts = ops.encode_points(pts_host)
    add_j = jax.jit(ops.add)
    jax.block_until_ready(add_j(pts, pts))
    bench(
        f"g1 point add x{n} (device)",
        lambda: fetch(add_j(pts, pts)),
    )
    dbl_j = jax.jit(ops.double)
    jax.block_until_ready(dbl_j(pts))
    bench(
        f"g1 point double x{n} (device)",
        lambda: fetch(dbl_j(pts)),
    )
    scalars = jnp.asarray(
        F.encode_ints(
            curve.scalar_field,
            [rng.randrange(curve.scalar_field.modulus) for _ in range(n)],
            montgomery=False,
        )
    )
    if "--device" in sys.argv:  # multi-minute compile on CPU; TPU only
        smul_j = jax.jit(ops.scalar_mul)
        fetch(smul_j(scalars, pts))
        bench(
            f"g1 scalar mul x{n} (device)",
            lambda: fetch(smul_j(scalars, pts)),
        )
    aff_j = jax.jit(ops.to_affine)
    jax.block_until_ready(aff_j(pts))
    bench(
        f"g1 batch normalization x{n} (device)",
        lambda: fetch(aff_j(pts)),
    )
    bench(
        "g1 affine add (host)",
        lambda: curve.add(pts_host[0], pts_host[1]),
        reps=5,
    )
    bench(
        "g1 scalar mul (host)",
        lambda: curve.scalar_mul(12345678901234567890, pts_host[0]),
        reps=5,
    )

    # -- to_private.rs-style: prove/verify on the test config (host backend) --
    from manta_tpu.protocol import transfer as TX

    cfg_t = CFG.test_config()
    keys = TX.setup_shape(cfg_t, "to_private", seed=1)

    def prove_once():
        TX.build_to_private(
            cfg_t,
            keys,
            K.address_from_spending_key(cfg_t, 12345),
            N.Asset(1, 9),
            esk=rng.randrange(1, 1 << 31),
            randomness=rng.randrange(CFG.FR.modulus),
        )

    bench("groth16 to_private prove (test cfg, host)", prove_once, reps=2, warmup=0)
    post = TX.build_to_private(
        cfg_t, keys, K.address_from_spending_key(cfg_t, 12345), N.Asset(1, 9),
        esk=54321, randomness=999,
    )
    bench(
        "groth16 to_private verify (host pairing)",
        lambda: TX.verify_post(cfg_t, keys, post),
        reps=2,
        warmup=0,
    )

    print("\nsummary:")
    for name, best in ROWS:
        print(f"  {name}: {best * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
