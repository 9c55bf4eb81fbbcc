"""Benchmark harness: MSM + Groth16 throughput on the attached TPU chip.

Prints one JSON line per metric:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North-star metrics (BASELINE.json):
1. variable-base MSM Mpoints/s/chip on BLS12-381 G1 at 2^20 points.
   `vs_baseline` is measured against a nominal single-core arkworks
   Pippenger throughput of 0.55 Mpoints/s (ark-ec 0.3, ~1.9 s for a 2^20
   BLS12-381 G1 MSM on a modern x86 core — the reference publishes no
   numbers, see BASELINE.md).
2. Groth16 PrivateTransfer proofs/s (production circuit, 35674
   constraints, domain 2^16; every proof host-pairing-verified against
   the cached verifying key). Runs only if the MSM stage leaves enough
   of the driver's time budget (MANTA_BENCH_BUDGET_S, default 560 s) and
   the committed prover cache (`tools/build_bench_prover_cache.py`)
   exists; it executes in a child process with a hard deadline so a
   slow-compile session can never time the whole bench out. Baseline
   0.5 proofs/s ≈ single-core ark-groth16 (6 size-2^16 NTTs + ~5 MSMs
   of 2^16-2^17 ≈ 2 s/proof on a modern x86 core).

Env overrides: MANTA_BENCH_N (log2 point count, default tries 20 then
smaller), MANTA_BENCH_REPS (default 3), MANTA_BENCH_WINDOW (default 16),
MANTA_BENCH_BUDGET_S (total bench deadline), MANTA_BENCH_GROTH16=0
(skip stage 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

# Pallas field kernels keep the compiled graph small enough for the TPU
# compiler; the persistent cache makes repeat bench runs start instantly.
os.environ.setdefault("MANTA_TPU_PALLAS", "1")
import jax  # noqa: E402

from manta_tpu.utils.jaxcache import enable_compile_cache  # noqa: E402

enable_compile_cache()

ARKWORKS_SINGLE_CORE_MPOINTS_S = 0.55


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def random_scalar_limbs(spec, n, seed=0):
    """Uniform-ish scalars < p as (L, n) uint32 16-bit limbs (numpy-fast)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    L = spec.num_limbs
    out = np.zeros((L, n), dtype=np.uint32)
    top_bits = spec.bits - 16 * (spec.bits // 16) or 16
    top_limb_index = (spec.bits - 1) // 16
    for i in range(L):
        if i < top_limb_index:
            out[i] = rng.integers(0, 1 << 16, n, dtype=np.uint32)
        elif i == top_limb_index:
            # keep below the modulus top limb to guarantee < p
            top = int(spec.modulus >> (16 * top_limb_index))
            out[i] = rng.integers(0, max(top, 1), n, dtype=np.uint32)
    return out


def run_msm_bench(log2n: int, reps: int, window_bits: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from manta_tpu.ops import curve as C
    from manta_tpu.ops import msm as M
    from manta_tpu.ops.curve import JacobianPoint
    from manta_tpu.utils import hostmath

    curve = hostmath.BLS12_381_G1
    backend = os.environ.get("MANTA_BENCH_BACKEND", "fused")
    if backend == "rns_annotated":
        cops = C.rns_curve_ops_for(curve)
    else:
        cops = C.curve_ops_for(curve, backend)
    # rns_hybrid keeps the point arrays limb-encoded: build the distinct
    # point set with the limb fused ops (identical encoding), then run the
    # MSM itself through the hybrid backend
    build_cops = (
        C.curve_ops_for(curve, "fused") if backend == "rns_hybrid" else cops
    )
    log(f"[bench] curve backend: {backend}")
    n = 1 << log2n

    log(f"[bench] devices: {jax.devices()}")
    # pay the (highly variable: 80-600s measured) axon session init + one
    # trivial remote compile up front, so later stage timings are honest
    t0 = time.time()
    jax.block_until_ready(jax.jit(lambda a: a + 1)(jnp.zeros((8, 128))))
    log(f"[bench] session init + warmup compile: {time.time() - t0:.1f}s")
    # ALL-DISTINCT points: P[i,j] = (i+1)G + 256(j+1)G (tiled duplicate
    # points would force the kernels' doubling branch, which real query
    # points never hit). The affine limb arrays are cached on disk: the
    # axon relay pays a full REMOTE compile for every process (no
    # cross-process executable reuse — 12 distinct jit_build/jit_msm cache
    # dirs from identical programs), so the driver's cold bench run must
    # not compile the builder program at all.
    cache_file = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f".bench_points_2pow{log2n}.npz",
    )
    if os.path.exists(cache_file) and backend != "rns_annotated":
        log(f"[bench] loading {n} cached points ({cache_file}) ...")
        data = np.load(cache_file)
        pts = JacobianPoint(
            jnp.asarray(data["x"]), jnp.asarray(data["y"]), jnp.asarray(data["z"])
        )
    else:
        # host-side sequential build: (i+1)*G for i in [0, n) — ~40us per
        # affine add, ~45s at 2^20, and ZERO device programs to compile
        log(f"[bench] building {n} distinct points on host ...")
        t0 = time.time()
        g = curve.generator
        host_pts = []
        acc = g
        for _ in range(n):
            host_pts.append(acc)
            acc = curve.add(acc, g)
        log(f"[bench] host build: {time.time() - t0:.1f}s; encoding ...")
        enc = build_cops.encode_points(host_pts)
        pts = JacobianPoint(enc.x, enc.y, enc.z)
        try:
            np.savez(
                cache_file,
                x=np.asarray(pts.x),
                y=np.asarray(pts.y),
                z=np.asarray(pts.z),
            )
            log(f"[bench] cached points to {cache_file}")
        except Exception as e:  # noqa: BLE001 — cache is best-effort
            log(f"[bench] point cache write failed: {e}")
    sc_np = random_scalar_limbs(curve.scalar_field, n)
    scalars = jnp.asarray(sc_np)
    sbits = curve.scalar_field.bits

    # GLV endomorphism path (BLS12-381 + fused backend): halves the
    # window count via 2N half-length scalars. Measured SLOWER than the
    # standard path at 2^20 (2.118 s vs 1.879 s same session: the
    # column/bucket work is windows x lanes = constant under GLV, and
    # the in-program phi-prep + double-width sort outweigh the halved
    # reduce/horner) — default OFF, kept for single-scalar-mul use and
    # the oracle-checked GLV test path.
    use_glv = (
        os.environ.get("MANTA_BENCH_GLV", "0") == "1"
        and backend == "fused"
        and curve.name == "bls12_381_g1"
    )
    if use_glv:
        t0 = time.time()
        abs2, neg2 = M.glv_decompose(curve, sc_np)
        log(f"[bench] GLV decomposition (C kernel): {time.time() - t0:.2f}s")
        abs2_d = jnp.asarray(abs2)
        neg2_d = jnp.asarray(neg2)

        def run_once():
            return M.msm_glv_device(
                cops, abs2_d, neg2_d, pts.x, pts.y, pts.z, window_bits, 128
            )
    else:

        def run_once():
            return M.msm_jit(
                cops, scalars, pts, window_bits, False, 128, sbits, True
            )

    log(f"[bench] compiling MSM (2^{log2n}, window {window_bits}, signed"
        f"{', glv' if use_glv else ''}) ...")
    t0 = time.time()
    result = run_once()
    jax.block_until_ready(result)
    log(f"[bench] compile+first run: {time.time() - t0:.1f}s")

    # correctness gate: points are (i+1)*G, so the true result is
    # (sum (i+1)*s_i mod r) * G — one host scalar-mul. Per-limb dot
    # products fit uint64 (limb < 2^16, weight <= 2^20, n = 2^20 sum
    # < 2^56), so the whole check is L vectorized dots, not object math.
    # (With GLV this also gates the decomposition + phi-point path: any
    # decomposition bug shifts the result.)
    sc_np = np.asarray(sc_np)
    r_mod = curve.scalar_field.modulus
    total = 0
    if 16 + 2 * log2n < 64:
        # uint64 dots are exact: limb < 2^16, weight <= 2^log2n, 2^log2n
        # terms -> sum < 2^(16 + 2*log2n)
        weights = np.arange(1, n + 1, dtype=np.uint64)
        for i in range(sc_np.shape[0]):
            dot = int(np.dot(sc_np[i].astype(np.uint64), weights))
            total += dot << (16 * i)
    else:
        # 2^24+ points would overflow the uint64 dot: chunk the weighted
        # sums so each partial stays exact, accumulate in Python ints
        chunk = 1 << 20
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            weights = np.arange(lo + 1, hi + 1, dtype=np.uint64)
            for i in range(sc_np.shape[0]):
                dot = int(np.dot(sc_np[i, lo:hi].astype(np.uint64), weights))
                total += dot << (16 * i)
    total %= r_mod
    expected = curve.scalar_mul(total, curve.generator)
    got = cops.decode_points(
        type(pts)(result.x, result.y, result.z)
    )[0]
    if got != expected:
        raise AssertionError("MSM result mismatch vs host ground truth")
    log("[bench] result verified against host ground truth")

    times = []
    for r in range(reps):
        t0 = time.time()
        result = run_once()
        # fetch (not just block): through the axon relay, block_until_ready
        # can return before pure-XLA programs actually execute — a value
        # fetch is the only trustworthy completion barrier
        jax.device_get(result.x)
        times.append(time.time() - t0)
        log(f"[bench] rep {r}: {times[-1]:.3f}s")
    best = min(times)
    return n / best / 1e6, n, best


ARKWORKS_SINGLE_CORE_PT_PROOFS_S = 0.5

T_START = time.time()


def run_groth16_stage():
    """Child-process body: production PrivateTransfer proofs/s from the
    committed prover cache. Prints its own JSON metric line."""
    from manta_tpu.models import groth16 as G
    from manta_tpu.models.groth16_device import DeviceProver
    from manta_tpu.utils import keyio

    root = os.path.dirname(os.path.abspath(__file__))
    t0 = time.time()
    prover = DeviceProver.from_cache(os.path.join(root, ".bench_prover_pt.npz"))
    # one compiled G1 MSM program (a/b1 padded into the lh shape): each
    # cold remote compile of the big MSM body costs minutes on the relay.
    # MANTA_BENCH_G16_SHARE=0 trades +94 s of compile for ~20% better
    # steady-state proofs/s (unpadded a/b1 MSMs).
    prover.share_g1_shapes = os.environ.get("MANTA_BENCH_G16_SHARE", "1") == "1"
    with open(os.path.join(root, ".bench_prover_pt_aux.json")) as f:
        aux = json.load(f)
    vk = keyio.vk_from_bytes(
        open(os.path.join(root, ".bench_prover_pt_vk.bin"), "rb").read()
    )
    assignments = [[int(x) for x in a] for a in aux["assignments"]]
    publics = [[int(x) for x in p] for p in aux["publics"]]
    log(f"[bench:g16] cache load: {time.time() - t0:.1f}s "
        f"(n_ab={prover.n_ab}, n_lh={prover.n_lh}, window "
        f"{prover.window_bits})")

    # warm the three programs CONCURRENTLY: the relay compiles requests
    # from separate threads in parallel, so wall ~= the G2 program alone
    # (measured serial: scalars 31s + G1 190s + G2 649s)
    import threading

    import jax
    import jax.numpy as jnp

    t0 = time.time()
    zm, zc = prover._encode_witness(assignments[0])

    def warm_scalars():
        jax.block_until_ready(prover._scalars_jit(zm, zc, prover._buffers))

    def warm_g1():
        sc = jnp.zeros((prover.fr.num_limbs, prover.n_lh), jnp.uint32)
        jax.block_until_ready(
            prover._run_msm(prover.g1, sc, prover.lh_pts, prover.n_lh).x
        )
        if not prover.share_g1_shapes:
            sc = jnp.zeros((prover.fr.num_limbs, prover.n_ab), jnp.uint32)
            jax.block_until_ready(
                prover._run_msm(prover.g1, sc, prover.a_pts, prover.n_ab).x
            )

    def warm_g2():
        sc = jnp.zeros((prover.fr.num_limbs, prover.n_ab), jnp.uint32)
        jax.block_until_ready(
            prover._run_msm(prover.g2, sc, prover.b2_pts, prover.n_ab).x
        )

    threads = [
        threading.Thread(target=f) for f in (warm_scalars, warm_g1, warm_g2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    log(f"[bench:g16] concurrent program warm: {time.time() - t0:.1f}s")

    t0 = time.time()
    proof = prover.prove(assignments[0], r_rand=7, s_rand=9)
    log(f"[bench:g16] first proof: {time.time() - t0:.1f}s")
    if not G.verify(vk, proof, publics[0]):
        raise AssertionError("cached-prover proof failed to verify")
    log("[bench:g16] proof verified with the host pairing")

    batch = len(assignments)
    t0 = time.time()
    proofs = prover.prove_batch(
        assignments, rands=[(i + 1, i + 2) for i in range(batch)]
    )
    batch_t = time.time() - t0
    for p, pub in zip(proofs, publics):
        if not G.verify(vk, p, pub):
            raise AssertionError("batched proof failed to verify")
    pps = batch / batch_t
    log(f"[bench:g16] batch of {batch}: {batch_t:.2f}s (all verified)")
    print(
        json.dumps(
            {
                "metric": "groth16_private_transfer_proofs_per_s",
                "value": round(pps, 4),
                "unit": "proofs/s/chip",
                "vs_baseline": round(
                    pps / ARKWORKS_SINGLE_CORE_PT_PROOFS_S, 4
                ),
            }
        ),
        flush=True,
    )


def maybe_run_groth16(budget: float) -> None:
    """Run stage 2 in a child with a hard deadline; never jeopardize the
    already-printed MSM metric."""
    import subprocess
    import sys as _sys

    if os.environ.get("MANTA_BENCH_GROTH16", "1") == "0":
        return
    root = os.path.dirname(os.path.abspath(__file__))
    if not os.path.exists(os.path.join(root, ".bench_prover_pt.npz")):
        log("[bench:g16] no prover cache — skipping Groth16 stage")
        return
    remaining = budget - (time.time() - T_START) - 15
    if remaining < 120:
        log(f"[bench:g16] {remaining:.0f}s left of the budget — skipping")
        return
    log(f"[bench:g16] starting child (deadline {remaining:.0f}s)")
    env = dict(os.environ, MANTA_BENCH_STAGE="groth16")
    try:
        out = subprocess.run(
            [_sys.executable, os.path.abspath(__file__)],
            env=env,
            timeout=remaining,
            capture_output=True,
            text=True,
        )
        _sys.stderr.write(out.stderr[-4000:])
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                print(line, flush=True)
    except subprocess.TimeoutExpired:
        log("[bench:g16] child hit the deadline — Groth16 metric skipped")


def main():
    if os.environ.get("MANTA_BENCH_STAGE") == "groth16":
        run_groth16_stage()
        return
    budget = float(os.environ.get("MANTA_BENCH_BUDGET_S", "560"))
    reps = int(os.environ.get("MANTA_BENCH_REPS", "3"))
    window = int(os.environ.get("MANTA_BENCH_WINDOW", "16"))
    sizes = (
        [int(os.environ.get("MANTA_BENCH_N"))]
        if os.environ.get("MANTA_BENCH_N")
        else [20, 17, 14]
    )
    for log2n in sizes:
        try:
            mpoints, n, secs = run_msm_bench(log2n, reps, window)
            print(
                json.dumps(
                    {
                        "metric": f"msm_bls12_381_g1_2pow{log2n}_mpoints_per_s",
                        "value": round(mpoints, 4),
                        "unit": "Mpoints/s/chip",
                        "vs_baseline": round(
                            mpoints / ARKWORKS_SINGLE_CORE_MPOINTS_S, 4
                        ),
                    }
                ),
                flush=True,
            )
            maybe_run_groth16(budget)
            return
        except Exception as e:  # noqa: BLE001 — try the next size down
            log(f"[bench] 2^{log2n} failed: {type(e).__name__}: {e}")
    print(
        json.dumps(
            {
                "metric": "msm_bls12_381_g1_mpoints_per_s",
                "value": 0.0,
                "unit": "Mpoints/s/chip",
                "vs_baseline": 0.0,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
