"""Micro-profile the MSM data-movement phases on the attached TPU.

Times, at 2^20 points / window 13 shapes (BLS12-381 G1, L=24 limbs):
  - argsort of the (n,) uint32 digit array
  - gather of the (L, n) point coordinate arrays into sorted order
  - scatter of (L, n) run values into (L, B) buckets (unique-ish indices)
  - one unfused madd step over (L, R) lanes, for reference

All timings fetch a value (axon relay: block_until_ready can lie for
pure-XLA programs — see NOTES_r1).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("MANTA_TPU_PALLAS", "1")

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from manta_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

LOG2N = int(os.environ.get("PROF_LOG2N", "20"))
N = 1 << LOG2N
C = int(os.environ.get("PROF_WINDOW", "16"))
SIGNED = os.environ.get("PROF_SIGNED", "1") == "1"
B = (1 << (C - 1)) + 1 if SIGNED else 1 << C
L = 24
K = 128
R = N // K


_tiny = jax.jit(lambda a: a.ravel()[:1].astype(jnp.uint32))


def fetch(x):
    """Force completion by fetching ONE element derived from the output
    (device_get of the full array would drag 100MB through the relay)."""
    leaves = jax.tree_util.tree_leaves(x)
    return np.asarray(jax.device_get(_tiny(leaves[0])))[0]


def bench(name, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    fetch(out)
    t_compile = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        fetch(out)
        times.append(time.time() - t0)
    print(
        f"{name}: compile+first {t_compile:.3f}s, warm {min(times)*1e3:.1f}ms",
        flush=True,
    )
    return min(times)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    digits = jnp.asarray(rng.integers(0, B, size=(N,), dtype=np.uint32))
    coords = jnp.asarray(rng.integers(0, 1 << 16, size=(L, N), dtype=np.uint32))
    run_vals = jnp.asarray(
        rng.integers(0, 1 << 16, size=(L, N), dtype=np.uint32)
    )
    # end mask ~ B trues out of N
    end = jnp.asarray(rng.random(N) < (B / N))

    argsort_j = jax.jit(lambda d: jnp.argsort(d))
    order = argsort_j(digits)
    bench("argsort(2^%d u32)" % LOG2N, argsort_j, digits)

    sortpair_j = jax.jit(
        lambda d: jax.lax.sort(
            (d, jax.lax.iota(jnp.uint32, d.shape[0])), num_keys=1
        )
    )
    bench("sort_pairs(2^%d u32,u32)" % LOG2N, sortpair_j, digits)

    take_j = jax.jit(lambda a, o: jnp.take(a, o, axis=-1))
    bench(f"gather (L={L}, 2^{LOG2N})", take_j, coords, order)

    # gather into transposed (K, L, R) layout (kernel feed layout)
    def take_t(a, o):
        t = jnp.take(a, o, axis=-1)
        return t.reshape(L, K, R).transpose(1, 0, 2)

    bench(f"gather+transpose (K,L,R)", jax.jit(take_t), coords, order)

    def scatter(vals, d, e):
        idx = jnp.where(e, d.astype(jnp.int32), jnp.int32(B))
        tgt = jnp.zeros((L, B), jnp.uint32)
        return tgt.at[:, idx].set(vals, mode="drop", unique_indices=False)

    bench(f"scatter (L,2^{LOG2N})->(L,{B})", jax.jit(scatter), run_vals, digits, end)

    # one unfused madd over (L, R) lanes, as the per-step reference
    from manta_tpu.ops import curve as CURVE
    from manta_tpu.ops import field_ops as F
    from manta_tpu.ops.curve import JacobianPoint
    from manta_tpu.utils import hostmath

    cops = CURVE.curve_ops_for(hostmath.BLS12_381_G1)
    g = hostmath.BLS12_381_G1.generator
    pts = [
        hostmath.BLS12_381_G1.scalar_mul(i + 1, g) for i in range(64)
    ]
    reps_pts = (pts * ((R // 64) + 1))[:R]
    P = cops.encode_points(reps_pts)
    Q = cops.encode_points(reps_pts[::-1])

    madd_j = jax.jit(lambda p, q: tuple(cops.madd(JacobianPoint(*p), JacobianPoint(*q))))
    t = bench(f"unfused madd (L,{R})", madd_j, tuple(P), tuple(Q))
    print(
        f"  => per-window K-loop ({K} steps) est {K*t:.3f}s; "
        f"x20 windows = {20*K*t:.2f}s",
        flush=True,
    )

    add_j = jax.jit(lambda p, q: tuple(cops.add(JacobianPoint(*p), JacobianPoint(*q))))
    bench(f"unfused full add (L,{R})", add_j, tuple(P), tuple(Q))

    mul_j = jax.jit(lambda a, b: F.mont_mul(cops.curve.field, a, b))
    ca = jnp.asarray(rng.integers(0, 1 << 16, size=(L, N), dtype=np.uint32))
    cb = jnp.asarray(rng.integers(0, 1 << 16, size=(L, N), dtype=np.uint32))
    t = bench(f"pallas mont_mul (L,2^{LOG2N})", mul_j, ca, cb)
    print(f"  => {N/t/1e6:.1f} Mmul/s", flush=True)

    # -- fused kernels (point_kernels) at bench geometry --
    from manta_tpu.ops.pallas import point_kernels as PK

    fops = PK.fused_curve_ops_for(hostmath.BLS12_381_G1)
    fmadd_j = jax.jit(
        lambda p, q: tuple(fops.madd(JacobianPoint(*p), JacobianPoint(*q)))
    )
    big_n = N // 4
    bigP = JacobianPoint(
        jnp.tile(P.x, (1, big_n // R)),
        jnp.tile(P.y, (1, big_n // R)),
        jnp.tile(P.z, (1, big_n // R)),
    )
    t = bench(f"fused madd (L,2^{LOG2N-2})", fmadd_j, tuple(bigP), tuple(bigP))
    print(f"  => {11*big_n/t/1e6:.1f} eff Mmul/s (11 muls/madd)", flush=True)

    # fused column kernel at the real window geometry. Random coords make
    # every lane take the fast (no-doubling) path — the realistic case for
    # distinct points; the tiled-P variant forces the doubling branch in
    # every block (the bench's 256-distinct-tiled workload approximates it).
    qinf = jnp.zeros((K, R), jnp.int32)
    head = jnp.asarray(rng.random((K, R)) < 0.01)
    col_j = jax.jit(
        lambda a, b, c, d: PK.accumulate_columns(fops.curve, a, b, c, d)
    )
    rx = jnp.asarray(rng.integers(0, 1 << 16, size=(K, L, R), dtype=np.uint32))
    ry = jnp.asarray(rng.integers(0, 1 << 16, size=(K, L, R), dtype=np.uint32))
    t = bench(f"fused column fastpath (K={K}, L={L}, R={R})", col_j, rx, ry, qinf, head)
    print(
        f"  => per-window {t:.3f}s; x20 windows = {20*t:.2f}s; "
        f"eff {11*N/t/1e6:.1f} Mmul/s",
        flush=True,
    )
    px = jnp.tile(P.x.reshape(1, L, R), (K, 1, 1))
    py = jnp.tile(P.y.reshape(1, L, R), (K, 1, 1))
    t = bench(f"fused column dbl-branch (K={K}, L={L}, R={R})", col_j, px, py, qinf, head)
    print(f"  => per-window {t:.3f}s; x20 windows = {20*t:.2f}s", flush=True)

    # -- the non-column window phases, at real geometry --
    from manta_tpu.ops import msm as M

    num_windows = -(-255 // C) if SIGNED else -(-272 // C)
    bx = jnp.asarray(rng.integers(0, 1 << 16, size=(L, B), dtype=np.uint32))
    by = jnp.asarray(rng.integers(0, 1 << 16, size=(L, B), dtype=np.uint32))
    bz = jnp.asarray(rng.integers(0, 1 << 16, size=(L, B), dtype=np.uint32))
    buckets = JacobianPoint(bx, by, bz)
    if SIGNED:
        red_j = jax.jit(
            lambda x, y, z: tuple(
                M._weighted_reduce_signed(fops, JacobianPoint(x, y, z), C)
            )
        )
    else:
        red_j = jax.jit(
            lambda x, y, z: tuple(
                M._weighted_reduce(fops, JacobianPoint(x, y, z), C)
            )
        )
    t = bench(f"weighted_reduce (B={B}, fused)", red_j, bx, by, bz)
    print(f"  => x{num_windows} windows = {num_windows*t:.2f}s", flush=True)

    sc = jnp.asarray(
        rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32)
    )
    dig_j = jax.jit(lambda s: M.window_digits_signed(s, C, 255))
    t = bench(f"window_digits_signed (2^{LOG2N}, c={C})", dig_j, sc)

    fold_j = jax.jit(
        lambda d, ax, ay, az, x, y, z: tuple(
            M._fold_partials(
                fops,
                JacobianPoint(ax, ay, az),
                d,
                JacobianPoint(x, y, z),
                B,
            )
        )
    )
    d_t = jnp.asarray(
        np.sort(rng.integers(0, B, size=(N,), dtype=np.uint32))
        .reshape(R, K)
        .T.copy()
    )
    ax = jnp.asarray(rng.integers(0, 1 << 16, size=(L, R), dtype=np.uint32))
    t = bench(
        f"fold_partials (R={R})", fold_j, d_t, ax, ax, ax, bx, by, bz
    )
    print(f"  => x{num_windows} windows = {num_windows*t:.2f}s", flush=True)


if __name__ == "__main__":
    main()
