"""Phase-level MSM profile on the attached TPU.

Times the three phases of one Pippenger window at 2^20 (sort+gather,
fused column kernel, scatter+fold+weighted-reduce) so optimization
effort lands where the time actually goes. Phases are jitted separately;
multiply by the window count (16 at c=16 signed) to compare against the
full `bench.py` number.

Usage: python tools/profile_msm.py [log2n] [window_bits]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("MANTA_TPU_PALLAS", "1")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from manta_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

from manta_tpu.ops import curve as C
from manta_tpu.ops import field_ops as F
from manta_tpu.ops import msm as M
from manta_tpu.ops.curve import JacobianPoint
from manta_tpu.utils import hostmath


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        # fetch one leaf: through the axon relay block_until_ready can lie
        leaves = jax.tree_util.tree_leaves(out)
        np.asarray(leaves[0])
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"[profile] {label}: {best * 1e3:.1f} ms", flush=True)
    return best


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << log2n
    steps = 128
    lanes = n // steps
    curve = hostmath.BLS12_381_G1
    cops = C.curve_ops_for(curve, "fused")
    fr = curve.scalar_field
    num_buckets = (1 << (c - 1)) + 1

    print(f"[profile] n=2^{log2n} c={c} steps={steps} lanes={lanes}")
    rng = np.random.default_rng(0)
    # points: tiled distinct-ish set is fine for timing (no value-dependent
    # control flow on the hot path)
    base = [curve.scalar_mul(k + 1, curve.generator) for k in range(512)]
    enc = cops.encode_points(base)
    reps_n = n // 512
    pts = JacobianPoint(
        jnp.tile(enc.x, (1, reps_n)),
        jnp.tile(enc.y, (1, reps_n)),
        jnp.tile(enc.z, (1, reps_n)),
    )
    jax.block_until_ready(pts.x)
    import bench as B

    scalars = jnp.asarray(B.random_scalar_limbs(fr, n))

    # --- phase 0: digit recode (all windows) ---
    rec = jax.jit(lambda s: M.window_digits_signed(s, c, fr.bits))
    timed("recode (all windows)", rec, scalars)
    digits, negs, _ = rec(scalars)
    d0, n0 = digits[0], negs[0]

    # --- phase 1: sort + layout (one window) ---
    sort1 = jax.jit(lambda d: M._sorted_layout(d, steps))
    timed("sort+layout (1 window)", sort1, d0)
    perm, d_t, head, end = sort1(d0)

    # --- phase 2: gather points into (K, L, R) (one window) ---
    def gather(perm, px, py):
        def gather_kt(a):
            taken = jnp.take(a, perm, axis=-1)
            chunked = taken.reshape(*a.shape[:-1], steps, lanes)
            return jnp.moveaxis(chunked, -2, 0)

        return gather_kt(px), gather_kt(py)

    g2 = jax.jit(gather)
    timed("gather (1 window)", g2, perm, pts.x, pts.y)
    gx, gy = g2(perm, pts.x, pts.y)
    qinf = jnp.zeros((steps, lanes), jnp.int32)

    # --- phase 3: fused column kernel (one window) ---
    col = jax.jit(lambda px, py, qi, h: cops.run_columns(px, py, qi, h))
    timed("column kernel (1 window)", col, gx, gy, qinf, head)

    # --- phase 4: full bucket_sums (sort+gather+column+scatter+fold) ---
    bs = jax.jit(
        lambda d, px, py, pz: M._bucket_sums(
            cops, d, JacobianPoint(px, py, pz), num_buckets, steps, False
        )
    )
    timed("bucket_sums (1 window)", bs, d0, pts.x, pts.y, pts.z)
    buckets = bs(d0, pts.x, pts.y, pts.z)

    # --- phase 5: weighted reduce (one window) ---
    wr = jax.jit(
        lambda bx, by, bz: M._weighted_reduce_signed(
            cops, JacobianPoint(bx, by, bz), c
        )
    )
    timed("weighted_reduce (1 window)", wr, buckets.x, buckets.y, buckets.z)

    # --- phase 6: one full window ---
    def one_win(d, neg, px, py, pz):
        yneg = cops.ops.neg(py)
        p = JacobianPoint(px, cops.ops.select(neg, yneg, py), pz)
        b = M._bucket_sums(cops, d, p, num_buckets, steps, False)
        return M._weighted_reduce_signed(cops, b, c)

    ow = jax.jit(one_win)
    t_win = timed("one full window", ow, d0, n0, pts.x, pts.y, pts.z)
    print(f"[profile] x{digits.shape[0]} windows -> {t_win * digits.shape[0]:.2f}s"
          f" (bench full-MSM reference: see BENCH_r02)")


if __name__ == "__main__":
    main()
