"""MSM phase profile with checksummed outputs (fetch-noise-free).

Every phase returns a scalar checksum so the relay transfer is constant;
subtracting cumulative phases isolates each stage. See profile_msm.py for
the naive version (its numbers are dominated by fetching MB-scale outputs
through the axon tunnel).
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
from manta_tpu.ops import msm as M
from manta_tpu.ops.curve import JacobianPoint
from manta_tpu.utils import hostmath


def timed(label, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    print(f"[profile] {label}: compile+first {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"[profile] {label}: {best * 1e3:.1f} ms", flush=True)
    return best


def cks(*arrs):
    return sum(jnp.sum(a.astype(jnp.uint32)) for a in arrs)


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

    rec = jax.jit(lambda s: M.window_digits_signed(s, c, fr.bits))
    digits, negs, _ = jax.block_until_ready(rec(scalars))
    d0 = digits[0]

    # 1. sort+layout only
    timed("sort+layout", jax.jit(
        lambda d: cks(*M._sorted_layout(d, steps)[1:3])), d0)

    # 2. sort+layout+gather
    def slg(d, px, py):
        perm, d_t, head, end = M._sorted_layout(d, steps)

        def gather_kt(a):
            taken = jnp.take(a, perm, axis=-1)
            chunked = taken.reshape(*a.shape[:-1], steps, lanes)
            return jnp.moveaxis(chunked, -2, 0)

        return cks(gather_kt(px), gather_kt(py), d_t)

    timed("sort+layout+gather", jax.jit(slg), d0, pts.x, pts.y)

    # 3. + column kernel
    def slgc(d, px, py):
        perm, d_t, head, end = M._sorted_layout(d, steps)

        def gather_kt(a):
            taken = jnp.take(a, perm, axis=-1)
            chunked = taken.reshape(*a.shape[:-1], steps, lanes)
            return jnp.moveaxis(chunked, -2, 0)

        gx, gy = gather_kt(px), gather_kt(py)
        qinf = jnp.take(
            cops.affine_infinity_mask(pts).astype(jnp.int32), perm
        ).reshape(steps, lanes)
        ox, oy, oz = cops.run_columns(gx, gy, qinf, head)
        return cks(ox, oy, oz)

    timed("sort+gather+column", jax.jit(slgc), d0, pts.x, pts.y)

    # 4. full bucket_sums
    bs = jax.jit(
        lambda d, px, py, pz: cks(*M._bucket_sums(
            cops, d, JacobianPoint(px, py, pz), num_buckets, steps, False
        ))
    )
    timed("bucket_sums (full)", bs, d0, pts.x, pts.y, pts.z)

    # 5. weighted reduce alone
    bsv = jax.jit(
        lambda d, px, py, pz: M._bucket_sums(
            cops, d, JacobianPoint(px, py, pz), num_buckets, steps, False
        )
    )
    buckets = jax.block_until_ready(bsv(d0, pts.x, pts.y, pts.z))
    wr = jax.jit(
        lambda bx, by, bz: cks(*M._weighted_reduce_signed(
            cops, JacobianPoint(bx, by, bz), c
        ))
    )
    timed("weighted_reduce", wr, buckets.x, buckets.y, buckets.z)


if __name__ == "__main__":
    main()
