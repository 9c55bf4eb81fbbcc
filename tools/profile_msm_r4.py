"""Phase breakdown of the fused MSM at 2^20 in ONE session.

Times prefix programs of the real pipeline (digits+sort, +gather,
+column kernel, full MSM) back-to-back, so the numbers share one
relay session (cross-session throughput varies ~1.7x — NOTES_r4).
Loads the benchmark point cache written by bench.py.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("MANTA_TPU_PALLAS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from manta_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

from manta_tpu.ops import curve as C
from manta_tpu.ops import msm as M
from manta_tpu.ops.curve import JacobianPoint
from manta_tpu.utils import hostmath

LOG2N = int(os.environ.get("PROF_LOG2N", "20"))
WINDOW = int(os.environ.get("PROF_WINDOW", "16"))
STEPS = 128
N = 1 << LOG2N

_tiny = jax.jit(lambda a: a.ravel()[:1].astype(jnp.uint32))


def fetch(x):
    leaves = jax.tree_util.tree_leaves(x)
    return np.asarray(jax.device_get(_tiny(leaves[0])))[0]


def timed(label, fn, *args, reps=3):
    t0 = time.time()
    fetch(fn(*args))
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fetch(fn(*args))
        ts.append(time.time() - t0)
    print(f"[prof] {label}: {min(ts)*1e3:8.1f} ms   (compile {tc:.1f}s)",
          flush=True)
    return min(ts)


def main():
    curve = hostmath.BLS12_381_G1
    cops = C.curve_ops_for(curve, "fused")
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f".bench_points_2pow{LOG2N}.npz",
    )
    data = np.load(cache)
    pts = JacobianPoint(
        jnp.asarray(data["x"]), jnp.asarray(data["y"]), jnp.asarray(data["z"])
    )
    rng = np.random.default_rng(0)
    L = curve.scalar_field.num_limbs
    sc = jnp.asarray(
        rng.integers(0, 1 << 16, (L, N), dtype=np.uint32)
        % jnp.uint32(0xFFFF)
    )
    sbits = curve.scalar_field.bits
    num_buckets = (1 << (WINDOW - 1)) + 1

    jax.block_until_ready(jax.jit(lambda a: a + 1)(jnp.zeros((8, 128))))

    # phase A: all-window digits + signed recode + sort orders
    def digits_sorts(s):
        digits, negs, _ = M.window_digits_signed(s, WINDOW, sbits)
        outs = []
        for w in range(digits.shape[0]):
            order = M._counting_sort_order(digits[w], num_buckets)
            outs.append(order[:1])
        return jnp.concatenate(outs)

    timed("A digits+sort (16 windows)", jax.jit(digits_sorts), sc)

    # phase B: + sorted layout + packed gather (one window, x16)
    def gather_one(s, px, py):
        digits, negs, _ = M.window_digits_signed(s, WINDOW, sbits)
        perm, d_t, head, end = M._sorted_layout(
            digits[0], STEPS, num_buckets
        )
        packed = px | (py << jnp.uint32(16))
        taken = jnp.take(packed, perm, axis=-1)
        return taken[:, :1]

    tB = timed("B one window sort+gather", jax.jit(gather_one), sc, pts.x, pts.y)

    # phase C: + column kernel (one window)
    def column_one(s, px, py, pz):
        digits, negs, _ = M.window_digits_signed(s, WINDOW, sbits)
        perm, d_t, head, end = M._sorted_layout(digits[0], STEPS, num_buckets)
        packed = px | (py << jnp.uint32(16))
        taken = jnp.take(packed, perm, axis=-1)
        lanes = N // STEPS
        g = jnp.moveaxis(
            taken.reshape(taken.shape[0], STEPS, lanes), -2, 0
        )
        gx, gy = g & jnp.uint32(0xFFFF), g >> jnp.uint32(16)
        qinf = jnp.take(
            cops.affine_infinity_mask(pts).astype(jnp.int32), perm
        ).reshape(STEPS, lanes)
        ox, oy, oz = cops.run_columns(gx, gy, qinf, head)
        return ox[-1][:, :1]

    tC = timed("C one window sort+gather+column", jax.jit(column_one),
               sc, pts.x, pts.y, pts.z)

    # full MSM
    def full(s, px, py, pz):
        r = M.msm(cops, s, JacobianPoint(px, py, pz), WINDOW, False, STEPS,
                  sbits, True)
        return r.x

    tF = timed("F full MSM", jax.jit(full), sc, pts.x, pts.y, pts.z)
    print(f"[prof] est column kernel/window: {(tC - tB)*1e3:.1f} ms; "
          f"x16 = {(tC - tB)*16e3:.0f} ms; "
          f"non-column remainder: {(tF - 16*(tC - tB))*1e3:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
