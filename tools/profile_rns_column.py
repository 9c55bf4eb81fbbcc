"""Time the RNS column kernels on TPU (1 window at 2^20, K=128).

Decides the staged-conversion design: if the PURE RNS column kernel
(`rns_accumulate_columns`) runs ~2x faster than the limb one (~96ms), a
backend that converts limb->RNS OUTSIDE the kernel (one big XLA matmul on
the MXU) and feeds the pure kernel wins; if the in-kernel-converting
hybrid kernel is the bottleneck, that confirms conversion placement is
the problem rather than the RNS core.
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

from manta_tpu.ops import rns as R
from manta_tpu.ops.pallas import rns_kernels as RK
from manta_tpu.utils import hostmath


def timed(label, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    print(f"[rnscol] {label}: compile+first {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    print(f"[rnscol] {label}: {min(ts)*1e3:.1f} ms", flush=True)


def main():
    n = 1 << 20
    K, Rl = 128, n // 128
    curve = hostmath.BLS12_381_G1
    spec = R.default_spec(curve.field)
    Kt = spec.k1 + spec.k2 + 1
    L = curve.field.num_limbs
    rng = np.random.default_rng(0)
    print(f"[rnscol] Kt={Kt} L={L} K={K} R={Rl}")

    # limb inputs for the hybrid kernel
    px_l = jnp.asarray(rng.integers(0, 1 << 16, (K, L, Rl), dtype=np.int32))
    py_l = jnp.asarray(rng.integers(0, 1 << 16, (K, L, Rl), dtype=np.int32))
    qinf = jnp.zeros((K, Rl), jnp.int32)
    head = jnp.asarray(rng.integers(0, 2, (K, Rl), dtype=np.int32))

    # RNS inputs for the pure kernel (valid residues < m_i)
    mods = np.asarray(
        list(spec.b1) + list(spec.b2) + [spec.m_r], dtype=np.float32
    )
    px_r = jnp.asarray(
        rng.integers(0, 4096, (K, Kt, Rl)).astype(np.float32) % mods[None, :, None]
    )
    py_r = jnp.asarray(
        rng.integers(0, 4096, (K, Kt, Rl)).astype(np.float32) % mods[None, :, None]
    )

    def cks3(t):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in t)

    timed(
        "hybrid column (limb in, in-kernel convert)",
        jax.jit(lambda a, b, c, d: cks3(
            RK.hybrid_accumulate_columns(curve, a, b, c, d))),
        px_l, py_l, qinf, head,
    )
    timed(
        "pure RNS column",
        jax.jit(lambda a, b, c, d: cks3(
            RK.rns_accumulate_columns(curve, a, b, c, d))),
        px_r, py_r, qinf, head,
    )

    # XLA-level limb->RNS conversion (digit-split matmul + RNS mont mul)
    cmat, convk = RK._limb_conv_tables(spec)
    cm = jnp.asarray(cmat)
    ck = jnp.asarray(convk)

    def from_limbs_xla(limbs):  # (L, n) int32 -> (Kt, n) f32 residues
        f = limbs.astype(jnp.float32)
        hi = jnp.floor(f * (1.0 / 256.0))
        lo = f - 256.0 * hi
        d = jnp.concatenate([lo, hi], axis=0)  # (2L, n)
        s_lo = cm[0] @ d
        s_hi = cm[1] @ d
        out_int = s_lo.astype(jnp.int32) + (s_hi.astype(jnp.int32) << 6)
        out_f = s_lo + 64.0 * s_hi
        m = jnp.asarray(mods)[:, None]
        mi = m.astype(jnp.int32)
        q = jnp.floor(out_f / m).astype(jnp.int32)
        r = out_int - q * mi
        r = jnp.where(r < 0, r + mi, r)
        r = jnp.where(r >= mi, r - mi, r)
        res = r.astype(jnp.float32)
        # montgomery radix swap by convk: the XLA-level RNS mont mul
        ops = R.RnsCoordOps(curve.field)
        return ops.mul(res, jnp.broadcast_to(ck, res.shape))

    limbs_flat = jnp.asarray(
        rng.integers(0, 1 << 16, (L, n), dtype=np.int32)
    )
    timed("XLA limb->RNS convert (1 coord)", jax.jit(from_limbs_xla), limbs_flat)


if __name__ == "__main__":
    main()
