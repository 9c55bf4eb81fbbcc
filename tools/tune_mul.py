"""Raw in-kernel field-multiply throughput: row-sliced schoolbook vs a
sublane-blocked broadcast-shift formulation.

The 12-bit schoolbook slices single limb rows ((1, Rb) extents) for every
product; if Mosaic executes those at one-sublane occupancy the VPU idles
7/8 of its sublanes. The blocked variant processes whole (L, Rb) tiles:
for each limb j, cols[j:j+L] += a * broadcast(b[j]) — one full-tile
multiply and one shifted full-tile add per j.
"""

from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("MANTA_TPU_PALLAS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from manta_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

from manta_tpu.ops import field_ops as F
from manta_tpu.ops.pallas import point_kernels as PK
from manta_tpu.utils import hostmath

SPEC = hostmath.BLS12_381_G1.field
CHAIN = 32  # sequential muls per kernel invocation
LANES = int(os.environ.get("TUNE_LANES", "512"))
N = 1 << 16  # lanes total per call

_tiny = jax.jit(lambda a: a.ravel()[:1].astype(jnp.uint32))


def fetch(x):
    return np.asarray(jax.device_get(_tiny(jax.tree_util.tree_leaves(x)[0])))[0]


class _BlockedOps12(PK._KernelCoordOps12):
    """Broadcast-shift schoolbook: full-(L, Rb)-tile ops instead of
    row-sliced products."""

    def mul(self, a, b):
        L = self.L
        W = 2 * L + 8
        # cols as a (W, Rb) array built from L shifted full-tile adds
        # (shift via static jnp.pad — Pallas has no scatter-add)
        cols = jnp.zeros((W, a.shape[-1]), jnp.uint32)
        for j in range(L):
            bj = b[j][None, :]  # (1, Rb) -> broadcast over limb rows
            prod = a * bj  # (L, Rb) full-tile multiply
            cols = cols + jnp.pad(prod, ((j, W - L - j), (0, 0)))
        # REDC: sequential in i, whole-tile m*p accumulation (p rows as
        # scalar immediates — Pallas kernels cannot capture array consts)
        n0 = self.n0_inv
        p_tile = jnp.stack(
            [jnp.full((a.shape[-1],), v, jnp.uint32) for v in self._p]
        )  # (L, Rb)
        for i in range(L):
            m = ((cols[i] & jnp.uint32(self.MASK12)) * n0) & jnp.uint32(
                self.MASK12
            )
            mp = m[None, :] * p_tile  # (L, Rb)
            carry_row = (cols[i] + mp[0]) >> jnp.uint32(12)
            bump = jnp.pad(mp, ((i, W - L - i), (0, 0))) + jnp.pad(
                carry_row[None, :], ((i + 1, W - i - 2), (0, 0))
            )
            cols = cols + bump
        outs = []
        carry = jnp.zeros_like(cols[0])
        for k in range(L):
            t = cols[L + k] + carry
            outs.append(t & jnp.uint32(self.MASK12))
            carry = t >> jnp.uint32(12)
        return jnp.stack(outs)


class _KaratsubaOps12(PK._KernelCoordOps12):
    """One-level Karatsuba product phase over 16-limb halves: 3 x 16
    half-tile multiplies (768 row-MACs vs 1024 schoolbook), with each
    partial accumulated in its own 33-row array (the schoolbook's 65-row
    accumulator adds are most of its non-MAC work). z1 columns are exact
    in u32: z1 = s - z0 - z2 column-wise with s = (alo+ahi)(blo+bhi)."""

    def mul(self, a, b):
        L = self.L
        H = L // 2
        a_lo, a_hi = a[:H], a[H:]
        b_lo, b_hi = b[:H], b[H:]
        s_a = a_lo + a_hi  # lazy: < 2^13, products < 2^26, 16-deep < 2^30
        s_b = b_lo + b_hi
        WH = 2 * H + 1

        def half_mul(x, y):
            cols = jnp.zeros((WH, a.shape[-1]), jnp.uint32)
            for j in range(H):
                prod = x * y[j][None, :]
                cols = cols + jnp.pad(prod, ((j, WH - H - j), (0, 0)))
            return cols

        z0 = half_mul(a_lo, b_lo)
        z2 = half_mul(a_hi, b_hi)
        s = half_mul(s_a, s_b)
        z1 = s - z0 - z2  # exact per column (>= 0)
        W = 2 * L + 1
        cols = (
            jnp.pad(z0, ((0, W - WH), (0, 0)))
            + jnp.pad(z1, ((H, W - WH - H), (0, 0)))
            + jnp.pad(z2, ((L, W - WH - L), (0, 0)))
        )
        return self._redc(cols)


class _Karatsuba2Ops12(PK._KernelCoordOps12):
    """Two-level Karatsuba (8-limb quarters): 9 quarter-muls = 576
    row-MACs vs 1024 schoolbook / 768 one-level. Sum limbs < 2^14 at the
    second level, products < 2^28, 8-deep < 2^31 — still exact in u32."""

    def mul(self, a, b):
        L = self.L
        H = L // 2

        def kara16(x, y, WH):
            # one-level karatsuba of 16-limb operands (limbs < 2^13)
            Q = 8
            x_lo, x_hi = x[:Q], x[Q:]
            y_lo, y_hi = y[:Q], y[Q:]
            s_x = x_lo + x_hi
            s_y = y_lo + y_hi
            WQ = 2 * Q + 1

            def qmul(u, v):
                cols = jnp.zeros((WQ, u.shape[-1]), jnp.uint32)
                for j in range(Q):
                    cols = cols + jnp.pad(
                        u * v[j][None, :], ((j, WQ - Q - j), (0, 0))
                    )
                return cols

            z0 = qmul(x_lo, y_lo)
            z2 = qmul(x_hi, y_hi)
            z1 = qmul(s_x, s_y) - z0 - z2
            return (
                jnp.pad(z0, ((0, WH - WQ), (0, 0)))
                + jnp.pad(z1, ((Q, WH - WQ - Q), (0, 0)))
                + jnp.pad(z2, ((2 * Q, WH - WQ - 2 * Q), (0, 0)))
            )

        a_lo, a_hi = a[:H], a[H:]
        b_lo, b_hi = b[:H], b[H:]
        s_a = a_lo + a_hi
        s_b = b_lo + b_hi
        WH = 2 * H + 1
        z0 = kara16(a_lo, b_lo, WH)
        z2 = kara16(a_hi, b_hi, WH)
        z1 = kara16(s_a, s_b, WH) - z0 - z2
        W = 2 * L + 1
        cols = (
            jnp.pad(z0, ((0, W - WH), (0, 0)))
            + jnp.pad(z1, ((H, W - WH - H), (0, 0)))
            + jnp.pad(z2, ((L, W - WH - L), (0, 0)))
        )
        return self._redc(cols)


def _chain_kernel(ops_cls, a_ref, b_ref, o_ref):
    ops = ops_cls(SPEC)
    a = ops.unpack(a_ref[...])
    b = ops.unpack(b_ref[...])

    def body(_, x):
        return ops.mul(x, b)

    x = jax.lax.fori_loop(0, CHAIN, body, a)
    o_ref[...] = ops.pack(x)


@functools.lru_cache(maxsize=None)
def chain_call(ops_name):
    ops_cls = {
        "rows": PK._KernelCoordOps12,
        "blocked": _BlockedOps12,
        "karatsuba": _KaratsubaOps12,
        "karatsuba2": _Karatsuba2Ops12,
    }[ops_name]
    L = SPEC.num_limbs
    spec_in = pl.BlockSpec(
        (L, LANES), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_chain_kernel, ops_cls),
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
        grid=(N // LANES,),
        in_specs=[spec_in, spec_in],
        out_specs=spec_in,
    )


def main():
    rng = np.random.default_rng(0)
    import random as _r

    hr = _r.Random(1)
    vals_a = [hr.randrange(SPEC.modulus) for _ in range(64)]
    vals_b = [hr.randrange(SPEC.modulus) for _ in range(64)]
    a = jnp.asarray(
        np.tile(np.asarray(F.encode_ints(SPEC, vals_a)), (1, N // 64))
    )
    b = jnp.asarray(
        np.tile(np.asarray(F.encode_ints(SPEC, vals_b)), (1, N // 64))
    )
    jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.zeros((8, 128))))
    muls = N * CHAIN
    results = {}
    for name in ("blocked", "karatsuba", "karatsuba2"):
        fn = jax.jit(lambda x, y, name=name: chain_call(name)(x, y))
        try:
            t0 = time.time()
            out = fn(a, b)
            fetch(out)
            tc = time.time() - t0
            # correctness vs host
            got = F.decode_ints(SPEC, out[:, :64])
            for g, va, vb in zip(got, vals_a, vals_b):
                want = va * pow(vb, CHAIN, SPEC.modulus) % SPEC.modulus
                assert g == want, f"{name}: mul chain mismatch"
            ts = []
            for _ in range(3):
                t0 = time.time()
                fetch(fn(a, b))
                ts.append(time.time() - t0)
            t = min(ts)
            results[name] = t
            print(
                f"[mul] {name:8s}: {t*1e3:7.1f} ms = {muls/t/1e6:7.1f} Mmul/s"
                f"  (compile {tc:.0f}s, verified)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            print(f"[mul] {name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
