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
    for name in ("rows", "blocked"):
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
