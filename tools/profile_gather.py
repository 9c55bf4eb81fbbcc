"""Compare gather/scatter layouts on TPU for the MSM hot path.

Hypothesis: `jnp.take(a, perm, axis=-1)` on a limb-major (24, n) array is a
4-byte-per-index lane gather (~3.7 GB/s measured); gathering point-major
rows (n, 48) moves 192 contiguous bytes per index and should be ~an order
of magnitude faster.
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


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    print(f"[gather] {label}: {min(ts)*1e3:.1f} ms", flush=True)


def main():
    n = 1 << 20
    L = 24
    rng = np.random.default_rng(0)
    a_limb = jnp.asarray(rng.integers(0, 2**16, (2 * L, n), dtype=np.uint32))
    a_row = jnp.asarray(np.ascontiguousarray(np.asarray(a_limb).T))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    cks = lambda x: jnp.sum(x.astype(jnp.uint32))

    timed("lane take (48, n) axis=-1",
          jax.jit(lambda a, p: cks(jnp.take(a, p, axis=-1))), a_limb, perm)
    timed("row take (n, 48) axis=0",
          jax.jit(lambda a, p: cks(jnp.take(a, p, axis=0))), a_row, perm)
    timed("row take + transpose back",
          jax.jit(lambda a, p: cks(jnp.take(a, p, axis=0).T)), a_row, perm)
    timed("transpose, row take, transpose",
          jax.jit(lambda a, p: cks(jnp.take(a.T, p, axis=0).T)), a_limb, perm)

    # scatter comparison at bucket scale: 2^20 -> 2^15+1 rows
    nb = (1 << 15) + 1
    idx = jnp.asarray(rng.integers(0, nb + n, n, dtype=np.int32))
    binf_lane = jnp.zeros((3 * L, nb), jnp.uint32)
    binf_row = jnp.zeros((nb, 3 * L), jnp.uint32)
    src_lane = jnp.asarray(rng.integers(0, 2**16, (3 * L, n), dtype=np.uint32))
    src_row = jnp.asarray(np.ascontiguousarray(np.asarray(src_lane).T))
    timed("lane scatter (72, n)->(72, nb)",
          jax.jit(lambda b, s, i: cks(b.at[:, i].set(s, mode="drop"))),
          binf_lane, src_lane, idx)
    timed("row scatter (n,72)->(nb,72)",
          jax.jit(lambda b, s, i: cks(b.at[i, :].set(s, mode="drop"))),
          binf_row, src_row, idx)


if __name__ == "__main__":
    main()
