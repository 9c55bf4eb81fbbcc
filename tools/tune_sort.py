"""Compare digit-grouping strategies for the MSM on the attached TPU."""

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

from manta_tpu.ops import msm as M

N = 1 << 20
NB = (1 << 15) + 1

_tiny = jax.jit(lambda a: a.ravel()[:1].astype(jnp.uint32))


def fetch(x):
    return np.asarray(jax.device_get(_tiny(jax.tree_util.tree_leaves(x)[0])))[0]


def timed(label, fn, *args, reps=3):
    t0 = time.time()
    fetch(fn(*args))
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fetch(fn(*args))
        ts.append(time.time() - t0)
    print(f"[sort] {label}: {min(ts)*1e3:8.1f} ms  (compile {tc:.0f}s)", flush=True)


def main():
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.integers(0, NB, N, dtype=np.uint32))
    d16 = jnp.asarray(rng.integers(0, NB, (16, N), dtype=np.uint32))

    jax.block_until_ready(jax.jit(lambda a: a + 1)(jnp.zeros((8, 128))))

    timed("argsort 1x(1M)", jax.jit(lambda x: jnp.argsort(x)), d)
    timed("counting 1x(1M)",
          jax.jit(lambda x: M._counting_sort_order(x, NB)), d)
    timed("argsort batched (16,1M)",
          jax.jit(lambda x: jnp.argsort(x, axis=-1)), d16)
    timed("sort_key_val 1x(1M)",
          jax.jit(lambda x: jax.lax.sort_key_val(
              x, jnp.arange(N, dtype=jnp.int32))[1]), d)
    timed("counting vmapped (16,1M)",
          jax.jit(jax.vmap(lambda x: M._counting_sort_order(x, NB))), d16)
    # pack digit<<12 | chunkid? not needed; grouping only requires equal-adjacent
    timed("single-pass 8bit counting (256 keys)",
          jax.jit(lambda x: M._counting_sort_order(x & 0xFF, 256)), d)


if __name__ == "__main__":
    main()
