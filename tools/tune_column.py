"""Sweep column-kernel block shapes (Rb, Kb) on the attached TPU.

One session, back-to-back variants (cross-session throughput varies ~1.7x).
Workload: one window-sized column pass (K=128, R=8192 at 2^20) on BLS12-381.
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
from manta_tpu.ops.pallas import point_kernels as PK
from manta_tpu.utils import hostmath

LOG2N = int(os.environ.get("TUNE_LOG2N", "20"))
N = 1 << LOG2N
K = 128
R = N // K

_tiny = jax.jit(lambda a: a.ravel()[:1].astype(jnp.uint32))


def fetch(x):
    return np.asarray(jax.device_get(_tiny(jax.tree_util.tree_leaves(x)[0])))[0]


def main():
    curve = hostmath.BLS12_381_G1
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = np.load(os.path.join(repo, f".bench_points_2pow{LOG2N}.npz"))
    rng = np.random.default_rng(1)
    perm = rng.permutation(N)
    px = jnp.asarray(data["x"][:, perm].reshape(-1, K, R).swapaxes(0, 1))
    py = jnp.asarray(data["y"][:, perm].reshape(-1, K, R).swapaxes(0, 1))
    qinf = jnp.zeros((K, R), jnp.int32)
    # heads at ~bucket-boundary density for window 16 (runs avg 32 long)
    head = jnp.asarray(rng.random((K, R)) < (1 / 32.0))

    jax.block_until_ready(jax.jit(lambda a: a + 1)(jnp.zeros((8, 128))))
    variants = [(256, 8), (512, 8), (128, 8), (256, 16), (256, 4), (512, 16), (1024, 8)]
    env = os.environ.get("TUNE_VARIANTS")
    if env:
        variants = [tuple(map(int, v.split("x"))) for v in env.split(",")]
    madds = N  # one madd per element
    for rb, kb in variants:
        if R % rb or K % kb:
            continue
        fn = jax.jit(
            lambda px, py, qinf, head, rb=rb, kb=kb: PK.accumulate_columns(
                curve, px, py, qinf, head, rb, kb
            )[0]
        )
        try:
            t0 = time.time()
            fetch(fn(px, py, qinf, head))
            tc = time.time() - t0
            ts = []
            for _ in range(3):
                t0 = time.time()
                fetch(fn(px, py, qinf, head))
                ts.append(time.time() - t0)
            t = min(ts)
            print(
                f"[tune] Rb={rb:5d} Kb={kb:3d}: {t*1e3:7.1f} ms "
                f"({madds/t/1e6:6.2f} Madd/s, ~{madds*11/t/1e6:6.1f} Mmul/s)"
                f"  compile {tc:.0f}s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"[tune] Rb={rb} Kb={kb}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
