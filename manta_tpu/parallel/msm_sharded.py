"""Multi-chip MSM: points sharded across the mesh, partials combined.

MSM is a sum — embarrassingly parallel over points: each device runs the
full Pippenger kernel (`manta_tpu.ops.msm`) on its local shard of
(scalars, points); the per-device partial results are gathered (tiny —
one point per device) and tree-added. The gather is the only collective,
riding ICI; everything else is local VPU work (BASELINE north-star:
"points partitioned across chips, bucket sums reduced via collectives").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from manta_tpu.ops import curve as C
from manta_tpu.ops import msm as M
from manta_tpu.ops import scan as S
from manta_tpu.ops.curve import JacobianPoint
from manta_tpu.parallel.mesh import DATA_AXIS


def sharded_msm(
    cops: C.CurveOps,
    scalars: jnp.ndarray,
    points: JacobianPoint,
    mesh,
    window_bits: int = M.DEFAULT_WINDOW_BITS,
    column_steps: int = M.DEFAULT_COLUMN_STEPS,
    scalar_bits: int = 0,
    signed: bool = True,
) -> JacobianPoint:
    """sum_i scalars[i] * points[i] across a device mesh.

    scalars: (S_L, N); point coords (L, N) / (2, L, N); N divisible by the
    mesh size. Returns a single-lane Jacobian point (replicated).
    """
    crank = points.x.ndim

    def spec_last(rank):
        return P(*([None] * (rank - 1) + [DATA_AXIS]))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            spec_last(scalars.ndim),
            spec_last(crank),
            spec_last(crank),
            spec_last(crank),
        ),
        out_specs=(spec_last(crank), spec_last(crank), spec_last(crank)),
        check_vma=False,
    )
    def local_msm(sc, px, py, pz):
        r = M.msm(
            cops,
            sc,
            JacobianPoint(px, py, pz),
            window_bits,
            False,
            column_steps,
            scalar_bits,
            signed,
        )
        return r.x, r.y, r.z

    rx, ry, rz = local_msm(scalars, points.x, points.y, points.z)
    # rx: (L, n_devices) — combine the per-device partials (log-depth adds)
    return S.total_sum(cops, JacobianPoint(rx, ry, rz))


sharded_msm_jit = jax.jit(sharded_msm, static_argnums=(0, 3, 4, 5, 6, 7))
