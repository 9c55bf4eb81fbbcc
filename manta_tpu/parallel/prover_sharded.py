"""Multi-chip Groth16 proving.

Strategy (BASELINE config 5; the reference scales `ark_groth16::prove`
across rayon cores — SURVEY.md §2.10): proofs are independent, so the
witness batch is data-parallel over the mesh. Each stage of the
device-resident pipeline (`models.groth16_device.DeviceProver`) runs as
its OWN `shard_map` program — scalar pipeline, then the four MSMs — so
every device proves its local witness concurrently with no collectives
on the hot path, and each SPMD executable stays small enough to compile
quickly (a monolithic all-MSM program costs ~45 min of XLA:CPU codegen;
the split pieces compile in minutes and persist in the compile cache).

For one giant circuit there is also the latency path: point-sharded MSMs
(`parallel.msm_sharded`) + coefficient-sharded NTTs
(`parallel.ntt_sharded`).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from manta_tpu.models import groth16 as G
from manta_tpu.models.groth16_device import DeviceProver
from manta_tpu.ops import msm as M
from manta_tpu.ops.curve import JacobianPoint
from manta_tpu.parallel.mesh import DATA_AXIS
from manta_tpu.utils import aotcache as AOT


def _batch_spec(rank: int):
    return P(DATA_AXIS, *([None] * (rank - 1)))


@functools.lru_cache(maxsize=None)
def _sharded_msm_program(cops, mesh, window_bits, steps, scalar_bits, crank):
    """Batch-DP MSM: (B, S_L, n) scalars sharded on B, replicated points;
    each device runs the full Pippenger kernel on its local witness."""

    def local(sc, px, py, pz):
        r = M.msm(
            cops,
            sc[0],
            JacobianPoint(px, py, pz),
            window_bits,
            False,
            steps,
            scalar_bits,
            True,
        )
        return r.x[None], r.y[None], r.z[None]

    pt_spec = P(*([None] * crank))
    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None, None), pt_spec, pt_spec, pt_spec),
            out_specs=(
                P(DATA_AXIS, *([None] * crank)),
            ) * 3,
            check_vma=False,
        )
    )


def prove_batch_sharded(
    prover: DeviceProver,
    assignments: Sequence[Sequence[int]],
    mesh,
    rands: Optional[Sequence[tuple]] = None,
) -> List[G.Proof]:
    """Prove B witnesses with the batch axis sharded across `mesh` (one
    witness per device per wave). Ragged final waves are padded by
    repeating the last witness (the duplicate proofs are dropped before
    returning) — the reference's rayon batching has no divisibility
    constraint and neither should this."""
    B = len(assignments)
    D = mesh.devices.size
    if rands is None:
        rands = [(0, 0)] * B
    pad = (-B) % D
    if pad:
        assignments = list(assignments) + [assignments[-1]] * pad
        rands = list(rands) + [rands[-1]] * pad

    # The sparse matrices + masks ride in as shard_map INPUTS with fully
    # replicated specs (P()), never closure captures — captured arrays are
    # baked into the lowered program as constants, which at spend-shape
    # scale pushes the serialized program past the relay's request limit.
    def make_scalars_sh():
        return jax.jit(
            jax.shard_map(
                lambda zm, zc, bufs: tuple(
                    s[None]
                    for s in prover._prove_scalars(zm[0], zc[0], bufs)
                ),
                mesh=mesh,
                in_specs=(
                    P(DATA_AXIS, None, None),
                    P(DATA_AXIS, None, None),
                    P(),
                ),
                out_specs=(P(DATA_AXIS, None, None),) * 4,
                check_vma=False,
            )
        )

    proofs: List[G.Proof] = []
    for wave in range(0, B + pad, D):
        batch = assignments[wave : wave + D]
        enc = [prover._encode_witness(a) for a in batch]
        zm = jnp.stack([e[0] for e in enc])
        zc = jnp.stack([e[1] for e in enc])
        # trace+lower once per source revision: the interpret-mode Pallas
        # bodies in these programs cost minutes of re-tracing per process
        # on the virtual CPU mesh (see utils/aotcache.py)
        sc_a, sc_b1, sc_b2, sc_lh = AOT.call_cached(
            "prover_scalars_sh", make_scalars_sh, mesh,
            zm, zc, prover._buffers,
        )

        def run(cops, sc_b, pts, n):
            crank = pts.x.ndim

            def make():
                return _sharded_msm_program(
                    cops,
                    mesh,
                    prover.window_bits,
                    min(n, prover.column_steps),
                    prover.fr.bits,
                    crank,
                )

            tag = (
                f"prover_msm:{cops.curve.name}:{cops.backend}:"
                f"{prover.window_bits}:{min(n, prover.column_steps)}"
            )
            return AOT.call_cached(tag, make, mesh, sc_b, pts.x, pts.y, pts.z)

        # shape-normalize the lh MSM to the a/b1 lane count so all three
        # G1 MSMs share ONE compiled program (each XLA:CPU compile of the
        # interpret-mode MSM body costs minutes on the virtual mesh; the
        # padded lanes are zero scalars + infinity points)
        n_g1 = max(prover.n_ab, prover.n_lh)

        def pad_lanes(arr, n, fill=0):
            if arr.shape[-1] == n:
                return arr
            pad = [(0, 0)] * (arr.ndim - 1) + [(0, n - arr.shape[-1])]
            return jnp.pad(arr, pad, constant_values=fill)

        def pad_pts(pts, n):
            if pts.x.shape[-1] == n:
                return pts
            return JacobianPoint(
                pad_lanes(pts.x, n), pad_lanes(pts.y, n), pad_lanes(pts.z, n)
            )

        a_b = run(prover.g1, pad_lanes(sc_a, n_g1), pad_pts(prover.a_pts, n_g1), n_g1)
        b1_b = run(prover.g1, pad_lanes(sc_b1, n_g1), pad_pts(prover.b1_pts, n_g1), n_g1)
        b2_b = run(prover.g2, sc_b2, prover.b2_pts, prover.n_ab)
        lh_b = run(prover.g1, pad_lanes(sc_lh, n_g1), pad_pts(prover.lh_pts, n_g1), n_g1)
        for i, assignment in enumerate(batch):
            accs = tuple(
                JacobianPoint(t[0][i], t[1][i], t[2][i])
                for t in (a_b, b1_b, b2_b, lh_b)
            )
            r_rand, s_rand = rands[wave + i]
            proofs.append(prover._finish(accs, assignment, r_rand, s_rand))
    return proofs[:B]
