"""Device-accelerated phase-2 ceremony initialization.

`phase2.initialize` (reference `manta-trusted-setup/src/groth16/mpc.rs:355-431`)
has two hot blocks that are infeasible on host bignums at production scale
(domain 2^16 × 3 circuits):

1. the *group-element* inverse NTT producing Lagrange-basis commitments
   [L_j(τ)]G over G1 (×3 chains) and G2 (`mpc.rs:378-381`, ark-poly ifft
   at GroupProjective) — here `ops.group_ntt.group_intt` on device;
2. `specialize_to_phase_2` (`mpc.rs:251-294`): every R1CS entry (j, c,
   coeff) contributes coeff·[L_j] to query column c — a sparse
   matrix × Lagrange-point product. Here each matrix side runs as ONE
   batched device pass: gather Lagrange points by row, batched
   variable-base scalar-mul by the coefficients, batch-normalize, then
   bucket-accumulate by column through the MSM machinery's sorted
   segmented reduction (`ops.msm._bucket_sums` — a column IS a Pippenger
   bucket).

h_query ([τ^i Z(τ)] = [τ^(i+m)] − [τ^i]) is a single batched point
subtract. The host path (`phase2.initialize`) remains the oracle; tests
check equality at small domains.
"""

from __future__ import annotations

from typing import List, Sequence

from manta_tpu.ceremony import kzg as KZG
from manta_tpu.ceremony import phase2 as P2
from manta_tpu.models import groth16 as G
from manta_tpu.models.circuit import ConstraintMatrices


def _pad_to(n: int, mult: int) -> int:
    return -(-n // mult) * mult


def _bucket_combine(cops, lagrange_pts, entries, num_cols: int):
    """sum_{(j,c,coeff) in entries} coeff*L_j into per-column buckets.

    lagrange_pts: encoded affine point batch (m lanes). entries: list of
    (row, col, coeff). Returns a decoded list of num_cols host points."""
    import jax.numpy as jnp

    from manta_tpu.ops import field_ops as F
    from manta_tpu.ops import msm as M
    from manta_tpu.ops.curve import JacobianPoint

    spec = cops.curve.scalar_field
    E = len(entries)
    E2 = max(_pad_to(E, 128), 128)
    rows = [e[0] for e in entries] + [0] * (E2 - E)
    cols = [e[1] for e in entries] + [0] * (E2 - E)
    coeffs = [e[2] % spec.modulus for e in entries] + [0] * (E2 - E)

    def take(a):
        return jnp.take(a, jnp.asarray(rows, dtype=jnp.int32), axis=-1)

    gathered = JacobianPoint(
        take(lagrange_pts.x), take(lagrange_pts.y), take(lagrange_pts.z)
    )
    # padding lanes: scalar 0 -> infinity product -> identity in bucket 0
    sc = jnp.asarray(F.encode_ints(spec, coeffs, montgomery=False))
    prods = cops.to_affine(cops.scalar_mul(sc, gathered))
    steps = min(128, E2)
    buckets = M._bucket_sums(
        cops,
        jnp.asarray(cols, dtype=jnp.int32),
        prods,
        num_cols,
        steps,
        False,
    )
    return cops.decode_points(cops.to_affine(buckets))


def initialize(
    acc: KZG.Accumulator,
    matrices: ConstraintMatrices,
    backend: str = "fused",
) -> P2.Phase2State:
    """Device analogue of `phase2.initialize` (same output, bit for bit)."""
    import jax.numpy as jnp

    from manta_tpu.ops import curve as C
    from manta_tpu.ops import group_ntt as GN
    from manta_tpu.ops.curve import JacobianPoint

    cfg = acc.cfg
    g1ops = C.curve_ops_for(cfg.g1, backend)
    g2ops = C.curve_ops_for(cfg.g2, backend)
    rows = G._qap_rows(matrices)
    m = G._domain_size(len(rows))
    assert len(acc.tau_powers_g2) >= m, "phase-1 accumulator too small"

    # 1. Lagrange commitments: device group iNTT over the power chains
    lag_g1 = GN.group_intt_jit(g1ops, g1ops.encode_points(acc.tau_powers_g1[:m]))
    lag_alpha = GN.group_intt_jit(
        g1ops, g1ops.encode_points(acc.alpha_tau_powers_g1[:m])
    )
    lag_beta = GN.group_intt_jit(
        g1ops, g1ops.encode_points(acc.beta_tau_powers_g1[:m])
    )
    lag_g2 = GN.group_intt_jit(g2ops, g2ops.encode_points(acc.tau_powers_g2[:m]))
    lag_g1, lag_alpha, lag_beta = (
        g1ops.to_affine(lag_g1),
        g1ops.to_affine(lag_alpha),
        g1ops.to_affine(lag_beta),
    )
    lag_g2 = g2ops.to_affine(lag_g2)

    # 2. sparse specialization: per matrix side, one gather + scalar-mul +
    #    bucket pass (`specialize_to_phase_2`)
    num_vars = matrices.num_variables
    ni = matrices.num_instance
    a_entries, b_entries, c_entries = [], [], []
    for j, (a_lc, b_lc, c_lc) in enumerate(rows):
        for col, coeff in a_lc.items():
            a_entries.append((j, col, coeff))
        for col, coeff in b_lc.items():
            b_entries.append((j, col, coeff))
        for col, coeff in c_lc.items():
            c_entries.append((j, col, coeff))

    a_query = _bucket_combine(g1ops, lag_g1, a_entries, num_vars)
    b_g1_query = _bucket_combine(g1ops, lag_g1, b_entries, num_vars)
    b_g2_query = _bucket_combine(g2ops, lag_g2, b_entries, num_vars)
    # abc[col] = Σ coeff·(β-chain for A, α-chain for B, τ-chain for C)
    abc = _bucket_combine(
        g1ops,
        lag_beta,
        a_entries,
        num_vars,
    )
    abc_b = _bucket_combine(g1ops, lag_alpha, b_entries, num_vars)
    abc_c = _bucket_combine(g1ops, lag_g1, c_entries, num_vars)
    host_g1 = cfg.g1
    abc = [
        host_g1.add(host_g1.add(x, y), z)
        for x, y, z in zip(abc, abc_b, abc_c)
    ]

    # 3. h_query on device: [τ^(i+m)] − [τ^i], i < m−1 (padded to the
    #    lane multiple with infinity)
    n_h = m - 1
    n_h2 = max(_pad_to(n_h, 128), 128)
    t1 = acc.tau_powers_g1
    hi_pts = [t1[i + m] for i in range(n_h)] + [None] * (n_h2 - n_h)
    lo_pts = [t1[i] for i in range(n_h)] + [None] * (n_h2 - n_h)
    hi_enc = g1ops.encode_points(hi_pts)
    lo_enc = g1ops.encode_points(lo_pts)
    diff = g1ops.to_affine(g1ops.add(hi_enc, g1ops.neg(lo_enc)))
    h_query = g1ops.decode_points(diff)[:n_h]

    return P2.Phase2State(
        cfg=cfg,
        domain_size=m,
        alpha_g1=acc.alpha_tau_powers_g1[0],
        beta_g1=acc.beta_tau_powers_g1[0],
        beta_g2=acc.beta_g2,
        delta_g1=cfg.g1.generator,
        delta_g2=cfg.g2.generator,
        a_query=a_query,
        b_g1_query=b_g1_query,
        b_g2_query=b_g2_query,
        gamma_abc_g1=abc[:ni],
        l_query=abc[ni:],
        h_query=h_query,
        num_instance=ni,
    )
