"""Radix-2 inverse NTT over GROUP ELEMENTS (G1/G2 points) on device.

The trusted-setup phase-2 initialization computes Lagrange-basis
commitments [L_j(τ)]G from the powers-of-tau chains with a *point-valued*
iFFT (`manta-trusted-setup/src/groth16/mpc.rs:378-381`, ark-poly
`Radix2EvaluationDomain::ifft` instantiated at `GroupProjective`).
At production domains (2^16 × 3 circuits) the host big-int recursion is
infeasible; this is the device analogue: the scalar kernel's
constant-geometry stage sweep (`ops/ntt.py`) with the butterfly's twiddle
multiply replaced by a batched variable-base point scalar-mul and the
add/sub by the group law.

Stage s (pairs XOR-partnered at distance 2^(s-1), all-lane shapes):
    u = lo(pair),  v = ω^{-j}·hi(pair)      (batched `CurveOps.scalar_mul`)
    out_lo = u + v,  out_hi = u − v          (batched point add)
Final sweep multiplies every lane by n^{-1}.

The lo lanes ride through the scalar-mul with multiplier 1 (constant
geometry trades 2× the multiply work for a shape-static rolled loop —
same trade as the scalar kernel, where compile time is the binding
constraint; the select/where lane-splitting of the half-width form would
double the Mosaic kernel count).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from manta_tpu.fields import FieldSpec
from manta_tpu.ops import field_ops as F
from manta_tpu.ops.curve import CurveOps, JacobianPoint
from manta_tpu.ops.ntt import _bit_reverse_perm


@functools.lru_cache(maxsize=None)
def _group_stage_tables(spec: FieldSpec, n: int):
    """(partner (S,n) int32, hi_bit (S,n) uint32, tw (S,L,n) uint32).

    Twiddles are CANONICAL scalar limbs, ω^{-(j mod half)} broadcast to
    BOTH lanes of each pair (partners share j mod half, exactly as the
    scalar kernel's tables) — `CurveOps.scalar_mul` consumes canonical,
    not Montgomery, limbs."""
    r = spec.modulus
    omega_inv = pow(spec.root_of_unity(n), -1, r)
    S = n.bit_length() - 1
    j = np.arange(n)
    partners, hi_bits, tws = [], [], []
    for s in range(1, S + 1):
        half = 1 << (s - 1)
        hi = ((j & half) != 0).astype(np.uint32)
        partners.append((j ^ half).astype(np.int32))
        hi_bits.append(hi)
        w = pow(omega_inv, n >> s, r)
        pw = [1] * half
        for k in range(1, half):
            pw[k] = pw[k - 1] * w % r
        lane_tw = [pw[v] for v in (j & (half - 1))]
        tws.append(
            np.asarray(F.encode_ints(spec, lane_tw, montgomery=False))
        )
    return np.stack(partners), np.stack(hi_bits), np.stack(tws)


def group_intt(cops: CurveOps, pts: JacobianPoint) -> JacobianPoint:
    """Inverse group NTT along the last axis of a 1-D point batch.

    pts: n-lane Jacobian batch (n a power of two). Returns the
    coefficient (Lagrange-commitment) points, natural order, Jacobian."""
    n = pts.x.shape[-1]
    assert n & (n - 1) == 0, "n must be a power of two"
    spec = cops.curve.scalar_field
    if n == 1:
        return pts
    perm = jnp.asarray(_bit_reverse_perm(n))

    def take(a):
        return jnp.take(a, perm, axis=-1)

    x = JacobianPoint(take(pts.x), take(pts.y), take(pts.z))
    partner_t, hi_t, tw_t = _group_stage_tables(spec, n)
    partner_t = jnp.asarray(partner_t)
    hi_t = jnp.asarray(hi_t)
    tw_t = jnp.asarray(tw_t)

    def stage(s, carry):
        p = JacobianPoint(*carry)
        idx = partner_t[s]

        def g(a):
            return jnp.take(a, idx, axis=-1)

        xp = JacobianPoint(g(p.x), g(p.y), g(p.z))
        hi = hi_t[s] != 0

        def pick(cond, a, b):
            return cops.ops.select(cond, a, b)

        lo = JacobianPoint(
            pick(hi, xp.x, p.x), pick(hi, xp.y, p.y), pick(hi, xp.z, p.z)
        )
        hi_v = JacobianPoint(
            pick(hi, p.x, xp.x), pick(hi, p.y, xp.y), pick(hi, p.z, xp.z)
        )
        v = cops.scalar_mul(tw_t[s], hi_v)
        add = cops.add(lo, v)
        sub = cops.add(lo, cops.neg(v))
        return tuple(
            JacobianPoint(
                pick(hi, sub.x, add.x),
                pick(hi, sub.y, add.y),
                pick(hi, sub.z, add.z),
            )
        )

    x = JacobianPoint(
        *jax.lax.fori_loop(0, partner_t.shape[0], stage, tuple(x))
    )
    n_inv = pow(n, -1, spec.modulus)
    n_inv_limbs = jnp.asarray(
        np.broadcast_to(
            np.asarray(
                F.encode_ints(spec, [n_inv], montgomery=False)
            ),
            (spec.num_limbs, n),
        )
    )
    return cops.scalar_mul(n_inv_limbs, x)


group_intt_jit = jax.jit(group_intt, static_argnums=(0,))


def group_intt_points(cops: CurveOps, points: list) -> list:
    """Host convenience: affine host tuples -> device iNTT -> affine host
    tuples (the `group_intt` entry the ceremony initialization uses)."""
    enc = cops.encode_points(list(points))
    out = group_intt_jit(cops, enc)
    return cops.decode_points(cops.to_affine(out))
