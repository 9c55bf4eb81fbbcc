"""Radix-2 NTT / iNTT over the scalar field on device.

Replaces ark-poly's `Radix2EvaluationDomain` (used inside the reference's
Groth16 prover for the h(x) coset FFTs and in trusted-setup initialization,
SURVEY.md §2.9#4). Domain conventions match arkworks exactly:

- domain generator ω = TWO_ADIC_ROOT_OF_UNITY^(2^(s - log2 n)) — reproduced
  by `FieldSpec.root_of_unity` from the same multiplicative generator.
- `ntt` maps coefficients -> evaluations at ω^i in natural order.
- `coset_*` variants evaluate on the coset g·ω^i with g the field's
  multiplicative generator (arkworks' `coset_fft`).

Implementation: constant-geometry decimation-in-time after a bit-reversal
gather. Every stage works on identically-shaped (L, ..., n) arrays — one
XOR-partner gather, one full-width Montgomery multiply by a per-stage
twiddle row, one add/sub/select — so the whole stage sweep is a SINGLE
`lax.fori_loop` body indexing stacked (stages, n) permutation/twiddle
tables. The rolled loop keeps the compiled graph size independent of
log2(n): the production Groth16 domains (2^13-2^16, 13-16 stages of
~1000-op big-int multiplies each) would otherwise unroll into multi-minute
XLA compiles on both CPU and TPU.

(The constant-geometry form multiplies all n lanes instead of n/2 — 2x the
VPU multiply work of the half-width form — but the NTT is a small slice of
the prover next to its MSMs, and compile time was the binding constraint.)

Works on (L, ..., n): the transform runs along the LAST axis, any axes in
between are batch (e.g. many polynomials at once).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from manta_tpu.ops import field_ops as F
from manta_tpu.fields import FieldSpec


@functools.lru_cache(maxsize=None)
def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _stage_tables(spec: FieldSpec, n: int, inverse: bool):
    """Stacked per-stage tables for the constant-geometry sweep.

    Returns (partner, hi_bit, tw):
      partner (S, n) int32 — XOR-partner lane index per stage,
      hi_bit  (S, n) uint32 — 1 where the lane is the high half of its pair,
      tw      (S, L, n) uint32 — Montgomery twiddle w_{2^s}^(j mod 2^(s-1))
                                 broadcast to every lane of the pair.
    """
    omega = spec.root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, spec.modulus)
    S = n.bit_length() - 1
    j = np.arange(n)
    partners, hi_bits, tws = [], [], []
    for s in range(1, S + 1):
        half = 1 << (s - 1)
        partners.append((j ^ half).astype(np.int32))
        hi_bits.append(((j & half) != 0).astype(np.uint32))
        w = pow(omega, n >> s, spec.modulus)
        pw = [1] * half
        for k in range(1, half):
            pw[k] = pw[k - 1] * w % spec.modulus
        tws.append(np.asarray(F.encode_ints(spec, [pw[v] for v in (j & (half - 1))])))
    return (
        np.stack(partners),
        np.stack(hi_bits),
        np.stack(tws),
    )


@functools.lru_cache(maxsize=None)
def _coset_powers(spec: FieldSpec, n: int, inverse: bool) -> np.ndarray:
    g = spec.generator
    if inverse:
        g = pow(g, -1, spec.modulus)
    pw = [1] * n
    for i in range(1, n):
        pw[i] = pw[i - 1] * g % spec.modulus
    return F.encode_ints(spec, pw)


def ntt_with_tables(
    spec: FieldSpec,
    a: jnp.ndarray,
    perm: jnp.ndarray,
    partner: jnp.ndarray,
    hi_bit: jnp.ndarray,
    tw: jnp.ndarray,
    inverse: bool = False,
) -> jnp.ndarray:
    """NTT core with the permutation/twiddle tables as traced ARGUMENTS.

    `ntt` closes over the tables as compile-time constants — fine inside
    larger programs at prover domains, but at 2^20 the baked tables are
    ~1.4 GB of HLO constants, which the axon relay's request path cannot
    carry. Standalone/bench callers jit THIS function with device-resident
    tables instead."""
    n = a.shape[-1]
    x = jnp.take(a, perm, axis=-1)
    batch_rank = x.ndim - 2  # axes between L and n
    bshape = (1,) * batch_rank
    hi_bit = hi_bit.reshape(hi_bit.shape[0], *bshape, n)
    tw = tw.reshape(tw.shape[0], spec.num_limbs, *bshape, n)

    def stage(s, x):
        xp = jnp.take(x, partner[s], axis=-1)
        hi = hi_bit[s]
        # per-lane views of the pair: lo = x[j & ~half], hi_v = x[j | half]
        lo = jnp.where(hi, xp, x)
        hi_v = jnp.where(hi, x, xp)
        v = F.mont_mul(spec, hi_v, tw[s])
        return jnp.where(hi, F.sub(spec, lo, v), F.add(spec, lo, v))

    x = jax.lax.fori_loop(0, partner.shape[0], stage, x)
    if inverse:
        n_inv = F.const(spec, pow(n, -1, spec.modulus))
        x = F.mont_mul(
            spec,
            x,
            jnp.asarray(n_inv).reshape(
                (spec.num_limbs,) + (1,) * (x.ndim - 1)
            ),
        )
    return x


def device_tables(spec: FieldSpec, n: int, inverse: bool):
    """(perm, partner, hi_bit, tw) as jnp arrays for `ntt_with_tables`."""
    partner, hi_bit, tw = _stage_tables(spec, n, inverse)
    return (
        jnp.asarray(_bit_reverse_perm(n)),
        jnp.asarray(partner),
        jnp.asarray(hi_bit),
        jnp.asarray(tw),
    )


def ntt(spec: FieldSpec, a: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """NTT along the last axis. a: (L, ..., n) Montgomery-form limbs."""
    n = a.shape[-1]
    assert n & (n - 1) == 0, "n must be a power of two"
    if n == 1:
        return a
    perm = jnp.asarray(_bit_reverse_perm(n))
    partner, hi_bit, tw = _stage_tables(spec, n, inverse)
    return ntt_with_tables(
        spec,
        a,
        perm,
        jnp.asarray(partner),
        jnp.asarray(hi_bit),
        jnp.asarray(tw),
        inverse,
    )


def intt(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return ntt(spec, a, inverse=True)


def coset_ntt(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Evaluate coefficients on the coset g·ω^i (arkworks coset_fft)."""
    n = a.shape[-1]
    pw = jnp.asarray(_coset_powers(spec, n, False)).reshape(
        (spec.num_limbs,) + (1,) * (a.ndim - 2) + (n,)
    )
    return ntt(spec, F.mont_mul(spec, a, pw))


def coset_intt(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `coset_ntt` (arkworks coset_ifft)."""
    n = a.shape[-1]
    x = ntt(spec, a, inverse=True)
    pw = jnp.asarray(_coset_powers(spec, n, True)).reshape(
        (spec.num_limbs,) + (1,) * (a.ndim - 2) + (n,)
    )
    return F.mont_mul(spec, x, pw)


ntt_jit = jax.jit(ntt, static_argnums=(0, 2))
