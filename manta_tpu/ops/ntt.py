"""Radix-2 NTT / iNTT over the scalar field on device.

Replaces ark-poly's `Radix2EvaluationDomain` (used inside the reference's
Groth16 prover for the h(x) coset FFTs and in trusted-setup initialization,
SURVEY.md §2.9#4). Domain conventions match arkworks exactly:

- domain generator ω = TWO_ADIC_ROOT_OF_UNITY^(2^(s - log2 n)) — reproduced
  by `FieldSpec.root_of_unity` from the same multiplicative generator.
- `ntt` maps coefficients -> evaluations at ω^i in natural order.
- `coset_*` variants evaluate on the coset g·ω^i with g the field's
  multiplicative generator (arkworks' `coset_fft`).

Implementation: decimation-in-time butterflies after a bit-reversal gather;
each of the log2(n) stages is one lane-parallel Montgomery multiply of half
the array by precomputed (Montgomery-form) twiddles plus an add/sub pair —
shapes are static so XLA fuses each stage into a couple of fused loops.
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
def _stage_twiddles(spec: FieldSpec, n: int, inverse: bool):
    """Montgomery-form twiddle arrays w_{2^s}^j, j < 2^(s-1), per stage."""
    omega = spec.root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, spec.modulus)
    out = []
    for s in range(1, n.bit_length()):
        m = 1 << s
        w = pow(omega, n // m, spec.modulus)
        tw = [1] * (m // 2)
        for j in range(1, m // 2):
            tw[j] = tw[j - 1] * w % spec.modulus
        out.append(F.encode_ints(spec, tw))  # (L, m//2) Montgomery
    return out


@functools.lru_cache(maxsize=None)
def _coset_powers(spec: FieldSpec, n: int, inverse: bool) -> np.ndarray:
    g = spec.generator
    if inverse:
        g = pow(g, -1, spec.modulus)
    pw = [1] * n
    for i in range(1, n):
        pw[i] = pw[i - 1] * g % spec.modulus
    return F.encode_ints(spec, pw)


def ntt(spec: FieldSpec, a: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """NTT along the last axis. a: (L, ..., n) Montgomery-form limbs."""
    n = a.shape[-1]
    assert n & (n - 1) == 0, "n must be a power of two"
    if n == 1:
        return a
    perm = jnp.asarray(_bit_reverse_perm(n))
    x = jnp.take(a, perm, axis=-1)
    batch_rank = x.ndim - 2  # axes between L and n
    for s, tw in enumerate(_stage_twiddles(spec, n, inverse), start=1):
        m = 1 << s
        half = m // 2
        shape = (*x.shape[:-1], n // m, 2, half)
        xr = x.reshape(shape)
        u = xr[..., 0, :]
        v = xr[..., 1, :]
        twd = jnp.asarray(tw).reshape(
            (spec.num_limbs,) + (1,) * batch_rank + (1, half)
        )
        vw = F.mont_mul(spec, v, twd)
        x = jnp.stack(
            [F.add(spec, u, vw), F.sub(spec, u, vw)], axis=-2
        ).reshape(*a.shape)
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
