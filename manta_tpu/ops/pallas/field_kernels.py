"""Pallas TPU kernels for the batched Montgomery field ops.

Why: the pure-XLA limb arithmetic inlines ~700 HLO ops per field multiply;
a Pippenger MSM graph instantiates the complete-addition formula ~11 times
(≈150k HLO ops) which the TPU compiler chews on for tens of minutes. Moving
each field op into a Pallas kernel makes every instantiation a single
custom call: the enclosing XLA graph collapses to a few hundred ops, and
Mosaic compiles each (kernel × shape) once.

The kernels run the SAME limb algorithms as `manta_tpu.ops.field_ops`
(school product -> lazy columns -> REDC, carry chains, lazy [0,2p)
domain) on (L, BLOCK) tiles resident in VMEM, gridded over the batch axis.
All modulus limbs are baked in as Python-int immediates (Pallas kernels
cannot capture array constants). All arithmetic is int32-safe: every
intermediate is < 2^27.

Enable with MANTA_TPU_PALLAS=1 (or auto when a TPU backend is active);
`field_ops` dispatches here for batch shapes divisible by 256.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from manta_tpu.fields import LIMB_BITS, LIMB_MASK, FieldSpec

BLOCK = 256
MASK = LIMB_MASK  # python int immediate
BASE = 1 << LIMB_BITS


def _limbs_of(value: int, count: int):
    return [(value >> (LIMB_BITS * i)) & LIMB_MASK for i in range(count)]


def _school_redc(spec: FieldSpec, a, b):
    """Schoolbook product + REDC on (L, BLOCK) register arrays.

    Row-sliced form: columns live in a Python list of per-limb vectors
    (Pallas TPU has no scatter; the unrolled list form lowers to pure VPU
    adds/muls). A sublane-BLOCKED variant (full-tile multiplies + static
    jnp.pad shifts, as used by the 12-bit BLS path in
    `point_kernels._KernelCoordOps12.mul`) measured FASTER for L = 32
    12-bit limbs but ~20% SLOWER end-to-end for the L = 16 BN254 prover
    kernels — at small L the pad/add overhead of (2L+1)-row tiles
    outweighs the sublane-occupancy win, so the 16-bit path keeps rows.
    """
    L = spec.num_limbs
    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * L + 1)
    a_rows = [a[i] for i in range(L)]
    b_rows = [b[j] for j in range(L)]
    for i in range(L):
        ai = a_rows[i]
        for j in range(L):
            pr = ai * b_rows[j]
            cols[i + j] = cols[i + j] + (pr & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (pr >> LIMB_BITS)
    n0_inv = spec.n0_inv  # python int immediate
    p_limbs = _limbs_of(spec.modulus, L)
    for i in range(L):
        carry = cols[i] >> LIMB_BITS
        t = cols[i] & MASK
        m = (t * n0_inv) & MASK
        c2 = None
        for j in range(L):
            pr = m * p_limbs[j]
            lo = pr & MASK
            hi = pr >> LIMB_BITS
            if j == 0:
                c2 = (t + lo) >> LIMB_BITS
            else:
                cols[i + j] = cols[i + j] + lo
            cols[i + j + 1] = cols[i + j + 1] + hi
        cols[i + 1] = cols[i + 1] + carry + c2
    outs = []
    carry = zero
    for i in range(L):
        t2 = cols[L + i] + carry
        outs.append(t2 & MASK)
        carry = t2 >> LIMB_BITS
    return jnp.stack(outs)


def _school_sqr_redc(spec: FieldSpec, a):
    """Squaring entry point (Mosaic CSE already dedupes the commutative
    duplicate products of mul(a, a) — measured ~0% for an explicit
    symmetric form)."""
    return _school_redc(spec, a, a)


def _add_limbs(a, b):
    L = a.shape[0]
    outs = []
    carry = jnp.zeros_like(a[0])
    for i in range(L):
        t = a[i] + b[i] + carry
        outs.append(t & MASK)
        carry = t >> LIMB_BITS
    return outs, carry


def _sub_const_limbs(a_list, const_limbs):
    """a - const with borrow chain; a_list: per-limb vectors."""
    outs = []
    borrow = jnp.zeros_like(a_list[0])
    for ai, ci in zip(a_list, const_limbs):
        t = ai + (BASE - ci) - borrow
        outs.append(t & MASK)
        borrow = jnp.uint32(1) - (t >> LIMB_BITS)
    return outs, borrow


def _add_const_limbs(a_list, const_limbs):
    outs = []
    carry = jnp.zeros_like(a_list[0])
    for ai, ci in zip(a_list, const_limbs):
        t = ai + ci + carry
        outs.append(t & MASK)
        carry = t >> LIMB_BITS
    return outs, carry


def _sub_limbs(a, b):
    L = a.shape[0]
    outs = []
    borrow = jnp.zeros_like(a[0])
    for i in range(L):
        t = a[i] + BASE - b[i] - borrow
        outs.append(t & MASK)
        borrow = jnp.uint32(1) - (t >> LIMB_BITS)
    return outs, borrow


def _mul_kernel(spec: FieldSpec, a_ref, b_ref, o_ref):
    o_ref[:, :] = _school_redc(spec, a_ref[:, :], b_ref[:, :])


def _add_kernel(spec: FieldSpec, a_ref, b_ref, o_ref):
    L = spec.num_limbs
    a = a_ref[:, :]
    b = b_ref[:, :]
    s, carry = _add_limbs(a, b)
    two_p = _limbs_of(2 * spec.modulus, L)
    diff, borrow = _sub_const_limbs(s, two_p)
    ge = jnp.logical_or(borrow == 0, carry != 0)
    o_ref[:, :] = jnp.where(ge, jnp.stack(diff), jnp.stack(s))


def _sub_kernel(spec: FieldSpec, a_ref, b_ref, o_ref):
    L = spec.num_limbs
    d, borrow = _sub_limbs(a_ref[:, :], b_ref[:, :])
    two_p = _limbs_of(2 * spec.modulus, L)
    d_plus, _ = _add_const_limbs(d, two_p)
    o_ref[:, :] = jnp.where(borrow != 0, jnp.stack(d_plus), jnp.stack(d))


@functools.lru_cache(maxsize=None)
def _binary_op(spec: FieldSpec, which: str, n: int):
    """Build the pallas_call for a (L, n) x (L, n) -> (L, n) op."""
    L = spec.num_limbs
    kernel = {
        "mul": functools.partial(_mul_kernel, spec),
        "add": functools.partial(_add_kernel, spec),
        "sub": functools.partial(_sub_kernel, spec),
    }[which]
    block = min(BLOCK, n)
    grid = n // block
    spec_in = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(grid,),
        in_specs=[spec_in, spec_in],
        out_specs=pl.BlockSpec(
            (L, block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
    )


def eligible(a: jnp.ndarray, b: jnp.ndarray) -> bool:
    """Pallas path handles equal-shape operands with batch % BLOCK == 0."""
    if a.shape != b.shape:
        return False
    batch = 1
    for d in a.shape[1:]:
        batch *= d
    return batch >= BLOCK and batch % BLOCK == 0


def _run(spec: FieldSpec, which: str, a: jnp.ndarray, b: jnp.ndarray):
    shape = a.shape
    L = shape[0]
    n = 1
    for d in shape[1:]:
        n *= d
    out = _binary_op(spec, which, n)(a.reshape(L, n), b.reshape(L, n))
    return out.reshape(shape)


def mont_mul(spec: FieldSpec, a, b):
    return _run(spec, "mul", a, b)


def add(spec: FieldSpec, a, b):
    return _run(spec, "add", a, b)


def sub(spec: FieldSpec, a, b):
    return _run(spec, "sub", a, b)
