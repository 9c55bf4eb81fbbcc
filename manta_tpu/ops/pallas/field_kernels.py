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

    Sublane-BLOCKED formulation: the row-sliced schoolbook issues
    (1, lanes)-extent ops for every limb product, leaving most VPU
    sublanes idle; instead each limb j of b contributes one full
    (L, lanes)-tile multiply `a * b[j]` whose split halves are added at
    static offsets j / j+1 via jnp.pad (Pallas TPU has no scatter-add).
    Measured 1.42x the row-sliced form on-chip (tools/tune_mul.py).
    Column depth stays < 2^23 for L <= 24, so everything fits uint32."""
    L = spec.num_limbs
    W = 2 * L + 1
    lanes = a.shape[-1]
    cols = jnp.zeros((W, lanes), jnp.uint32)
    for j in range(L):
        pr = a * b[j][None, :]  # (L, lanes) full-tile 16x16 products
        lo = pr & MASK
        hi = pr >> LIMB_BITS
        cols = cols + jnp.pad(lo, ((j, W - L - j), (0, 0)))
        cols = cols + jnp.pad(hi, ((j + 1, W - L - j - 1), (0, 0)))
    # blocked Montgomery REDC
    n0_inv = spec.n0_inv  # python int immediate
    p_limbs = _limbs_of(spec.modulus, L)
    p_tile = jnp.stack([jnp.full((lanes,), v, jnp.uint32) for v in p_limbs])
    for i in range(L):
        m = ((cols[i] & MASK) * n0_inv) & MASK
        mp = m[None, :] * p_tile  # (L, lanes); (2^16-1)^2 < 2^32
        mp_lo = mp & MASK
        mp_hi = mp >> LIMB_BITS
        # (cols[i] + mp_lo[0]) >> 16 == old_carry + c2 exactly
        carry_row = (cols[i] + mp_lo[0]) >> LIMB_BITS
        bump = (
            jnp.pad(mp_lo, ((i, W - L - i), (0, 0)))
            + jnp.pad(mp_hi, ((i + 1, W - L - i - 1), (0, 0)))
            + jnp.pad(carry_row[None, :], ((i + 1, W - i - 2), (0, 0)))
        )
        cols = cols + bump
    outs = []
    carry = jnp.zeros_like(cols[0])
    for i in range(L):
        t2 = cols[L + i] + carry
        outs.append(t2 & MASK)
        carry = t2 >> LIMB_BITS
    return jnp.stack(outs)


def _school_sqr_redc(spec: FieldSpec, a):
    """Squaring entry point (the blocked schoolbook already issues one
    full-tile multiply per limb row of b; no separate symmetric form)."""
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
