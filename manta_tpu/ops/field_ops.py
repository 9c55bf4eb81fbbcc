"""Batched prime-field arithmetic on device (JAX/XLA, TPU-first).

Field elements are little-endian base-2^16 limb vectors stored as uint32 in
**limb-major layout**: shape ``(L, ...)`` where ``L = spec.num_limbs`` and all
trailing axes are batch. Limb-major keeps the (large) batch axis on the TPU's
128-wide vector lanes; the limb axis lives on sublanes where the sequential
carry/REDC chains are cheap broadcasts.

Values are kept in **Montgomery form** (x·R mod p, R = 2^(16·L)) during
computation. All ops are pure functions of ``(spec, arrays)`` — ``spec`` is a
static `manta_tpu.fields.FieldSpec`, so everything jits cleanly and constants
fold into the compiled program.

Why 16-bit limbs in uint32: a 16×16-bit product fits exactly in uint32, and
splitting each product into (lo, hi) 16-bit halves lets us lazily accumulate
up to ~2^6 partial products per column without overflow — carry propagation
happens once per multiplication, not once per partial product. This replaces
the 64-bit Montgomery pipelines of the reference's arkworks backend
(reference `manta-crypto/src/arkworks/constraint/fp.rs`, ark-ff Montgomery
64-bit limbs) with a formulation the TPU VPU executes natively.

The two-phase API (`school_prod` / `redc`) exposes the unreduced 2L-limb
column accumulator so linear combinations (MDS rows, NTT butterflies, sparse
R1CS rows) can sum products **before** reduction — one REDC per output term
instead of one per product.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from manta_tpu import fields
from manta_tpu.fields import LIMB_BITS, LIMB_MASK, FieldSpec

MASK = jnp.uint32(LIMB_MASK)


@functools.lru_cache(maxsize=1)
def _pallas_enabled() -> bool:
    """Pallas kernel dispatch: MANTA_TPU_PALLAS=1/0 forces; default auto —
    enabled on TPU-like backends (where giant inlined limb graphs choke the
    compiler), disabled on CPU (where tests run tiny shapes eagerly)."""
    import os

    flag = os.environ.get("MANTA_TPU_PALLAS")
    if flag is not None:
        return flag == "1"
    try:
        platform = jax.devices()[0].platform
    except Exception:  # noqa: BLE001
        return False
    return platform not in ("cpu",)


def _maybe_pallas(which: str, spec: FieldSpec, a, b):
    """Returns the pallas result or None if the path doesn't apply."""
    if not _pallas_enabled():
        return None
    from manta_tpu.ops.pallas import field_kernels as PK

    try:
        shape = jnp.broadcast_shapes(a.shape, b.shape)
    except ValueError:
        return None
    a2 = jnp.broadcast_to(a, shape)
    b2 = jnp.broadcast_to(b, shape)
    if not PK.eligible(a2, b2):
        return None
    return getattr(PK, which)(spec, a2, b2)


# ---------------------------------------------------------------------------
# Host <-> device conversion helpers
# ---------------------------------------------------------------------------


def encode_ints(spec: FieldSpec, values, montgomery: bool = True) -> np.ndarray:
    """Python ints -> (L, N) uint32 limb array (Montgomery form by default)."""
    values = list(values)
    L = spec.num_limbs
    out = np.zeros((L, len(values)), dtype=np.uint32)
    for n, v in enumerate(values):
        v %= spec.modulus
        if montgomery:
            v = (v << (LIMB_BITS * L)) % spec.modulus
        for i in range(L):
            out[i, n] = (v >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def decode_ints(spec: FieldSpec, arr, montgomery: bool = True) -> list:
    """(L, N) limb array -> list of canonical Python ints."""
    arr = np.asarray(jax.device_get(arr), dtype=np.uint64)
    L, flat = arr.shape[0], arr.reshape(arr.shape[0], -1)
    out = []
    r_inv = spec.R_inv
    for n in range(flat.shape[1]):
        v = 0
        for i in range(L):
            v |= int(flat[i, n]) << (LIMB_BITS * i)
        if montgomery:
            v = (v * r_inv) % spec.modulus
        out.append(v)
    return out


def const(spec: FieldSpec, value: int, montgomery: bool = True) -> np.ndarray:
    """Single field constant as an (L, 1) limb column (broadcastable)."""
    return encode_ints(spec, [value], montgomery=montgomery)


def zeros(spec: FieldSpec, batch_shape) -> jnp.ndarray:
    return jnp.zeros((spec.num_limbs, *batch_shape), dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# Carry / borrow primitives (sequential over the limb axis — L steps of
# vectorized work over the batch lanes)
# ---------------------------------------------------------------------------


def _carry_propagate(acc: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """Normalize column accumulator (values < 2^32) to 16-bit limbs.

    acc: (K, ...) columns; returns (out_limbs, ...) with final carry folded
    into the top limb (caller must guarantee it fits).
    """
    K = acc.shape[0]
    outs = []
    carry = jnp.zeros_like(acc[0])
    for i in range(K):
        t = acc[i] + carry
        outs.append(t & MASK)
        carry = t >> LIMB_BITS
    while len(outs) < out_limbs:
        outs.append(carry & MASK)
        carry = carry >> LIMB_BITS
    return jnp.stack(outs[:out_limbs])


def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray):
    """(a - b) limbwise with borrow chain. Returns (diff, borrow_out)."""
    L = a.shape[0]
    outs = []
    borrow = jnp.zeros_like(a[0])
    base = jnp.uint32(1 << LIMB_BITS)
    for i in range(L):
        t = a[i] + base - b[i] - borrow
        outs.append(t & MASK)
        borrow = jnp.uint32(1) - (t >> LIMB_BITS)
    return jnp.stack(outs), borrow


def _add_limbs(a: jnp.ndarray, b: jnp.ndarray):
    """(a + b) limbwise with carry chain. Returns (sum, carry_out)."""
    L = a.shape[0]
    outs = []
    carry = jnp.zeros_like(a[0])
    for i in range(L):
        t = a[i] + b[i] + carry
        outs.append(t & MASK)
        carry = t >> LIMB_BITS
    return jnp.stack(outs), carry


def _cond_sub_modulus(spec: FieldSpec, a: jnp.ndarray, extra=None) -> jnp.ndarray:
    """a (< 2p) -> a mod p. `extra` is an optional carry/overflow limb: if
    nonzero, a >= 2^(16L) > p so the subtraction always applies."""
    p = jnp.asarray(spec.modulus_limbs, dtype=jnp.uint32).reshape(
        (spec.num_limbs,) + (1,) * (a.ndim - 1)
    )
    diff, borrow = _sub_limbs(a, jnp.broadcast_to(p, a.shape))
    ge_p = borrow == 0
    if extra is not None:
        ge_p = jnp.logical_or(ge_p, extra != 0)
    return jnp.where(ge_p, diff, a)


# ---------------------------------------------------------------------------
# Lazy-reduction domain
#
# All arithmetic keeps values in [0, 2p) ("lazy" redundant Montgomery form):
# REDC output is < 2p without a trailing conditional subtract (valid because
# 4p < R for every supported field), and add/sub reduce against 2p. The two
# residues of zero are {0, p}; `is_zero`/`eq` account for that without carry
# chains, and `normalize` folds back to canonical [0, p) for decode/compare.
# This removes one full compare-subtract chain from every multiplication —
# the dominant cost in compiled graph size AND runtime.
# ---------------------------------------------------------------------------


def _two_p_limbs(spec: FieldSpec) -> np.ndarray:
    return fields.int_to_limbs(2 * spec.modulus, spec.num_limbs)


def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    fast = _maybe_pallas("add", spec, a, b)
    if fast is not None:
        return fast
    s, carry = _add_limbs(a, b)
    two_p = jnp.asarray(_two_p_limbs(spec), dtype=jnp.uint32).reshape(
        (spec.num_limbs,) + (1,) * (s.ndim - 1)
    )
    diff, borrow = _sub_limbs(s, jnp.broadcast_to(two_p, s.shape))
    ge = jnp.logical_or(borrow == 0, carry != 0)
    return jnp.where(ge, diff, s)


def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    fast = _maybe_pallas("sub", spec, a, b)
    if fast is not None:
        return fast
    d, borrow = _sub_limbs(a, b)
    two_p = jnp.asarray(_two_p_limbs(spec), dtype=jnp.uint32).reshape(
        (spec.num_limbs,) + (1,) * (a.ndim - 1)
    )
    d_plus, _ = _add_limbs(d, jnp.broadcast_to(two_p, d.shape))
    return jnp.where(borrow != 0, d_plus, d)


def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return sub(spec, zeros(spec, a.shape[1:]), a)


def double(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(spec, a, a)


def normalize(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Fold a lazy value in [0, 2p) to canonical [0, p)."""
    return _cond_sub_modulus(spec, a)


# ---------------------------------------------------------------------------
# Multiplication: schoolbook product -> lazy columns -> Montgomery REDC
# ---------------------------------------------------------------------------


def school_prod(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Widening product of two L-limb values as 2L+1 unreduced uint32 columns.

    Column bound: <= 2L products split into 16-bit halves -> < 2L * 2^16
    (~2^21.6 for L=24). Safe to sum several such accumulators (e.g. MDS rows,
    EC formula terms) before calling `redc` — up to ~2^9 of them.
    """
    L = spec.num_limbs
    acc = jnp.zeros((2 * L + 1, *jnp.broadcast_shapes(a.shape[1:], b.shape[1:])),
                    dtype=jnp.uint32)
    for i in range(L):
        prod = a[i][None, ...] * b  # (L, ...) uint32, exact
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        acc = acc.at[i : i + L].add(lo)
        acc = acc.at[i + 1 : i + L + 1].add(hi)
    return acc


def acc_add(acc_a: jnp.ndarray, acc_b: jnp.ndarray) -> jnp.ndarray:
    """Sum two unreduced column accumulators (caller tracks column bounds)."""
    return acc_a + acc_b


def redc(spec: FieldSpec, acc: jnp.ndarray) -> jnp.ndarray:
    """Montgomery reduction of a 2L+1-column accumulator -> L limbs (< 2p,
    lazy domain — no trailing conditional subtract; sound because 4p < R).

    Requires column values < 2^26 on entry (schoolbook gives < 2^22; summing
    up to ~16 products stays within budget: REDC itself adds < 2^21 + carries
    per column, total < 2^27 < 2^32).
    """
    L = spec.num_limbs
    n0_inv = jnp.uint32(spec.n0_inv)
    p = jnp.asarray(spec.modulus_limbs, dtype=jnp.uint32)
    p_lo = p.reshape((L,) + (1,) * (acc.ndim - 1))
    zero1 = jnp.zeros_like(acc[:1])
    acc = jnp.asarray(acc, dtype=jnp.uint32)
    for i in range(L):
        # fully resolve column i: fold its carry upward first
        carry = acc[i] >> LIMB_BITS
        t = acc[i] & MASK
        m = (t * n0_inv) & MASK
        prod = m[None, ...] * p_lo  # (L, ...)
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        # column i is ≡ 0 mod 2^16 after adding lo[0]; its outgoing carry:
        c2 = (t + lo[0]) >> LIMB_BITS
        # merged update vector for columns i+1 .. i+L:
        #   w[j] = lo[j+1] + hi[j]  (j < L-1),  w[L-1] = hi[L-1]
        w = jnp.concatenate([lo[1:], zero1], axis=0) + hi
        w = w.at[0].add(carry + c2)
        acc = acc.at[i + 1 : i + L + 1].add(w)
    return _carry_propagate(acc[L:], L)


def fold_wide(spec: FieldSpec, limbs: jnp.ndarray) -> jnp.ndarray:
    """(W, ...) 16-bit limbs of an arbitrary W-limb value -> lazy [0, 2p).

    Splits V = V_lo + 2^(16H)·V_hi at the largest H with 2^(16H) <= 2p (so
    V_lo is already a valid lazy value) and folds the high half with ONE
    Montgomery multiply by the constant (2^(16H)·R mod p). Valid whenever
    W - H <= L, i.e. up to ~2^(16(L-1))·2p — ample for segment sums of
    thousands of lazy values even on headroom-free fields (BN254 Fr has
    R/4p ≈ 1.3, which rules out pre-REDC accumulator summing there).
    """
    W = limbs.shape[0]
    L = spec.num_limbs
    H = ((2 * spec.modulus).bit_length() - 1) // LIMB_BITS
    assert H <= L and W - H <= L, (W, H, L)
    tail_shape = limbs.shape[1:]

    def pad_to_l(part):
        k = part.shape[0]
        if k == L:
            return part
        return jnp.concatenate(
            [part, jnp.zeros((L - k, *tail_shape), jnp.uint32)], axis=0
        )

    v_lo = pad_to_l(limbs[:H])
    v_hi = pad_to_l(limbs[H:])
    k_const = (1 << (LIMB_BITS * H)) * spec.R % spec.modulus
    k_limbs = jnp.asarray(
        fields.int_to_limbs(k_const, L), dtype=jnp.uint32
    ).reshape((L,) + (1,) * len(tail_shape))
    return add(spec, mont_mul(spec, v_hi, k_limbs), v_lo)


def segment_sum_mod(
    spec: FieldSpec,
    values: jnp.ndarray,
    seg_ids,
    num_segments: int,
    max_terms: int,
) -> jnp.ndarray:
    """Segmented modular sum: values (L, ..., E) lazy [0, 2p) grouped by
    `seg_ids` (E,) -> (L, ..., num_segments) lazy [0, 2p).

    Sums raw uint32 limbs (safe while max_terms < 2^15), carry-propagates
    once, and reduces with `fold_wide` — one Montgomery multiply total,
    independent of segment sizes.
    """
    assert max_terms < (1 << 15), "limb sums would overflow uint32"
    L = spec.num_limbs
    seg = jnp.asarray(seg_ids, dtype=jnp.int32)
    sums = jnp.zeros(
        (L, *values.shape[1:-1], num_segments), jnp.uint32
    ).at[..., seg].add(values)
    return fold_wide(spec, _carry_propagate(sums, L + 1))


def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product: (a·b·R^-1) mod p."""
    fast = _maybe_pallas("mont_mul", spec, a, b)
    if fast is not None:
        return fast
    return redc(spec, school_prod(spec, a, b))


def mont_sqr(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


def mul_const(spec: FieldSpec, a: jnp.ndarray, c: np.ndarray) -> jnp.ndarray:
    """Multiply batch by a constant (L,1) limb column (Montgomery form)."""
    return mont_mul(spec, a, jnp.asarray(c, dtype=jnp.uint32))


def to_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Raw canonical limbs -> Montgomery form (multiply by R^2)."""
    return mont_mul(spec, a, jnp.asarray(spec.r2_limbs[:, None], dtype=jnp.uint32))


def from_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical limbs (multiply by 1)."""
    one = np.zeros((spec.num_limbs, 1), dtype=np.uint32)
    one[0, 0] = 1
    return mont_mul(spec, a, jnp.asarray(one))


# ---------------------------------------------------------------------------
# Exponentiation / inversion
# ---------------------------------------------------------------------------


def pow_const(spec: FieldSpec, a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """a^exponent with a static Python-int exponent (square-and-multiply,
    rolled into a fori_loop so the compiled graph stays small)."""
    assert exponent >= 0
    if exponent == 0:
        one = jnp.asarray(spec.one_mont_limbs[:, None], dtype=jnp.uint32)
        return jnp.broadcast_to(one, a.shape).astype(jnp.uint32)
    nbits = exponent.bit_length()
    bits = jnp.asarray(
        [(exponent >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32
    )

    def body(i, acc):
        acc = mont_sqr(spec, acc)
        mult = mont_mul(spec, acc, a)
        return jnp.where(bits[i] != 0, mult, acc)

    # start from MSB (always 1): acc = a
    return jax.lax.fori_loop(1, nbits, body, a)


def inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Field inverse via Fermat: a^(p-2). inv(0) returns 0 (used as a
    sentinel by branchless curve formulas)."""
    return pow_const(spec, a, spec.modulus - 2)


def batch_inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-trick batched inversion along the LAST axis.

    Computes elementwise inverses using prefix/suffix products (two
    log-depth associative scans) and a single Fermat inversion of the total
    product. Zeros map to zero (the scan treats them as ones).
    """
    a = normalize(spec, a)  # lazy zero residue p would poison the products
    nz = is_nonzero(spec, a)
    one = jnp.asarray(spec.one_mont_limbs[:, None], dtype=jnp.uint32)
    safe = jnp.where(nz[None, ...], a, jnp.broadcast_to(one, a.shape))
    mul = functools.partial(mont_mul, spec)
    n = a.shape[-1]
    levels = max((n - 1).bit_length(), 1)
    one_full = jnp.broadcast_to(one, a.shape)
    lane = jnp.arange(n)

    # Hillis-Steele inclusive scans in a ROLLED loop: every level is one
    # full-width multiply of identical shape, so the whole scan reuses a
    # single compiled kernel (log-depth associative_scan emits log2(n)
    # differently-shaped slices, each a separate minutes-long Mosaic
    # compile on TPU). 2x the multiplies of a work-efficient scan —
    # irrelevant next to the compile-time win.
    def fwd_level(i, x):
        shift = jnp.int32(1) << i
        rolled = jnp.where(lane < shift, one_full, jnp.roll(x, shift, axis=-1))
        return mul(x, rolled)

    def rev_level(i, x):
        shift = jnp.int32(1) << i
        rolled = jnp.where(
            lane >= n - shift, one_full, jnp.roll(x, -shift, axis=-1)
        )
        return mul(x, rolled)

    prefix = jax.lax.fori_loop(0, levels, fwd_level, safe)
    suffix = jax.lax.fori_loop(0, levels, rev_level, safe)
    total_inv = inv(spec, prefix[..., -1:])
    # inv(safe[i]) = prefix[i-1] * suffix[i+1] * total_inv
    shifted_prefix = jnp.concatenate(
        [jnp.broadcast_to(one, (*a.shape[:-1], 1)), prefix[..., :-1]], axis=-1
    )
    shifted_suffix = jnp.concatenate(
        [suffix[..., 1:], jnp.broadcast_to(one, (*a.shape[:-1], 1))], axis=-1
    )
    out = mul(mul(shifted_prefix, shifted_suffix), total_inv)
    return jnp.where(nz[None, ...], out, jnp.zeros_like(out))


# ---------------------------------------------------------------------------
# Predicates / selection
# ---------------------------------------------------------------------------


def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask over the batch axes. Lazy-domain aware: zero is
    represented by either 0 or p (no carry chain needed)."""
    p = jnp.asarray(spec.modulus_limbs, dtype=jnp.uint32).reshape(
        (spec.num_limbs,) + (1,) * (a.ndim - 1)
    )
    return jnp.logical_or(jnp.all(a == 0, axis=0), jnp.all(a == p, axis=0))


def is_nonzero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.logical_not(is_zero(spec, a))


def eq(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field equality on lazy values (normalizes both sides)."""
    return jnp.all(normalize(spec, a) == normalize(spec, b), axis=0)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask ? a : b, with mask shaped like the batch axes."""
    return jnp.where(mask[None, ...], a, b)


# ---------------------------------------------------------------------------
# Pre-jitted entry points (stable objects -> compile cache persists across
# callers; use the raw functions above when composing into larger kernels)
# ---------------------------------------------------------------------------

add_jit = jax.jit(add, static_argnums=0)
sub_jit = jax.jit(sub, static_argnums=0)
mont_mul_jit = jax.jit(mont_mul, static_argnums=0)
inv_jit = jax.jit(inv, static_argnums=0)
batch_inv_jit = jax.jit(batch_inv, static_argnums=0)
pow_const_jit = jax.jit(pow_const, static_argnums=(0, 2))
