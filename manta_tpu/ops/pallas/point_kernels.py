"""Fused Pallas TPU kernels for elliptic-curve point operations.

Round-1 measured the MSM spending ~2.2x its pure-multiply floor on
plumbing: every field op in a point addition was its own `pallas_call`, so
each complete add made ~21 HBM round trips of every intermediate. These
kernels keep the WHOLE point formula (all ~11 Montgomery muls of a mixed
add plus the branchless edge-case dispatch) register/VMEM-resident inside
one kernel, and go one level further for the MSM hot loop: the entire
K-step sequential-column bucket accumulation (`manta_tpu.ops.msm`) runs as
ONE kernel with the running accumulator carried in VMEM scratch across the
sequential grid.

Design notes:
- The point formulas are NOT re-written here. `_KernelCurve` reuses
  `manta_tpu.ops.curve.CurveOps`'s add/madd/double/_add_dispatch verbatim by
  swapping in `_KernelCoordOps`/`_KernelFq2Ops`: the same CoordOps interface
  implemented with in-register limb arithmetic (constants baked as Python
  ints — Pallas TPU kernels cannot capture array constants).
- The doubling branch of the edge dispatch stays behind `jax.lax.cond` on a
  block-level `any(is_dbl)`, so batches with no coincident lanes (the
  common case: distinct points, random scalars) skip its ~8-multiply cost.
- Everything stays in the lazy [0, 2p) Montgomery domain of
  `manta_tpu.ops.field_ops`, so fused and unfused ops interoperate freely.

Replaces the per-op hot path of the reference's `ark_ec` group arithmetic
(reference `manta-benchmark/src/ecc.rs:60-128`, `ark_ec::msm` as used by
`manta-crypto/src/arkworks/groth16.rs:589`).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from manta_tpu import fields
from manta_tpu.fields import LIMB_BITS, LIMB_MASK, FieldSpec
from manta_tpu.ops import curve as C
from manta_tpu.ops.curve import JacobianPoint
from manta_tpu.ops.pallas.field_kernels import _school_redc, _school_sqr_redc
from manta_tpu.utils import hostmath

MASK = LIMB_MASK
BASE = 1 << LIMB_BITS

import os

LANE_BLOCK = 512  # lanes per grid step for single-op kernels
# column-kernel block shape (R-lanes / K-steps per grid step); env-tunable
# for on-chip block-size sweeps (tools/tune_column.py)
COLUMN_LANE_BLOCK = int(os.environ.get("MANTA_COLUMN_RB", "256"))
COLUMN_STEP_BLOCK = int(os.environ.get("MANTA_COLUMN_KB", "8"))


@functools.lru_cache(maxsize=1)
def _interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU tests / virtual meshes)."""
    try:
        return jax.devices()[0].platform == "cpu"
    except Exception:  # noqa: BLE001
        return True


def _limbs_of(value: int, count: int):
    return [(value >> (LIMB_BITS * i)) & LIMB_MASK for i in range(count)]


# ---------------------------------------------------------------------------
# In-kernel field ops (CoordOps interface over register-resident arrays)
# ---------------------------------------------------------------------------


class _KernelCoordOps:
    """Limb-major field ops on (L, ...) arrays inside a Pallas kernel.

    Same algorithms and lazy [0, 2p) domain as `manta_tpu.ops.field_ops`,
    with every constant a Python-int immediate.
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        L = spec.num_limbs
        self._p_limbs = _limbs_of(spec.modulus, L)
        self._two_p_limbs = _limbs_of(2 * spec.modulus, L)
        self._one_limbs = _limbs_of(spec.R % spec.modulus, L)

    # -- ring ops --

    def mul(self, a, b):
        return _school_redc(self.spec, a, b)

    def sqr(self, a):
        return _school_sqr_redc(self.spec, a)

    def add(self, a, b):
        L = self.spec.num_limbs
        outs, carry = [], jnp.zeros_like(a[0])
        for i in range(L):
            t = a[i] + b[i] + carry
            outs.append(t & MASK)
            carry = t >> LIMB_BITS
        diff, borrow = [], jnp.zeros_like(a[0])
        for i in range(L):
            t = outs[i] + (BASE - self._two_p_limbs[i]) - borrow
            diff.append(t & MASK)
            borrow = jnp.uint32(1) - (t >> LIMB_BITS)
        ge = jnp.logical_or(borrow == 0, carry != 0)
        return jnp.where(ge, jnp.stack(diff), jnp.stack(outs))

    def sub(self, a, b):
        L = self.spec.num_limbs
        outs, borrow = [], jnp.zeros_like(a[0])
        for i in range(L):
            t = a[i] + BASE - b[i] - borrow
            outs.append(t & MASK)
            borrow = jnp.uint32(1) - (t >> LIMB_BITS)
        plus, carry = [], jnp.zeros_like(a[0])
        for i in range(L):
            t = outs[i] + self._two_p_limbs[i] + carry
            plus.append(t & MASK)
            carry = t >> LIMB_BITS
        return jnp.where(borrow != 0, jnp.stack(plus), jnp.stack(outs))

    def neg(self, a):
        return self.sub(self.zeros_like(a), a)

    def double(self, a):
        return self.add(a, a)

    def triple(self, a):
        return self.add(self.add(a, a), a)

    # -- predicates / selection --

    def is_zero(self, a):
        # tile compares + one cross-sublane reduction (the row-op chain
        # serializes 2L single-sublane ops)
        p_tile = jnp.stack(
            [jnp.full_like(a[0], v) for v in self._p_limbs]
        )
        z = jnp.all(a == 0, axis=0)
        e = jnp.all(a == p_tile, axis=0)
        return jnp.logical_or(z, e)

    def eq(self, a, b):
        return self.is_zero(self.sub(a, b))

    def select(self, mask, a, b):
        return jnp.where(mask[None, ...], a, b)

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        return jnp.stack(
            [jnp.full_like(a[0], v) for v in self._one_limbs]
        )


def _w12_limbs(spec: FieldSpec):
    """Number of 12-bit limbs when W=12 keeps the Montgomery radix exact
    (12 | 16·L, i.e. the external R = 2^(16L) is a power of 2^12), else
    None. BLS12-381 Fq: 16·24 = 384 = 12·32 ✓; BN254 Fq: 256 ✗ (and its
    16-bit schoolbook is small enough not to want this)."""
    bits = 16 * spec.num_limbs
    return bits // 12 if bits % 12 == 0 and spec.num_limbs >= 24 else None


class _KernelCoordOps12:
    """12-bit-limb field ops inside a kernel: lazy-column school + REDC.

    With W = 12 and LW = 384/12 = 32 limbs, raw products are < 2^24 and
    accumulate 64-deep (< 2^30) with NO per-product splitting (the 16-bit
    path must split every 32-bit product immediately). 12·32 = 384 keeps
    the Montgomery radix identical to the external 2^384 domain, so
    values convert by pure bit repacking at the kernel boundary
    (`unpack`/`pack`). The product and REDC phases are sublane-BLOCKED
    (full-tile multiplies per limb of b, static-pad shifts — see
    `mul`); the add/sub carry ripples stay serial-by-row, which measured
    FASTER than carry-lookahead tile forms (Mosaic hides the chains in
    the point formulas' ILP).

    Same lazy [0, 2p) value domain and CoordOps surface as
    `_KernelCoordOps`; the point formulas are reused unchanged.
    """

    W = 12
    MASK12 = (1 << 12) - 1

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L16 = spec.num_limbs
        L = _w12_limbs(spec)
        assert L is not None
        self.L = L

        def limbs12(v: int):
            return [(v >> (12 * k)) & self.MASK12 for k in range(L)]

        self._p = limbs12(spec.modulus)
        self._two_p = limbs12(2 * spec.modulus)
        self._one = limbs12(spec.R % spec.modulus)
        self.n0_inv = (-pow(spec.modulus, -1, 1 << 12)) % (1 << 12)

    # -- boundary repacking (16-bit rows <-> 12-bit rows) --

    def unpack(self, x16):
        """(L16, ...) 16-bit-limb uint32 -> (L, ...) 12-bit-limb uint32."""
        rows = []
        for k in range(self.L):
            i0, sh = divmod(12 * k, 16)
            v = x16[i0] >> jnp.uint32(sh)
            if sh + 12 > 16 and i0 + 1 < self.L16:
                v = v | (x16[i0 + 1] << jnp.uint32(16 - sh))
            rows.append(v & jnp.uint32(self.MASK12))
        return jnp.stack(rows)

    def pack(self, x12):
        """(L, ...) 12-bit-limb -> (L16, ...) 16-bit-limb uint32."""
        rows = []
        for i in range(self.L16):
            k0, sh = divmod(16 * i, 12)
            v = x12[k0] >> jnp.uint32(sh)
            got = 12 - sh
            k = k0 + 1
            while got < 16 and k < self.L:
                v = v | (x12[k] << jnp.uint32(got))
                got += 12
                k += 1
            rows.append(v & jnp.uint32(0xFFFF))
        return jnp.stack(rows)

    # -- ring ops --

    def mul(self, a, b):
        """One-level Karatsuba over sublane-BLOCKED half-tile schoolbook.

        The blocked schoolbook (full-(L, lanes)-tile multiply per limb of
        b, static jnp.pad shifts — Pallas has no scatter-add) measured
        1.42x the row-sliced form; splitting into 16-limb halves drops
        the product phase from 1024 to 768 row-MACs and the shifted
        accumulator adds from 65-row to 33-row arrays (tools/tune_mul.py
        round 5: +4-7% over blocked, verified). Overflow headroom: sum
        limbs < 2^13, so z1 = s - z0 - z2 columns are exact and
        non-negative in u32, assembled columns < 1.25 * 2^30 and REDC
        bumps keep the total under 2^31."""
        L = self.L
        W = 2 * L + 1
        if L % 2:  # odd limb counts: plain blocked schoolbook
            cols = jnp.zeros((W, a.shape[-1]), jnp.uint32)
            for j in range(L):
                cols = cols + jnp.pad(
                    a * b[j][None, :], ((j, W - L - j), (0, 0))
                )
            return self._redc(cols)
        H = L // 2
        a_lo, a_hi = a[:H], a[H:]
        b_lo, b_hi = b[:H], b[H:]
        s_a = a_lo + a_hi
        s_b = b_lo + b_hi
        WH = 2 * H + 1

        def half_mul(x, y):
            cols = jnp.zeros((WH, a.shape[-1]), jnp.uint32)
            for j in range(H):
                prod = x * y[j][None, :]  # (H, lanes) half-tile multiply
                cols = cols + jnp.pad(prod, ((j, WH - H - j), (0, 0)))
            return cols

        z0 = half_mul(a_lo, b_lo)
        z2 = half_mul(a_hi, b_hi)
        z1 = half_mul(s_a, s_b) - z0 - z2  # exact per column (>= 0)
        cols = (
            jnp.pad(z0, ((0, W - WH), (0, 0)))
            + jnp.pad(z1, ((H, W - WH - H), (0, 0)))
            + jnp.pad(z2, ((L, W - WH - L), (0, 0)))
        )
        return self._redc(cols)

    def sqr(self, a):
        return self.mul(a, a)

    def _redc(self, cols):
        """Blocked Montgomery REDC: per limb i, one full-tile m*p
        accumulation at offset i (p rows are scalar immediates)."""
        L = self.L
        W = cols.shape[0]
        n0 = self.n0_inv
        lanes = cols.shape[-1]
        p_tile = jnp.stack(
            [jnp.full((lanes,), v, jnp.uint32) for v in self._p]
        )  # (L, lanes)
        for i in range(L):
            m = ((cols[i] & jnp.uint32(self.MASK12)) * n0) & jnp.uint32(
                self.MASK12
            )
            mp = m[None, :] * p_tile
            carry_row = (cols[i] + mp[0]) >> jnp.uint32(12)
            bump = jnp.pad(mp, ((i, W - L - i), (0, 0))) + jnp.pad(
                carry_row[None, :], ((i + 1, W - i - 2), (0, 0))
            )
            cols = cols + bump
        outs = []
        carry = jnp.zeros_like(cols[0])
        for k in range(L):
            t = cols[L + k] + carry
            outs.append(t & jnp.uint32(self.MASK12))
            carry = t >> jnp.uint32(12)
        return jnp.stack(outs)

    def add(self, a, b):
        """L-step ripple add + conditional 2p subtract. A Kogge-Stone
        tile-form variant (log2(L) full-tile rounds, see git history)
        measured 17% SLOWER in the column kernel: Mosaic pipelines the
        serial row chains across the madd's independent field ops, and
        the lookahead's extra tile work loses to that ILP."""
        L = self.L
        outs, carry = [], jnp.zeros_like(a[0])
        for i in range(L):
            t = a[i] + b[i] + carry
            outs.append(t & jnp.uint32(self.MASK12))
            carry = t >> jnp.uint32(12)
        diff, borrow = [], jnp.zeros_like(a[0])
        base = 1 << 12
        for i in range(L):
            t = outs[i] + (base - self._two_p[i]) - borrow
            diff.append(t & jnp.uint32(self.MASK12))
            borrow = jnp.uint32(1) - (t >> jnp.uint32(12))
        ge = jnp.logical_or(borrow == 0, carry != 0)
        return jnp.where(ge, jnp.stack(diff), jnp.stack(outs))

    def sub(self, a, b):
        L = self.L
        base = 1 << 12
        outs, borrow = [], jnp.zeros_like(a[0])
        for i in range(L):
            t = a[i] + base - b[i] - borrow
            outs.append(t & jnp.uint32(self.MASK12))
            borrow = jnp.uint32(1) - (t >> jnp.uint32(12))
        plus, carry = [], jnp.zeros_like(a[0])
        for i in range(L):
            t = outs[i] + self._two_p[i] + carry
            plus.append(t & jnp.uint32(self.MASK12))
            carry = t >> jnp.uint32(12)
        return jnp.where(borrow != 0, jnp.stack(plus), jnp.stack(outs))

    def neg(self, a):
        return self.sub(self.zeros_like(a), a)

    def double(self, a):
        return self.add(a, a)

    def triple(self, a):
        return self.add(self.add(a, a), a)

    # -- predicates / selection --

    def is_zero(self, a):
        p_tile = jnp.stack([jnp.full_like(a[0], v) for v in self._p])
        z = jnp.all(a == 0, axis=0)
        e = jnp.all(a == p_tile, axis=0)
        return jnp.logical_or(z, e)

    def eq(self, a, b):
        return self.is_zero(self.sub(a, b))

    def select(self, mask, a, b):
        return jnp.where(mask[None, ...], a, b)

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        return jnp.stack([jnp.full_like(a[0], v) for v in self._one])


class _KernelFq2Ops:
    """Fq[u]/(u^2+1) over stacked (2, L, ...) arrays inside a kernel."""

    def __init__(self, spec: FieldSpec, base=None):
        self.spec = spec
        self.base = base if base is not None else _KernelCoordOps(spec)

    def add(self, a, b):
        return jnp.stack([self.base.add(a[0], b[0]), self.base.add(a[1], b[1])])

    def sub(self, a, b):
        return jnp.stack([self.base.sub(a[0], b[0]), self.base.sub(a[1], b[1])])

    def neg(self, a):
        return jnp.stack([self.base.neg(a[0]), self.base.neg(a[1])])

    def mul(self, a, b):
        t0 = self.base.mul(a[0], b[0])
        t1 = self.base.mul(a[1], b[1])
        s = self.base.mul(self.base.add(a[0], a[1]), self.base.add(b[0], b[1]))
        return jnp.stack(
            [self.base.sub(t0, t1), self.base.sub(self.base.sub(s, t0), t1)]
        )

    def sqr(self, a):
        t = self.base.mul(self.base.add(a[0], a[1]), self.base.sub(a[0], a[1]))
        return jnp.stack([t, self.base.double(self.base.mul(a[0], a[1]))])

    def double(self, a):
        return jnp.stack([self.base.double(a[0]), self.base.double(a[1])])

    def triple(self, a):
        return jnp.stack([self.base.triple(a[0]), self.base.triple(a[1])])

    def is_zero(self, a):
        return jnp.logical_and(self.base.is_zero(a[0]), self.base.is_zero(a[1]))

    def eq(self, a, b):
        return jnp.logical_and(self.base.eq(a[0], b[0]), self.base.eq(a[1], b[1]))

    def select(self, mask, a, b):
        return jnp.where(mask[None, None, ...], a, b)

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        return jnp.stack([self.base.one_like(a[0]), self.base.zeros_like(a[1])])


@dataclasses.dataclass(frozen=True)
class _KernelCurve(C.CurveOps):
    """CurveOps whose coordinate ops run in-register inside a kernel.

    Reuses the parent's point formulas (`add`/`madd`/`double` and the
    branchless `_add_dispatch`) unchanged. When the field admits the
    12-bit lazy-column representation (`_w12_limbs`), all in-kernel
    arithmetic runs 12-bit-limbed and values repack to the external
    16-bit rows only at the kernel's load/store boundary."""

    width12: bool = False

    @functools.cached_property
    def ops(self):
        spec = self.curve.field
        if self.width12:
            base = _KernelCoordOps12(spec)
            return _KernelFq2Ops(spec, base) if self.curve.is_ext else base
        return _KernelFq2Ops(spec) if self.curve.is_ext else _KernelCoordOps(
            spec
        )

    # -- boundary repacking (identity for the 16-bit representation) --

    def load_coord(self, a):
        if not self.width12:
            return a
        base = self.ops.base if self.curve.is_ext else self.ops
        if self.curve.is_ext:
            return jnp.stack([base.unpack(a[0]), base.unpack(a[1])])
        return base.unpack(a)

    def store_coord(self, a):
        if not self.width12:
            return a
        base = self.ops.base if self.curve.is_ext else self.ops
        if self.curve.is_ext:
            return jnp.stack([base.pack(a[0]), base.pack(a[1])])
        return base.pack(a)

    def internal_edims(self):
        """Leading coordinate dims of the in-kernel representation."""
        L = (
            _w12_limbs(self.curve.field)
            if self.width12
            else self.curve.field.num_limbs
        )
        return (2, L) if self.curve.is_ext else (L,)


@functools.lru_cache(maxsize=None)
def _kernel_curve(curve: hostmath.WeierstrassCurve) -> _KernelCurve:
    width12 = _w12_limbs(curve.field) is not None
    return _KernelCurve(curve, backend="kernel", width12=width12)


# ---------------------------------------------------------------------------
# Single-call point kernels: whole formula in one pallas_call
# ---------------------------------------------------------------------------


def _coord_block_spec(ext: bool, L: int, block: int):
    if ext:
        return pl.BlockSpec(
            (2, L, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
    return pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _point_op(curve: hostmath.WeierstrassCurve, which: str, n: int):
    """Build the fused pallas_call for add/madd/double at n lanes."""
    kc = _kernel_curve(curve)
    L = curve.field.num_limbs
    ext = curve.is_ext
    n_in = {"add": 6, "madd": 6, "double": 3}[which]

    def kernel(*refs):
        ins, outs = refs[:n_in], refs[n_in:]
        load = lambda r: kc.load_coord(r[...])
        p = JacobianPoint(load(ins[0]), load(ins[1]), load(ins[2]))
        if which == "double":
            r = kc.double(p)
        else:
            q = JacobianPoint(load(ins[3]), load(ins[4]), load(ins[5]))
            r = kc.add(p, q) if which == "add" else kc.madd(p, q)
        outs[0][...] = kc.store_coord(r.x)
        outs[1][...] = kc.store_coord(r.y)
        outs[2][...] = kc.store_coord(r.z)

    block = min(LANE_BLOCK, n)
    assert n % block == 0
    cspec = _coord_block_spec(ext, L, block)
    shape = (2, L, n) if ext else (L, n)
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct(shape, jnp.uint32) for _ in range(3)
        ),
        grid=(n // block,),
        in_specs=[cspec] * n_in,
        out_specs=tuple([cspec] * 3),
        interpret=_interpret(),
    )


def _flatten_lanes(curve, pt: JacobianPoint):
    """(*E, batch...) -> (*E, n) with n padded to a 128 multiple.

    Padding lanes are zero == the (0, 0, 0) pseudo-point, which the complete
    formulas treat as infinity (Z = 0); they are sliced off afterwards.
    """
    lead = 2 if curve.is_ext else 1
    batch_shape = pt.x.shape[lead:]
    n = 1
    for d in batch_shape:
        n *= d
    # pad to the kernel's lane-block granularity (the grid splits n into
    # LANE_BLOCK blocks once n exceeds one block)
    quantum = 128 if n <= LANE_BLOCK else LANE_BLOCK
    n_pad = max(128, -(-n // quantum) * quantum)

    def prep(a):
        flat = a.reshape(*a.shape[:lead], n)
        if n_pad != n:
            pad = jnp.zeros((*a.shape[:lead], n_pad - n), jnp.uint32)
            flat = jnp.concatenate([flat, pad], axis=-1)
        return flat

    return (
        JacobianPoint(prep(pt.x), prep(pt.y), prep(pt.z)),
        batch_shape,
        n,
        n_pad,
    )


def _unflatten_lanes(curve, arrs, batch_shape, n):
    lead = 2 if curve.is_ext else 1

    def post(a):
        return a[..., :n].reshape(*a.shape[:lead], *batch_shape)

    return JacobianPoint(post(arrs[0]), post(arrs[1]), post(arrs[2]))


def fused_add(curve, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
    pf, bshape, n, n_pad = _flatten_lanes(curve, p)
    qf, _, _, _ = _flatten_lanes(curve, q)
    out = _point_op(curve, "add", n_pad)(*pf, *qf)
    return _unflatten_lanes(curve, out, bshape, n)


def fused_madd(curve, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
    pf, bshape, n, n_pad = _flatten_lanes(curve, p)
    qf, _, _, _ = _flatten_lanes(curve, q)
    out = _point_op(curve, "madd", n_pad)(*pf, *qf)
    return _unflatten_lanes(curve, out, bshape, n)


def fused_double(curve, p: JacobianPoint) -> JacobianPoint:
    pf, bshape, n, n_pad = _flatten_lanes(curve, p)
    out = _point_op(curve, "double", n_pad)(*pf)
    return _unflatten_lanes(curve, out, bshape, n)


# ---------------------------------------------------------------------------
# Fused MSM column kernel: the whole K-step bucket accumulation in one call
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _column_call(
    curve: hostmath.WeierstrassCurve,
    K: int,
    R: int,
    rb: int = 0,
    kb: int = 0,
):
    """Build the sequential-column accumulation kernel.

    Inputs (XLA-side):
      px, py: (K, *E, R) gathered sorted affine point coordinates
      qinf:   (K, R) int32, 1 where the gathered point is infinity
      head:   (K, R) int32, 1 where a new digit run starts
    Outputs: ox, oy, oz: (K, *E, R) — the running accumulator AFTER each
    step (run ends are picked out and scattered to buckets by the caller).

    Grid: (R/Rb, K/Kb), K-blocks innermost (sequential); the accumulator is
    carried across K-blocks in VMEM scratch, re-initialized at k-block 0.
    """
    kc = _kernel_curve(curve)
    L = curve.field.num_limbs
    ext = curve.is_ext
    Rb = rb or min(COLUMN_LANE_BLOCK, R)
    Kb = kb or min(COLUMN_STEP_BLOCK, K)
    assert R % Rb == 0 and K % Kb == 0
    edims = (2, L) if ext else (L,)

    coord_spec = pl.BlockSpec(
        (Kb, *edims, Rb),
        (lambda r, k: (k, 0, 0, r)) if ext else (lambda r, k: (k, 0, r)),
        memory_space=pltpu.VMEM,
    )
    mask_spec = pl.BlockSpec(
        (Kb, Rb), lambda r, k: (k, r), memory_space=pltpu.VMEM
    )

    def kernel(px, py, qinf, head, ox, oy, oz, sx, sy, sz):
        o = kc.ops
        kb = pl.program_id(1)

        @pl.when(kb == 0)
        def _():
            # accumulator starts at infinity: (0, 1, 0)
            sx[...] = jnp.zeros_like(sx)
            sy[...] = o.one_like(sy[...])
            sz[...] = jnp.zeros_like(sz)

        def body(j, carry):
            acc = JacobianPoint(*carry)
            qx = kc.load_coord(px[j])
            qy = kc.load_coord(py[j])
            q_is_inf = qinf[j] != 0
            one = o.one_like(qx)
            qz = o.select(q_is_inf, o.zeros_like(qx), one)
            qy_fixed = o.select(q_is_inf, one, qy)
            q = JacobianPoint(qx, qy_fixed, qz)
            added = kc.madd(acc, q)
            h = head[j] != 0
            acc = JacobianPoint(
                o.select(h, q.x, added.x),
                o.select(h, q.y, added.y),
                o.select(h, q.z, added.z),
            )
            ox[j] = kc.store_coord(acc.x)
            oy[j] = kc.store_coord(acc.y)
            oz[j] = kc.store_coord(acc.z)
            return tuple(acc)

        acc0 = (sx[...], sy[...], sz[...])
        accx, accy, accz = jax.lax.fori_loop(0, Kb, body, acc0)
        sx[...] = accx
        sy[...] = accy
        sz[...] = accz

    shape = (K, *edims, R)
    # the accumulator scratch lives in the in-kernel representation
    scratch = [
        pltpu.VMEM((*kc.internal_edims(), Rb), jnp.uint32) for _ in range(3)
    ]
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct(shape, jnp.uint32) for _ in range(3)
        ),
        grid=(R // Rb, K // Kb),
        in_specs=[coord_spec, coord_spec, mask_spec, mask_spec],
        out_specs=tuple([coord_spec] * 3),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )


def accumulate_columns(curve, px, py, qinf, head, rb: int = 0, kb: int = 0):
    """Run the fused K-step column accumulation. See `_column_call`."""
    K = px.shape[0]
    R = px.shape[-1]
    return _column_call(curve, K, R, rb, kb)(
        px, py, qinf.astype(jnp.int32), head.astype(jnp.int32)
    )


# ---------------------------------------------------------------------------
# Fused fold/weighted column kernel: sequential FULL adds over a projective
# stream, with a secondary suffix accumulator (B += A each step)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _fold_call(curve: hostmath.WeierstrassCurve, K: int, R: int):
    """Sequential-column segmented reduction over a *projective* stream.

    Per lane j, over steps k = 0..K-1:
        A = q[k]            if head[k] else  A + q[k]   (complete add)
        B = B + A
    emitting the post-step A stream (for run-end extraction — the same
    compaction as the madd column pass) and B's final row (for the
    weighted bucket reduction: with q[k] = S_{base + K - k} fed in
    descending bucket order, the final A = sum S and final
    B = sum_m m * S_{base+m} — the split-index weighted-sum trick of
    `manta_tpu.ops.msm` without a single shape-shrinking tree level).

    One kernel body serves both the cross-chunk partial folding and the
    weighted reduction, so the whole post-column MSM pipeline adds ~3
    Mosaic compilations instead of ~20 shape-varied tree/scan kernels
    (the round-3 bench measured 755s of XLA+Mosaic compile for the MSM
    program; compile time is a first-class constraint — the driver runs
    cold).
    """
    kc = _kernel_curve(curve)
    L = curve.field.num_limbs
    ext = curve.is_ext
    Rb = min(COLUMN_LANE_BLOCK, R)
    Kb = min(COLUMN_STEP_BLOCK, K)
    assert R % Rb == 0 and K % Kb == 0
    edims = (2, L) if ext else (L,)

    coord_spec = pl.BlockSpec(
        (Kb, *edims, Rb),
        (lambda r, k: (k, 0, 0, r)) if ext else (lambda r, k: (k, 0, r)),
        memory_space=pltpu.VMEM,
    )
    mask_spec = pl.BlockSpec(
        (Kb, Rb), lambda r, k: (k, r), memory_space=pltpu.VMEM
    )
    def kernel(
        qx, qy, qz, head,
        oa_x, oa_y, oa_z, ob_x, ob_y, ob_z,
        sax, say, saz, sbx, sby, sbz,
    ):
        o = kc.ops
        kb = pl.program_id(1)

        @pl.when(kb == 0)
        def _():
            for s in (sax, saz, sbx, sbz):
                s[...] = jnp.zeros_like(s)
            say[...] = o.one_like(say[...])
            sby[...] = o.one_like(sby[...])

        def body(j, carry):
            ax, ay, az, bx, by, bz = carry
            q = JacobianPoint(
                kc.load_coord(qx[j]), kc.load_coord(qy[j]), kc.load_coord(qz[j])
            )
            added = kc.add(JacobianPoint(ax, ay, az), q)
            h = head[j] != 0
            acc = JacobianPoint(
                o.select(h, q.x, added.x),
                o.select(h, q.y, added.y),
                o.select(h, q.z, added.z),
            )
            bsum = kc.add(JacobianPoint(bx, by, bz), acc)
            oa_x[j] = kc.store_coord(acc.x)
            oa_y[j] = kc.store_coord(acc.y)
            oa_z[j] = kc.store_coord(acc.z)
            ob_x[j] = kc.store_coord(bsum.x)
            ob_y[j] = kc.store_coord(bsum.y)
            ob_z[j] = kc.store_coord(bsum.z)
            return (*acc, *bsum)

        carry0 = (sax[...], say[...], saz[...], sbx[...], sby[...], sbz[...])
        out = jax.lax.fori_loop(0, Kb, body, carry0)
        sax[...], say[...], saz[...] = out[0], out[1], out[2]
        sbx[...], sby[...], sbz[...] = out[3], out[4], out[5]

    shape = (K, *edims, R)
    scratch = [
        pltpu.VMEM((*kc.internal_edims(), Rb), jnp.uint32) for _ in range(6)
    ]
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct(shape, jnp.uint32) for _ in range(6)
        ),
        grid=(R // Rb, K // Kb),
        in_specs=[coord_spec] * 3 + [mask_spec],
        out_specs=tuple([coord_spec] * 6),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )


def fold_columns(curve, qx, qy, qz, head):
    """Run the fold/weighted column kernel. Returns two JacobianPoint
    streams (K, *E, R): the post-step segmented accumulator A, and the
    suffix accumulator B (B[k] = sum_{k' <= k} A[k'])."""
    K, R = qx.shape[0], qx.shape[-1]
    out = _fold_call(curve, K, R)(qx, qy, qz, head.astype(jnp.int32))
    return JacobianPoint(*out[:3]), JacobianPoint(*out[3:])


# ---------------------------------------------------------------------------
# Fused curve-ops backend
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FusedCurveOps(C.CurveOps):
    """CurveOps whose group law runs as fused Pallas kernels.

    `ops` stays the standard XLA-level CoordOps (select/is_zero/batch_inv
    for the surrounding machinery); add/madd/double dispatch whole-formula
    kernels. The MSM layer additionally detects `run_columns` and fuses the
    entire bucket-accumulation loop.
    """

    def add(self, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
        return fused_add(self.curve, p, q)

    def madd(self, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
        return fused_madd(self.curve, p, q)

    def double(self, p: JacobianPoint) -> JacobianPoint:
        return fused_double(self.curve, p)

    def run_columns(self, px, py, qinf, head):
        return accumulate_columns(self.curve, px, py, qinf, head)

    def run_fold_columns(self, qx, qy, qz, head):
        return fold_columns(self.curve, qx, qy, qz, head)


@functools.lru_cache(maxsize=None)
def fused_curve_ops_for(curve: hostmath.WeierstrassCurve) -> FusedCurveOps:
    return FusedCurveOps(curve, backend="fused")
