"""Batched elliptic-curve group operations on device.

Short Weierstrass curves y^2 = x^3 + b with a = 0 (BN254, BLS12-381), in
Jacobian coordinates (X, Y, Z), Z == 0 encoding infinity. All operations are
**branchless**: additions compute the generic-add, double, and
identity-passthrough results and lane-select between them, so the same
compiled program handles every edge case across the batch (the TPU analogue
of the reference's per-point branchy arkworks ops,
`manta-benchmark/src/ecc.rs:60-128`).

Coordinates are field-element batches in limb-major Montgomery layout
(see `manta_tpu.ops.field_ops`): shape (L, ...) for Fq curves (G1) and
(2, L, ...) for Fq2 curves (G2). The `CoordOps` adapter makes the point
formulas generic over both.

Twisted Edwards (ed-on-bn254) batched ops live here too: the Edwards
addition law is already complete, which makes it the TPU-friendliest group —
no selects at all (reference embedded curve:
`manta-pay/src/config/mod.rs:52`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from manta_tpu import fields
from manta_tpu.ops import field_ops as F
from manta_tpu.utils import hostmath


class CoordOps:
    """Field-op dispatch over base-field coordinate arrays (Fq: (L, ...))."""

    def __init__(self, spec: fields.FieldSpec):
        self.spec = spec

    def add(self, a, b):
        return F.add(self.spec, a, b)

    def sub(self, a, b):
        return F.sub(self.spec, a, b)

    def neg(self, a):
        return F.neg(self.spec, a)

    def mul(self, a, b):
        return F.mont_mul(self.spec, a, b)

    def sqr(self, a):
        return F.mont_mul(self.spec, a, a)

    def double(self, a):
        return F.add(self.spec, a, a)

    def triple(self, a):
        return F.add(self.spec, F.add(self.spec, a, a), a)

    def is_zero(self, a):
        return F.is_zero(self.spec, a)

    def eq(self, a, b):
        return F.eq(self.spec, a, b)

    def select(self, mask, a, b):
        return F.select(mask, a, b)

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        one = jnp.asarray(self.spec.one_mont_limbs, dtype=jnp.uint32)
        return jnp.broadcast_to(
            one.reshape((self.spec.num_limbs,) + (1,) * (a.ndim - 1)), a.shape
        ).astype(jnp.uint32)

    def batch_inv(self, a):
        return F.batch_inv(self.spec, a)

    def encode(self, values, montgomery=True):
        return F.encode_ints(self.spec, values, montgomery=montgomery)

    def decode(self, arr, montgomery=True):
        return F.decode_ints(self.spec, arr, montgomery=montgomery)


class Fq2Ops:
    """Quadratic extension Fq[u]/(u^2 + 1) over stacked arrays (2, L, ...).

    Karatsuba multiplication: 3 base-field Montgomery muls.
    """

    def __init__(self, spec: fields.FieldSpec):
        self.spec = spec
        self.base = CoordOps(spec)

    def add(self, a, b):
        return jnp.stack([self.base.add(a[0], b[0]), self.base.add(a[1], b[1])])

    def sub(self, a, b):
        return jnp.stack([self.base.sub(a[0], b[0]), self.base.sub(a[1], b[1])])

    def neg(self, a):
        return jnp.stack([self.base.neg(a[0]), self.base.neg(a[1])])

    def mul(self, a, b):
        t0 = self.base.mul(a[0], b[0])
        t1 = self.base.mul(a[1], b[1])
        s = self.base.mul(
            self.base.add(a[0], a[1]), self.base.add(b[0], b[1])
        )
        c0 = self.base.sub(t0, t1)  # u^2 = -1
        c1 = self.base.sub(self.base.sub(s, t0), t1)
        return jnp.stack([c0, c1])

    def sqr(self, a):
        # (a0 + a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u
        t = self.base.mul(self.base.add(a[0], a[1]), self.base.sub(a[0], a[1]))
        c1 = self.base.double(self.base.mul(a[0], a[1]))
        return jnp.stack([t, c1])

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

    def batch_inv(self, a):
        # (a0 + a1 u)^-1 = (a0 - a1 u) / (a0^2 + a1^2)
        norm = self.base.add(self.base.sqr(a[0]), self.base.sqr(a[1]))
        n_inv = self.base.batch_inv(norm)
        return jnp.stack(
            [self.base.mul(a[0], n_inv), self.base.neg(self.base.mul(a[1], n_inv))]
        )

    def encode(self, values, montgomery=True):
        c0 = self.base.encode([v[0] for v in values], montgomery)
        c1 = self.base.encode([v[1] for v in values], montgomery)
        return np.stack([c0, c1])

    def decode(self, arr, montgomery=True):
        c0 = self.base.decode(arr[0], montgomery)
        c1 = self.base.decode(arr[1], montgomery)
        return list(zip(c0, c1))


class JacobianPoint(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class CurveOps:
    """Batched group ops for one short-Weierstrass a=0 curve.

    backend: "limb" (Montgomery limb vectors, Pallas-accelerated) or "rns"
    (residue number system, MXU-accelerated — G1/prime-field curves only).
    """

    curve: hostmath.WeierstrassCurve
    backend: str = "limb"

    @functools.cached_property
    def ops(self):
        if self.backend == "rns":
            from manta_tpu.ops.rns import RnsCoordOps, RnsFq2CoordOps

            return (
                RnsFq2CoordOps(self.curve.field)
                if self.curve.is_ext
                else RnsCoordOps(self.curve.field)
            )
        return Fq2Ops(self.curve.field) if self.curve.is_ext else CoordOps(
            self.curve.field
        )

    # -- host <-> device --

    @property
    def limb16_points(self) -> bool:
        """True when the affine POINT arrays this backend feeds the MSM are
        (L, n) uint32 rows of 16-bit limbs — the invariant the MSM's packed
        x|y<<16 gather relies on. Representation-changing backends override
        (RNS: False; the limb-resident hybrid keeps True for G1)."""
        return not self.curve.is_ext

    def encode_points(self, points) -> JacobianPoint:
        """Affine host points (None = infinity) -> Jacobian device batch."""
        o = self.ops
        zero = (0, 0) if self.curve.is_ext else 0
        one = (1, 0) if self.curve.is_ext else 1
        xs = [zero if pt is None else pt[0] for pt in points]
        ys = [one if pt is None else pt[1] for pt in points]
        zs = [zero if pt is None else one for pt in points]
        return JacobianPoint(
            jnp.asarray(o.encode(xs)), jnp.asarray(o.encode(ys)), jnp.asarray(o.encode(zs))
        )

    def decode_points(self, pt: JacobianPoint):
        """Jacobian device batch -> affine host points (None = infinity)."""
        o = self.ops
        xs, ys = o.decode(pt.x), o.decode(pt.y)
        zs = o.decode(pt.z)
        p = self.curve.field.modulus
        out = []
        for x, y, z in zip(xs, ys, zs):
            if z == 0 or z == (0, 0):
                out.append(None)
                continue
            if self.curve.is_ext:
                z_inv = hostmath.fq2_inv(z, p)
                z2 = hostmath.fq2_square(z_inv, p)
                z3 = hostmath.fq2_mul(z2, z_inv, p)
                out.append(
                    (hostmath.fq2_mul(x, z2, p), hostmath.fq2_mul(y, z3, p))
                )
            else:
                z_inv = hostmath.finv(z, p)
                out.append((x * z_inv * z_inv % p, y * pow(z_inv, 3, p) % p))
        return out

    # -- group law --

    def infinity_like(self, template: JacobianPoint) -> JacobianPoint:
        o = self.ops
        return JacobianPoint(
            o.zeros_like(template.x),
            o.one_like(template.y),
            o.zeros_like(template.z),
        )

    def is_infinity(self, pt: JacobianPoint):
        return self.ops.is_zero(pt.z)

    def affine_infinity_mask(self, pt: JacobianPoint):
        """Infinity test for encoder-produced affine batches (Z in {0,1}).
        Same as `is_infinity` here; representation-specific backends
        override it with a cheaper exact check."""
        return self.is_infinity(pt)

    def double(self, pt: JacobianPoint) -> JacobianPoint:
        """dbl-2009-l (a = 0). Handles infinity (Z=0 -> Z3=0) for free, and
        y = 0 points don't exist on prime-order a=0 curves with b != 0."""
        o = self.ops
        a = o.sqr(pt.x)  # XX
        b = o.sqr(pt.y)  # YY
        c = o.sqr(b)  # YYYY
        t = o.sqr(o.add(pt.x, b))
        d = o.double(o.sub(o.sub(t, a), c))  # S = 2((X+YY)^2 - XX - YYYY)
        e = o.triple(a)  # M = 3 XX
        f = o.sqr(e)
        x3 = o.sub(f, o.double(d))
        y3 = o.sub(o.mul(e, o.sub(d, x3)), o.double(o.double(o.double(c))))
        z3 = o.mul(o.double(pt.y), pt.z)
        return JacobianPoint(x3, y3, z3)

    def _add_dispatch(
        self,
        p: JacobianPoint,
        q: JacobianPoint,
        generic: JacobianPoint,
        h_zero,
        r_zero,
    ) -> JacobianPoint:
        """Branchless edge-case dispatch shared by add/madd:
        p_inf -> q; q_inf -> p; h==0 & r==0 -> double(p); h==0 & r!=0 ->
        infinity; else the generic-add result. The doubling result is
        computed under a `lax.cond` so batches with no coincident lanes
        (the common case in sorted-bucket MSM accumulation) skip its
        ~8-multiply cost entirely."""
        o = self.ops
        p_inf = self.is_infinity(p)
        q_inf = self.is_infinity(q)
        either_inf = jnp.logical_or(p_inf, q_inf)
        is_dbl = jnp.logical_and(
            jnp.logical_and(h_zero, r_zero), jnp.logical_not(either_inf)
        )
        is_inf_result = jnp.logical_and(
            jnp.logical_and(h_zero, jnp.logical_not(r_zero)),
            jnp.logical_not(either_inf),
        )
        dblx, dbly, dblz = jax.lax.cond(
            jnp.any(is_dbl),
            lambda: tuple(self.double(p)),
            lambda: (p.x, p.y, p.z),
        )
        inf = self.infinity_like(p)

        def pick(gen, dbl_c, inf_c, p_c, q_c):
            out = gen
            out = o.select(is_dbl, dbl_c, out)
            out = o.select(is_inf_result, inf_c, out)
            out = o.select(q_inf, p_c, out)
            out = o.select(p_inf, q_c, out)
            return out

        return JacobianPoint(
            pick(generic.x, dblx, inf.x, p.x, q.x),
            pick(generic.y, dbly, inf.y, p.y, q.y),
            pick(generic.z, dblz, inf.z, p.z, q.z),
        )

    def add(self, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
        """Complete Jacobian addition (add-2007-bl + branchless edge cases)."""
        o = self.ops
        z1z1 = o.sqr(p.z)
        z2z2 = o.sqr(q.z)
        u1 = o.mul(p.x, z2z2)
        u2 = o.mul(q.x, z1z1)
        s1 = o.mul(o.mul(p.y, q.z), z2z2)
        s2 = o.mul(o.mul(q.y, p.z), z1z1)
        h = o.sub(u2, u1)
        rr = o.sub(s2, s1)
        h_zero = o.is_zero(h)
        r_zero = o.is_zero(rr)
        i = o.sqr(o.double(h))
        j = o.mul(h, i)
        r2 = o.double(rr)
        v = o.mul(u1, i)
        x3 = o.sub(o.sub(o.sqr(r2), j), o.double(v))
        y3 = o.sub(o.mul(r2, o.sub(v, x3)), o.double(o.mul(s1, j)))
        z3 = o.mul(o.mul(o.double(p.z), q.z), h)
        generic = JacobianPoint(x3, y3, z3)
        return self._add_dispatch(p, q, generic, h_zero, r_zero)

    def madd(self, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
        """Mixed addition: p (Jacobian) + q (affine, Z in {0,1}; Z=0 with
        (0, 1, 0) encodes infinity).

        madd-2007-bl: 7M+4S vs 12M+4S for the generic add — the workhorse
        of MSM bucket accumulation, where the incoming stream of sorted
        points is affine. All edge cases (either operand infinite, p == q,
        p == -q) are still handled, so this is a *complete* mixed add."""
        o = self.ops
        z1z1 = o.sqr(p.z)
        u2 = o.mul(q.x, z1z1)
        s2 = o.mul(o.mul(q.y, p.z), z1z1)
        h = o.sub(u2, p.x)
        rhalf = o.sub(s2, p.y)
        h_zero = o.is_zero(h)
        r_zero = o.is_zero(rhalf)
        hh = o.sqr(h)
        i4 = o.double(o.double(hh))
        j = o.mul(h, i4)
        r = o.double(rhalf)
        v = o.mul(p.x, i4)
        x3 = o.sub(o.sub(o.sqr(r), j), o.double(v))
        y3 = o.sub(o.mul(r, o.sub(v, x3)), o.double(o.mul(p.y, j)))
        z3 = o.sub(o.sub(o.sqr(o.add(p.z, h)), z1z1), hh)
        generic = JacobianPoint(x3, y3, z3)
        return self._add_dispatch(p, q, generic, h_zero, r_zero)

    def neg(self, pt: JacobianPoint) -> JacobianPoint:
        return JacobianPoint(pt.x, self.ops.neg(pt.y), pt.z)

    def scalar_mul(self, scalars: jnp.ndarray, pt: JacobianPoint) -> JacobianPoint:
        """Batched variable-base scalar multiplication.

        scalars: (S_L, ...) uint32 canonical 16-bit limbs of the scalar field
        (NOT Montgomery). Left-to-right double-and-add over all scalar bits,
        lane-masked adds.
        """
        nbits = self.curve.scalar_field.num_limbs * fields.LIMB_BITS

        def body(i, acc):
            acc = self.double(acc)
            bit_index = nbits - 1 - i
            limb = scalars[bit_index // fields.LIMB_BITS]
            shift = (bit_index % fields.LIMB_BITS).astype(jnp.uint32)
            bit = jnp.right_shift(limb, shift) & jnp.uint32(1)
            added = self.add(acc, pt)
            mask = bit != 0
            return JacobianPoint(
                self.ops.select(mask, added.x, acc.x),
                self.ops.select(mask, added.y, acc.y),
                self.ops.select(mask, added.z, acc.z),
            )

        init = self.infinity_like(pt)
        return jax.lax.fori_loop(0, nbits, body, init)

    def to_affine(self, pt: JacobianPoint):
        """Batch-normalize to affine coordinates (Z in {0,1}) on device.

        Infinity lanes come back as (0, 1, 0). Uses one batched inversion
        (mirrors the reference's batch-normalization benchmark,
        `manta-benchmark/benches/ecc.rs:105-136`).
        """
        o = self.ops
        z_inv = o.batch_inv(pt.z)  # zeros stay zero
        z2 = o.sqr(z_inv)
        z3 = o.mul(z2, z_inv)
        x = o.mul(pt.x, z2)
        y = o.mul(pt.y, z3)
        inf = self.is_infinity(pt)
        one = o.one_like(pt.z)
        zero = o.zeros_like(pt.z)
        return JacobianPoint(
            o.select(inf, zero, x),
            o.select(inf, one, y),
            o.select(inf, zero, one),
        )

    def reduce_sum(self, pt: JacobianPoint) -> JacobianPoint:
        """Tree-reduce a 1D batch of points to a single point (lane-parallel
        pairwise adds, log2(N) rounds)."""
        n = pt.x.shape[-1]
        while n > 1:
            half = n // 2
            lo = JacobianPoint(
                pt.x[..., :half], pt.y[..., :half], pt.z[..., :half]
            )
            hi = JacobianPoint(
                pt.x[..., half : 2 * half],
                pt.y[..., half : 2 * half],
                pt.z[..., half : 2 * half],
            )
            merged = self.add(lo, hi)
            if n % 2:
                tail = JacobianPoint(
                    pt.x[..., -1:], pt.y[..., -1:], pt.z[..., -1:]
                )
                merged_first = self.add(
                    JacobianPoint(
                        merged.x[..., :1], merged.y[..., :1], merged.z[..., :1]
                    ),
                    tail,
                )
                merged = JacobianPoint(
                    jnp.concatenate([merged_first.x, merged.x[..., 1:]], axis=-1),
                    jnp.concatenate([merged_first.y, merged.y[..., 1:]], axis=-1),
                    jnp.concatenate([merged_first.z, merged.z[..., 1:]], axis=-1),
                )
            pt = merged
            n = half
        return pt


G1_BLS = CurveOps(hostmath.BLS12_381_G1)
G2_BLS = CurveOps(hostmath.BLS12_381_G2)
G1_BN = CurveOps(hostmath.BN254_G1)
G2_BN = CurveOps(hostmath.BN254_G2)


_NAMED = {
    "bls12_381_g1": G1_BLS,
    "bls12_381_g2": G2_BLS,
    "bn254_g1": G1_BN,
    "bn254_g2": G2_BN,
}


@functools.lru_cache(maxsize=None)
def _ops_cache(curve: hostmath.WeierstrassCurve, backend: str) -> CurveOps:
    return CurveOps(curve, backend)


def curve_ops_for(
    curve: hostmath.WeierstrassCurve, backend: str = "limb"
) -> CurveOps:
    if backend == "fused":
        from manta_tpu.ops.pallas import point_kernels as PK

        return PK.fused_curve_ops_for(curve)
    if backend == "rns_fused":
        from manta_tpu.ops.pallas import rns_kernels as RK

        return RK.rns_fused_curve_ops_for(curve)
    if backend == "rns_hybrid":
        from manta_tpu.ops.pallas import rns_kernels as RK

        return RK.rns_hybrid_curve_ops_for(curve)
    if backend == "limb" and curve.name in _NAMED:
        return _NAMED[curve.name]
    return _ops_cache(curve, backend)


@functools.lru_cache(maxsize=None)
def _rns_annotated_cache(curve: hostmath.WeierstrassCurve) -> "RnsCurveOps":
    return RnsCurveOps(curve, "rns")


def rns_curve_ops_for(curve: hostmath.WeierstrassCurve) -> "RnsCurveOps":
    """RNS backend with the bound-annotated (renorm-free) formulas."""
    return _rns_annotated_cache(curve)


@dataclasses.dataclass(frozen=True)
class RnsCurveOps(CurveOps):
    """Curve ops with bound-annotated RNS formulas: raw residue adds/subs
    with per-call offsets instead of a renormalizing multiply per add/sub.

    Bound audit (values as multiples of p; mul outputs < (k1+2)p ≈ 2^6):
    every mul/sqr resets to 2^6; the longest raw chains stay ≤ 2^11.2, and
    the RNS spec admits multiply inputs up to 2^12 (M1 > 2^25·p).
    """

    @property
    def limb16_points(self) -> bool:
        return False  # points are packed int32 residues, not 16-bit limbs

    def double(self, pt: JacobianPoint) -> JacobianPoint:
        o = self.ops
        a = o.sqr(pt.x)                       # 2^6
        b = o.sqr(pt.y)                       # 2^6
        c = o.sqr(b)                          # 2^6
        t = o.sqr(o.add_raw(pt.x, b))         # input ≤ 2^11; out 2^6
        d = o.double_raw(o.sub_k(o.sub_k(t, a, 6), c, 6))   # ≤ 2^8.6
        e = o.add_raw(o.add_raw(a, a), a)     # 3·2^6 ≤ 2^8
        f = o.sqr(e)                          # 2^6
        x3 = o.sub_k(f, o.double_raw(d), 10)  # ≤ 2^6 + 2^10
        c8 = o.double_raw(o.double_raw(o.double_raw(c)))    # 2^9
        y3 = o.sub_k(o.mul(e, o.sub_k(d, x3, 11)), c8, 9)   # ≤ 2^9.2
        z3 = o.mul(o.double_raw(pt.y), pt.z)  # 2^6
        return JacobianPoint(x3, y3, z3)

    def add(self, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
        o = self.ops
        z1z1 = o.sqr(p.z)
        z2z2 = o.sqr(q.z)
        u1 = o.mul(p.x, z2z2)
        u2 = o.mul(q.x, z1z1)
        s1 = o.mul(o.mul(p.y, q.z), z2z2)
        s2 = o.mul(o.mul(q.y, p.z), z1z1)
        h = o.sub_k(u2, u1, 6)                # ≤ 2^7
        rr = o.sub_k(s2, s1, 6)               # ≤ 2^7
        h_zero = o.is_zero(h)
        r_zero = o.is_zero(rr)
        i = o.sqr(o.double_raw(h))            # 2^6
        j = o.mul(h, i)                       # 2^6
        r2 = o.double_raw(rr)                 # 2^8
        v = o.mul(u1, i)                      # 2^6
        x3 = o.sub_k(o.sub_k(o.sqr(r2), j, 6), o.double_raw(v), 7)  # ≤ 2^8.3
        y3 = o.sub_k(
            o.mul(r2, o.sub_k(v, x3, 9)),     # inner ≤ 2^9.3; out 2^6
            o.double_raw(o.mul(s1, j)),       # 2^7
            7,
        )                                     # ≤ 2^7.3
        z3 = o.mul(o.mul(o.double_raw(p.z), q.z), h)  # inputs ≤ 2^7 ✓
        generic = JacobianPoint(x3, y3, z3)
        return self._add_dispatch(p, q, generic, h_zero, r_zero)

    def madd(self, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
        """Bound-annotated RNS mixed add (madd-2007-bl).

        Accumulator (p) bound invariants under MSM usage — every coordinate
        is either a fresh affine/normalized value, a madd output
        (x ≤ 2^8.1, y ≤ 2^7.7, z ≤ 2^7.6), or a double output
        (x ≤ 2^10.1, y ≤ 2^9.2, z ≤ 2^6); the sub_k offsets below cover the
        maxima (x ≤ 2^11, y ≤ 2^10, z ≤ 2^8), and every multiply input
        stays ≤ 2^12 as the RNS spec requires. q is normalized (< p)."""
        o = self.ops
        z1z1 = o.sqr(p.z)                     # 2^6
        u2 = o.mul(q.x, z1z1)                 # 2^6
        s2 = o.mul(o.mul(q.y, p.z), z1z1)     # 2^6
        h = o.sub_k(u2, p.x, 11)              # ≤ 2^6 + 2^11
        rhalf = o.sub_k(s2, p.y, 10)          # ≤ 2^6 + 2^10
        h_zero = o.is_zero(h)
        r_zero = o.is_zero(rhalf)
        hh = o.sqr(h)                         # 2^6
        i4 = o.double_raw(o.double_raw(hh))   # 2^8
        j = o.mul(h, i4)                      # 2^6
        r = o.double_raw(rhalf)               # ≤ 2^11.1
        v = o.mul(p.x, i4)                    # 2^6
        x3 = o.sub_k(o.sub_k(o.sqr(r), j, 6), o.double_raw(v), 7)  # ≤ 2^8.1
        y3 = o.sub_k(
            o.mul(r, o.sub_k(v, x3, 9)),      # inner ≤ 2^9.2; out 2^6
            o.double_raw(o.mul(p.y, j)),      # 2^7
            7,
        )                                     # ≤ 2^7.7
        z3 = o.sub_k(
            o.sub_k(o.sqr(o.add_raw(p.z, h)), z1z1, 6), hh, 6
        )                                     # ≤ 2^7.6
        generic = JacobianPoint(x3, y3, z3)
        return self._add_dispatch(p, q, generic, h_zero, r_zero)
