"""Fused Pallas TPU kernels for RNS point arithmetic (f32 fast path).

The limb backend's fused column kernel measures ~87 Mmul/s — the VPU
ceiling of 16-bit-limb schoolbook Montgomery (~1.2k int32 multiplies per
field multiply, each emulated on the TPU's float-native vector unit).
This module runs the same MSM column pass over the RNS representation
(`manta_tpu.ops.rns`: two ~37-channel 12-bit-prime bases + a redundant
channel, Bajard approximate first extension + exact Shenoy second):

- **Everything is f32.** With 12-bit moduli every product < 2^24 and
  every base-extension partial sum < 2^19 — exactly representable in
  f32. A channel modmul is ~5 native f32 ops (mul, reciprocal-floor
  Barrett, correction), no integer multiplies at all.
- **Base extensions are f32 matmuls on the MXU.** The (k x k) constant
  CRT matrices multiply the batch via 6-bit digit splits (4 exact f32
  dots), overlapping with VPU work.
- **Zero tests are one matmul.** value ≡ 0 mod p ⟺ the residue vector
  equals one of the <= 2^11.2 zero-class rows k·p; the squared distance
  to ALL classes at once is ||t||^2 - 2 t·x + ||x||^2 — digit-split
  dots against the class table, wraparound-safe in int32.

Curve formulas are NOT rewritten: `_RnsKernelCurve` plugs `_KernelRnsOps`
into the bound-annotated renorm-free formulas of
`manta_tpu.ops.curve.RnsCurveOps` (audited: every multiply input <= 2^12
multiples of p, which the zero-class table covers).

Constant tables (per-channel vectors, CRT matrices, zero classes) enter
the kernels as VMEM operands — Pallas TPU kernels cannot capture array
constants.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from manta_tpu.ops import curve as C
from manta_tpu.ops import rns as R
from manta_tpu.ops.curve import JacobianPoint
from manta_tpu.utils import hostmath

COLUMN_LANE_BLOCK = 256
COLUMN_STEP_BLOCK = 8
# Generic point-op lane block. The fused madd/add bodies keep ~hundreds of
# (Kt, block) f32 temporaries live on the Mosaic stack (~57MB at 512 lanes,
# measured), covered by the raised per-kernel vmem_limit_bytes below.
LANE_BLOCK = 512

#: zero-class count: base-field values are <= 2^11.2 multiples of p
#: (RnsCurveOps bound audit) plus the sub_k offsets; Fq2 components run
#: one bit wider (schoolbook mul outputs <= 2^7·p per component, every
#: offset shifted +1) — 2^13 rows cover every call site of both.
N_ZERO_CLASSES = 1 << 13


@functools.lru_cache(maxsize=1)
def _interpret() -> bool:
    try:
        return jax.devices()[0].platform == "cpu"
    except Exception:  # noqa: BLE001
        return True


# ---------------------------------------------------------------------------
# Host-side constant tables (shipped to the kernel as operands)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _tables(spec: R.RnsSpec):
    """All kernel constants, packed as numpy arrays.

    Layout (Kt = k1 + k2 + 1 channels, channels-major like the data):
      fvec: (NF, Kt) f32 rows — moduli, reciprocals, per-channel constants
            (zero-padded outside each constant's own base)
      amat: (4, MAXK, MAXK) f32 — digit-split halves of A1 / A2 (lo, hi)
      ztab: (2, N_ZERO_CLASSES, Kt) f32 — zero-class table digit halves
      znorm: (N_ZERO_CLASSES,) int32 — ||class row||^2
    """
    c = spec.consts
    k1, k2 = spec.k1, spec.k2
    Kt = k1 + k2 + 1
    p = spec.field.modulus

    def row(vals_b1=None, vals_b2=None, val_r=None):
        out = np.zeros(Kt, np.float32)
        if vals_b1 is not None:
            out[:k1] = vals_b1
        if vals_b2 is not None:
            out[k1 : k1 + k2] = vals_b2
        if val_r is not None:
            out[k1 + k2] = val_r
        return out

    m_all = row(c["m1"], c["m2"], spec.m_r)
    rows = {
        "m": m_all,
        "inv": row(c["inv_f1"], c["inv_f2"], c["inv_fr"]),
        "neg_p_inv_1": row(c["neg_p_inv_1"]),
        "w1": row(c["w1"]),
        "p_2r": row(None, c["p_2"], c["p_r"]),
        "M1_inv_2r": row(None, c["M1_inv_2"], c["M1_inv_r"]),
        "w2": row(None, c["w2"]),
        "M2_inv_r": row(None, None, c["M2_inv_r"]),
        "M2_mod_1": row(c["M2_mod_1"]),
        "one": np.concatenate(
            [
                np.asarray(R._one_rep_cached(spec)[0], np.float32),
                np.asarray(R._one_rep_cached(spec)[1], np.float32),
                np.asarray([R._one_rep_cached(spec)[2]], np.float32),
            ]
        ),
    }
    for k in range(5, 14):
        rows[f"off{k}"] = row(c[f"off{k}_1"], c[f"off{k}_2"], c[f"off{k}_r"])
    names = list(rows)
    fvec = np.stack([rows[n] for n in names]).astype(np.float32)

    maxk = max(k1, k2 + 1, k2)
    # A1: (k2+1, k1) — sigma (B1) -> B2 ∪ {r}; A2full: (k1+1, k2) with the
    # A2r row appended — sigma2 (B2) -> B1 ∪ {r}
    a1 = np.zeros((maxk, maxk), np.float32)
    a1[: k2 + 1, :k1] = np.asarray(c["A1"], np.float32)
    a2 = np.zeros((maxk, maxk), np.float32)
    a2[:k1, :k2] = np.asarray(c["A2"], np.float32)
    a2[k1, :k2] = np.asarray(c["A2r"], np.float32)
    amat = np.stack(
        [np.mod(a1, 64), np.floor(a1 / 64), np.mod(a2, 64), np.floor(a2 / 64)]
    ).astype(np.float32)

    ztab_i = np.zeros((N_ZERO_CLASSES, Kt), np.int64)
    mods = list(spec.b1) + list(spec.b2) + [spec.m_r]
    for k in range(N_ZERO_CLASSES):
        v = k * p
        ztab_i[k] = [v % m for m in mods]
    ztab = np.stack([ztab_i % 64, ztab_i // 64]).astype(np.float32)
    # row norms < Kt·2^24 < 2^31: exact in int32; shape (C, 1) so the
    # kernel operand is 2-D (TPU VMEM wants tiled shapes)
    znorm = (
        (ztab_i.astype(np.int64) ** 2).sum(axis=1).astype(np.int32)[:, None]
    )
    return names, fvec, amat, ztab, znorm


@functools.lru_cache(maxsize=None)
def _limb_conv_tables(spec: R.RnsSpec):
    """Constants for in-kernel limb -> RNS conversion (the hybrid MSM
    backend keeps HBM point arrays in the 24-limb uint32 Montgomery form
    and converts inside the column kernel).

    cmat: (2, Kt, 2L) f32 — 6-bit halves of T, where T[j, i] = 2^(16i) mod
    m_j for i < L and T[j, L+i] = 2^(16i+8) mod m_j (the limbs are split
    into 8-bit halves at runtime, so every f32 dot partial stays < 2^20).
    convk: (Kt,) f32 — residues of M1^2 · 2^(-16L) mod p; one RNS
    Montgomery multiply by convk maps the exact limb value v = x·2^(16L)
    into the RNS Montgomery domain (x·M1 mod p, bound < (k1+2)p).
    """
    L = spec.field.num_limbs
    mods = list(spec.b1) + list(spec.b2) + [spec.m_r]
    Kt = len(mods)
    T = np.zeros((Kt, 2 * L), np.int64)
    for j, m in enumerate(mods):
        for i in range(L):
            T[j, i] = pow(2, 16 * i, m)
            T[j, L + i] = pow(2, 16 * i + 8, m)
    cmat = np.stack([T % 64, T // 64]).astype(np.float32)
    p = spec.field.modulus
    K = spec.M1 * spec.M1 % p * spec.field.R_inv % p
    # (Kt, 1): TPU VMEM kernel operands must be >= 2-D
    convk = np.asarray([K % m for m in mods], np.float32)[:, None]
    return cmat, convk


# ---------------------------------------------------------------------------
# In-kernel RNS coordinate ops (f32 residues, channels-major (Kt, lanes))
# ---------------------------------------------------------------------------


class _KernelRnsOps:
    """RnsCoordOps surface over in-register f32 arrays inside a kernel.

    Residues live in [0, m_i) as exact f32 integers. Raw adds keep
    residues < 2^13-ish between Barrett steps — always exact (< 2^24).
    """

    def __init__(
        self, spec: R.RnsSpec, fvec, amat, ztab, znorm, names,
        cmat=None, convk=None,
    ):
        self.spec = spec
        self._f = {n: fvec[i] for i, n in enumerate(names)}
        self._amat = amat
        self._ztab = ztab
        self._znorm = znorm
        self._cmat = cmat
        self._convk = convk

    def _vec(self, name):
        v = self._f[name]
        return v.reshape((v.shape[0],) + (1,))

    def _mod(self, x, m, inv):
        q = jnp.floor(x * inv)
        r = x - q * m
        r = jnp.where(r < 0, r + m, r)
        return jnp.where(r >= m, r - m, r)

    def _modmul(self, x, y, m, inv):
        return self._mod(x * y, m, inv)

    # -- CoordOps surface --

    def mul(self, a, b):
        """RNS Montgomery product; mirrors `rns.mul` in f32."""
        spec = self.spec
        k1, k2 = spec.k1, spec.k2
        m = self._vec("m")
        inv = self._vec("inv")
        t = self._modmul(a, b, m, inv)

        m_res = self._modmul(
            t[:k1], self._vec("neg_p_inv_1")[:k1], m[:k1], inv[:k1]
        )
        sigma = self._modmul(m_res, self._vec("w1")[:k1], m[:k1], inv[:k1])

        # ext1: S = A1 @ sigma  (exact digit-split f32 dots on the MXU)
        S_int, S_f = self._ext_matmul(sigma, 0, k1, k2 + 1)
        mhat = self._mod_wide(S_int, S_f, m[k1:], inv[k1:])  # B2 ∪ r

        u = t[k1:] + self._modmul(
            mhat, self._vec("p_2r")[k1:], m[k1:], inv[k1:]
        )
        u = jnp.where(u >= m[k1:], u - m[k1:], u)
        out_2r = self._modmul(
            u, self._vec("M1_inv_2r")[k1:], m[k1:], inv[k1:]
        )

        # ext2 (Shenoy): back into B1 using the redundant channel
        sigma2 = self._modmul(
            out_2r[:k2], self._vec("w2")[k1 : k1 + k2], m[k1 : k1 + k2],
            inv[k1 : k1 + k2],
        )
        S2_int, S2_f = self._ext_matmul(sigma2, 2, k2, k1 + 1)
        s2r_mod = self._mod_wide(
            S2_int[k1], S2_f[k1], m[k1 + k2], inv[k1 + k2]
        )
        out_r = out_2r[k2]
        diff = s2r_mod - out_r
        m_r = m[k1 + k2]
        diff = jnp.where(diff < 0, diff + m_r, diff)
        alpha = self._modmul(
            diff, self._vec("M2_inv_r")[k1 + k2], m_r, inv[k1 + k2]
        )
        corr = self._modmul(
            alpha, self._vec("M2_mod_1")[:k1], m[:k1], inv[:k1]
        )
        out1 = self._mod_wide(S2_int[:k1], S2_f[:k1], m[:k1], inv[:k1]) - corr
        out1 = jnp.where(out1 < 0, out1 + m[:k1], out1)
        return jnp.concatenate([out1, out_2r], axis=0)

    def _mod_wide(self, x_int, x_f, m, inv):
        """Exact x mod m for x < 2^30 held as (exact int32, approximate
        f32): approximate quotient from the f32 value, exact remainder in
        int32, then bounded corrections (f32 rounding of a 2^30 value is
        < 2^7, so the quotient is off by at most 1 either way)."""
        q = jnp.floor(x_f * inv).astype(jnp.int32)
        mi = m.astype(jnp.int32)
        r = x_int - q * mi  # q < 2^18, m < 2^12: exact in int32
        r = jnp.where(r < 0, r + mi, r)
        r = jnp.where(r < 0, r + mi, r)
        r = jnp.where(r >= mi, r - mi, r)
        r = jnp.where(r >= mi, r - mi, r)
        return r.astype(jnp.float32)

    def _ext_matmul(self, sigma, mat_index, k_in, k_out):
        """Exact (k_out, k_in) @ (k_in, lanes) in f32 via 6-bit splits."""
        a_lo = self._amat[mat_index]
        a_hi = self._amat[mat_index + 1]
        x_hi = jnp.floor(sigma * (1.0 / 64.0))
        x_lo = sigma - 64.0 * x_hi
        maxk = a_lo.shape[0]
        pad = maxk - sigma.shape[0]
        if pad:
            zerow = jnp.zeros((pad, *sigma.shape[1:]), jnp.float32)
            x_lo = jnp.concatenate([x_lo, zerow], axis=0)
            x_hi = jnp.concatenate([x_hi, zerow], axis=0)

        def dot(w, x):
            return jax.lax.dot_general(
                w, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        s_ll = dot(a_lo, x_lo)
        s_lh = dot(a_lo, x_hi)
        s_hl = dot(a_hi, x_lo)
        s_hh = dot(a_hi, x_hi)
        # each partial sum < Kt·2^12 < 2^19: f32-exact; the combined value
        # (< 2^30) is exact only in int32 — return both (exact, approx)
        out_int = (
            s_ll.astype(jnp.int32)
            + ((s_lh + s_hl).astype(jnp.int32) << 6)
            + (s_hh.astype(jnp.int32) << 12)
        )
        out_f = s_ll + 64.0 * (s_lh + s_hl) + 4096.0 * s_hh
        return out_int[:k_out], out_f[:k_out]

    def sqr(self, a):
        return self.mul(a, a)

    def from_limbs(self, limbs):
        """(L, lanes) f32 of 16-bit limbs of v = x·2^(16L) mod p (lazy
        [0, 2p) limb-Montgomery) -> RNS-Montgomery residues of x·M1 mod p
        (bound < (k1+2)p). One exact digit-split matmul computes the
        residues of v; one RNS Montgomery multiply by
        convk = M1²·2^(-16L) swaps Montgomery radices."""
        hi = jnp.floor(limbs * (1.0 / 256.0))
        lo = limbs - 256.0 * hi
        d = jnp.concatenate([lo, hi], axis=0)  # (2L, lanes), entries < 2^8

        def dot(w, x):
            return jax.lax.dot_general(
                w, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # partials < 2L·2^6·2^8 = 2^19.6: f32-exact; combined < 2^26: int32
        s_lo = dot(self._cmat[0], d)
        s_hi = dot(self._cmat[1], d)
        out_int = s_lo.astype(jnp.int32) + (s_hi.astype(jnp.int32) << 6)
        out_f = s_lo + 64.0 * s_hi
        m = self._vec("m")
        inv = self._vec("inv")
        res = self._mod_wide(out_int, out_f, m, inv)
        return self.mul(res, jnp.broadcast_to(self._convk, res.shape))

    def add(self, a, b):
        # single conditional-subtract add (both operands canonical)
        m = self._vec("m")
        o = a + b
        return jnp.where(o >= m, o - m, o)

    def add_raw(self, a, b):
        return self.add(a, b)

    def double_raw(self, a):
        return self.add(a, a)

    def double(self, a):
        return self.add(a, a)

    def triple(self, a):
        return self.add(self.add(a, a), a)

    def sub_k(self, a, b, k: int):
        m = self._vec("m")
        inv = self._vec("inv")
        return self._mod(a - b + self._vec(f"off{k}"), m, inv)

    def sub(self, a, b):
        return self.sub_k(a, b, 12)

    def neg(self, a):
        return self.sub_k(self.zeros_like(a), a, 12)

    def is_zero(self, a):
        """value ≡ 0 mod p via squared distance to every zero-class row:
        D_c = ||t_c||^2 - 2 t_c·x + ||x||^2, digit-split exact dots,
        int32 wraparound-safe (true D < 2^31)."""
        x_hi = jnp.floor(a * (1.0 / 64.0))
        x_lo = a - 64.0 * x_hi

        def dot(w, x):
            return jax.lax.dot_general(
                w, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        t_ll = dot(self._ztab[0], x_lo)
        t_lh = dot(self._ztab[0], x_hi)
        t_hl = dot(self._ztab[1], x_lo)
        t_hh = dot(self._ztab[1], x_hi)
        # t·x pieces are < 75·2^18 — convert to int32 exactly, combine mod 2^32
        tx = (
            t_ll.astype(jnp.int32)
            + ((t_lh + t_hl).astype(jnp.int32) << 6)
            + (t_hh.astype(jnp.int32) << 12)
        )
        xx_lo = (x_lo * x_lo + 128.0 * (x_lo * x_hi)).astype(jnp.int32)
        xx_hi = (x_hi * x_hi).astype(jnp.int32)
        xnorm = jnp.sum(xx_lo, axis=0) + (jnp.sum(xx_hi, axis=0) << 12)
        d = self._znorm - tx - tx + xnorm[None, :]  # znorm is (C, 1)
        return jnp.any(d == 0, axis=0)

    def eq(self, a, b):
        # bound(b) <= 2^11·p; offset + value stays inside the class table
        return self.is_zero(self.sub_k(a, b, 11))

    def select(self, mask, a, b):
        return jnp.where(mask[None, ...], a, b)

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        one = self._vec("one")
        return jnp.broadcast_to(one, a.shape)


class _KernelRnsFq2Ops:
    """Fq[u]/(u^2+1) over stacked (2, Kt, lanes) in-kernel RNS arrays.

    Schoolbook multiplication (4 base muls) keeps component bounds at
    <= 2^7·p — one bit wider than the base field's 2^6·p — so every
    `sub_k` offset the bound-annotated curve formulas request is shifted
    +1 here (max literal 11 -> 12 < the off13 table cap)."""

    def __init__(self, base: _KernelRnsOps):
        self.base = base

    def _map2(self, fn, *arrs):
        return jnp.stack(
            [fn(*(a[0] for a in arrs)), fn(*(a[1] for a in arrs))]
        )

    def mul(self, a, b):
        base = self.base
        t0 = base.mul(a[0], b[0])
        t1 = base.mul(a[1], b[1])
        c0 = base.sub_k(t0, t1, 6)  # u^2 = -1; bound <= 2^7
        c1 = base.add(base.mul(a[0], b[1]), base.mul(a[1], b[0]))
        return jnp.stack([c0, c1])

    def from_limbs(self, limbs):
        """(2, L, lanes) limb components -> (2, Kt, lanes) RNS residues."""
        return jnp.stack(
            [self.base.from_limbs(limbs[0]), self.base.from_limbs(limbs[1])]
        )

    def sqr(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        return self._map2(self.base.add, a, b)

    def add_raw(self, a, b):
        return self._map2(self.base.add, a, b)

    def double(self, a):
        return self.add(a, a)

    def double_raw(self, a):
        return self.add(a, a)

    def triple(self, a):
        return self.add(self.add(a, a), a)

    def sub_k(self, a, b, k: int):
        return self._map2(lambda x, y: self.base.sub_k(x, y, k + 1), a, b)

    def sub(self, a, b):
        return self.sub_k(a, b, 12)

    def neg(self, a):
        return self.sub_k(jnp.zeros_like(a), a, 12)

    def is_zero(self, a):
        return jnp.logical_and(
            self.base.is_zero(a[0]), self.base.is_zero(a[1])
        )

    def eq(self, a, b):
        return self.is_zero(self.sub_k(a, b, 11))

    def select(self, mask, a, b):
        return jnp.where(mask[None, None, ...], a, b)

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        return jnp.stack(
            [self.base.one_like(a[0]), jnp.zeros_like(a[1])]
        )


@dataclasses.dataclass(frozen=True)
class _RnsKernelCurve(C.RnsCurveOps):
    """Bound-annotated RNS formulas over in-kernel f32 ops. `kops` is set
    per kernel invocation (tables are kernel operands)."""

    kops: object = None

    @property
    def ops(self):  # noqa: D401
        return self.kops


# ---------------------------------------------------------------------------
# Fused column kernel (RNS geometry: coords (K, Kt, R) f32-as-int32 input)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _rns_column_call(curve: hostmath.WeierstrassCurve, K: int, Rl: int):
    spec = R.default_spec(curve.field)
    names, fvec, amat, ztab, znorm = _tables(spec)
    Kt = spec.k1 + spec.k2 + 1
    ext = curve.is_ext
    # ext blocks carry 2x the rows: halve the lane block to stay in VMEM
    Rb = min(COLUMN_LANE_BLOCK // (2 if ext else 1), Rl)
    Kb = min(COLUMN_STEP_BLOCK, K)
    assert Rl % Rb == 0 and K % Kb == 0

    cdims = (2, Kt) if ext else (Kt,)
    coord_spec = pl.BlockSpec(
        (Kb, *cdims, Rb),
        (lambda r, k: (k, 0, 0, r)) if ext else (lambda r, k: (k, 0, r)),
        memory_space=pltpu.VMEM,
    )
    mask_spec = pl.BlockSpec(
        (Kb, Rb), lambda r, k: (k, r), memory_space=pltpu.VMEM
    )
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda r, k: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    def kernel(fv, am, zt, zn, px, py, qinf, head, ox, oy, oz, sx, sy, sz):
        kops = _make_kops(curve, spec, names, fv[...], am[...], zt[...], zn[...])
        kc = _RnsKernelCurve(curve, backend="rns_kernel", kops=kops)
        o = kops
        kb = pl.program_id(1)

        @pl.when(kb == 0)
        def _():
            sx[...] = jnp.zeros_like(sx)
            sy[...] = o.one_like(sy[...]).astype(jnp.float32)
            sz[...] = jnp.zeros_like(sz)

        def body(j, carry):
            acc = JacobianPoint(*carry)
            qx = px[j].astype(jnp.float32)
            qy = py[j].astype(jnp.float32)
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
            ox[j] = acc.x
            oy[j] = acc.y
            oz[j] = acc.z
            return tuple(acc)

        acc0 = (sx[...], sy[...], sz[...])
        ax, ay, az = jax.lax.fori_loop(0, Kb, body, acc0)
        sx[...] = ax
        sy[...] = ay
        sz[...] = az

    shape = (K, *cdims, Rl)
    scratch = [pltpu.VMEM((*cdims, Rb), jnp.float32) for _ in range(3)]
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct(shape, jnp.float32) for _ in range(3)
        ),
        grid=(Rl // Rb, K // Kb),
        in_specs=[
            const_spec(fvec.shape),
            const_spec(amat.shape),
            const_spec(ztab.shape),
            const_spec(znorm.shape),
            coord_spec,
            coord_spec,
            mask_spec,
            mask_spec,
        ],
        out_specs=tuple([coord_spec] * 3),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )


@functools.lru_cache(maxsize=None)
def _hybrid_column_call(curve: hostmath.WeierstrassCurve, K: int, Rl: int):
    """Hybrid column kernel: HBM point inputs stay in the 24-limb uint32
    Montgomery form (1/3.2 of the RNS footprint — the round-2 rns_fused
    MSM lost its compute win to RNS-sized gathers, NOTES_r2); the kernel
    converts limb -> f32 RNS per step and accumulates at the RNS rate.
    Outputs (accumulator stream) are RNS int32, consumed by the RNS
    bucket/reduce machinery."""
    spec = R.default_spec(curve.field)
    names, fvec, amat, ztab, znorm = _tables(spec)
    cmat, convk = _limb_conv_tables(spec)
    Kt = spec.k1 + spec.k2 + 1
    L = spec.field.num_limbs
    ext = curve.is_ext
    Rb = min(COLUMN_LANE_BLOCK // (2 if ext else 1), Rl)
    Kb = min(COLUMN_STEP_BLOCK, K)
    assert Rl % Rb == 0 and K % Kb == 0

    cdims = (2, Kt) if ext else (Kt,)
    ldims = (2, L) if ext else (L,)
    idx3 = lambda r, k: (k, 0, 0, r)
    idx2 = lambda r, k: (k, 0, r)
    out_spec = pl.BlockSpec(
        (Kb, *cdims, Rb), idx3 if ext else idx2, memory_space=pltpu.VMEM
    )
    in_spec = pl.BlockSpec(
        (Kb, *ldims, Rb), idx3 if ext else idx2, memory_space=pltpu.VMEM
    )
    mask_spec = pl.BlockSpec(
        (Kb, Rb), lambda r, k: (k, r), memory_space=pltpu.VMEM
    )
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda r, k: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    def kernel(fv, am, zt, zn, cm, ck, px, py, qinf, head,
               ox, oy, oz, sx, sy, sz):
        kops = _make_kops(
            curve, spec, names, fv[...], am[...], zt[...], zn[...],
            cm[...], ck[...],
        )
        kc = _RnsKernelCurve(curve, backend="rns_kernel", kops=kops)
        o = kops
        kb = pl.program_id(1)

        @pl.when(kb == 0)
        def _():
            sx[...] = jnp.zeros_like(sx)
            sy[...] = o.one_like(sy[...]).astype(jnp.float32)
            sz[...] = jnp.zeros_like(sz)

        def body(j, carry):
            acc = JacobianPoint(*carry)
            qx = o.from_limbs(px[j].astype(jnp.float32))
            qy = o.from_limbs(py[j].astype(jnp.float32))
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
            ox[j] = acc.x
            oy[j] = acc.y
            oz[j] = acc.z
            return tuple(acc)

        acc0 = (sx[...], sy[...], sz[...])
        ax, ay, az = jax.lax.fori_loop(0, Kb, body, acc0)
        sx[...] = ax
        sy[...] = ay
        sz[...] = az

    shape = (K, *cdims, Rl)
    scratch = [pltpu.VMEM((*cdims, Rb), jnp.float32) for _ in range(3)]
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct(shape, jnp.float32) for _ in range(3)
        ),
        grid=(Rl // Rb, K // Kb),
        in_specs=[
            const_spec(fvec.shape),
            const_spec(amat.shape),
            const_spec(ztab.shape),
            const_spec(znorm.shape),
            const_spec(cmat.shape),
            const_spec(convk.shape),
            in_spec,
            in_spec,
            mask_spec,
            mask_spec,
        ],
        out_specs=tuple([out_spec] * 3),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )


def hybrid_accumulate_columns(curve, px, py, qinf, head):
    """Hybrid (limb in, RNS out) K-step column accumulation."""
    spec = R.default_spec(curve.field)
    names, fvec, amat, ztab, znorm = _tables(spec)
    cmat, convk = _limb_conv_tables(spec)
    K, Rl = px.shape[0], px.shape[-1]
    call = _hybrid_column_call(curve, K, Rl)
    return call(
        jnp.asarray(fvec),
        jnp.asarray(amat),
        jnp.asarray(ztab),
        jnp.asarray(znorm),
        jnp.asarray(cmat),
        jnp.asarray(convk),
        # int32 on the way in: Mosaic has no uint32 -> f32 cast, and the
        # 16-bit limb values are sign-safe in int32
        px.astype(jnp.int32),
        py.astype(jnp.int32),
        qinf.astype(jnp.int32),
        head.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Single-call fused point kernels + the rns_fused CurveOps backend
# ---------------------------------------------------------------------------


def _make_kops(curve, spec, names, fv, am, zt, zn, cm=None, ck=None):
    kops = _KernelRnsOps(spec, fv, am, zt, zn, names, cm, ck)
    if curve.is_ext:
        kops = _KernelRnsFq2Ops(kops)
    return kops


@functools.lru_cache(maxsize=None)
def _rns_point_op(curve: hostmath.WeierstrassCurve, which: str, n: int):
    spec = R.default_spec(curve.field)
    names, fvec, amat, ztab, znorm = _tables(spec)
    Kt = spec.k1 + spec.k2 + 1
    ext = curve.is_ext
    n_in = {"add": 6, "madd": 6, "double": 3}[which]
    block = min(LANE_BLOCK, n)
    assert n % block == 0

    def kernel(*refs):
        fv, am, zt, zn = refs[:4]
        ins = refs[4 : 4 + n_in]
        outs = refs[4 + n_in :]
        kops = _make_kops(curve, spec, names, fv[...], am[...], zt[...], zn[...])
        kc = _RnsKernelCurve(curve, backend="rns_kernel", kops=kops)
        load = lambda r: r[...].astype(jnp.float32)
        p = JacobianPoint(load(ins[0]), load(ins[1]), load(ins[2]))
        if which == "double":
            out = kc.double(p)
        else:
            q = JacobianPoint(load(ins[3]), load(ins[4]), load(ins[5]))
            out = kc.add(p, q) if which == "add" else kc.madd(p, q)
        outs[0][...] = out.x.astype(jnp.int32)
        outs[1][...] = out.y.astype(jnp.int32)
        outs[2][...] = out.z.astype(jnp.int32)

    cdims = (2, Kt) if ext else (Kt,)
    cspec = pl.BlockSpec(
        (*cdims, block),
        (lambda i: (0, 0, i)) if ext else (lambda i: (0, i)),
        memory_space=pltpu.VMEM,
    )
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((*cdims, n), jnp.int32) for _ in range(3)
        ),
        grid=(n // block,),
        in_specs=[
            const_spec(fvec.shape),
            const_spec(amat.shape),
            const_spec(ztab.shape),
            const_spec(znorm.shape),
        ]
        + [cspec] * n_in,
        out_specs=tuple([cspec] * 3),
        # The fused add/madd bodies keep many (Kt, block) f32 temporaries
        # live on the Mosaic stack plus the 4.9MB zero-class table; raise
        # the per-kernel VMEM budget above the 16MB default (v5e has 128MB).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )


def _flatten(pt: JacobianPoint, lead: int):
    """(lead coord dims..., batch...) -> (..., n) padded to the block
    quantum; all-zero residue padding reads as infinity (value 0)."""
    batch_shape = pt.x.shape[lead:]
    n = 1
    for d in batch_shape:
        n *= d
    quantum = 128 if n <= LANE_BLOCK else LANE_BLOCK
    n_pad = max(128, -(-n // quantum) * quantum)

    def prep(a):
        flat = a.reshape(*a.shape[:lead], n)
        if n_pad != n:
            pad = jnp.zeros((*a.shape[:lead], n_pad - n), a.dtype)
            flat = jnp.concatenate([flat, pad], axis=-1)
        return flat

    return (
        JacobianPoint(prep(pt.x), prep(pt.y), prep(pt.z)),
        batch_shape,
        n,
        n_pad,
    )


def _unflatten(arrs, batch_shape, n, lead: int):
    return JacobianPoint(
        *(a[..., :n].reshape(*a.shape[:lead], *batch_shape) for a in arrs)
    )


def _check_coord_shape(curve, spec, pt: JacobianPoint, lead: int):
    Kt = spec.k1 + spec.k2 + 1
    want = (2, Kt) if lead == 2 else (Kt,)
    for a in (pt.x, pt.y, pt.z):
        if a.ndim < lead + 1 or tuple(a.shape[:lead]) != want:
            raise ValueError(
                f"{curve.name}: RNS coordinate shape {tuple(a.shape)} does "
                f"not start with {want} (+ batch dims)"
            )


def _run_point_op(curve, which, p: JacobianPoint, q=None):
    spec = R.default_spec(curve.field)
    names, fvec, amat, ztab, znorm = _tables(spec)
    lead = 2 if curve.is_ext else 1
    _check_coord_shape(curve, spec, p, lead)
    if q is not None:
        _check_coord_shape(curve, spec, q, lead)
    pf, bshape, n, n_pad = _flatten(p, lead)
    consts = (
        jnp.asarray(fvec),
        jnp.asarray(amat),
        jnp.asarray(ztab),
        jnp.asarray(znorm),
    )
    if q is None:
        out = _rns_point_op(curve, which, n_pad)(*consts, *pf)
    else:
        qf, _, _, _ = _flatten(q, lead)
        out = _rns_point_op(curve, which, n_pad)(*consts, *pf, *qf)
    return _unflatten(out, bshape, n, lead)


@dataclasses.dataclass(frozen=True)
class RnsFusedCurveOps(C.CurveOps):
    """CurveOps whose point formulas run as fused f32 RNS Pallas kernels.

    XLA-level representation: packed int32 residues (Kt, ...) — the MSM's
    sort/gather/scatter/select plumbing is dtype-agnostic; `ops` is the
    XLA-level `RnsCoordOps` (encode/decode/select/batch_inv). Kernels
    convert to f32 on entry and back to int32 on exit. The MSM layer
    detects `run_columns` and fuses the whole bucket-accumulation pass.
    """

    @property
    def limb16_points(self) -> bool:
        return False  # points are packed int32 residues, not 16-bit limbs

    def add(self, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
        return _run_point_op(self.curve, "add", p, q)

    def madd(self, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
        return _run_point_op(self.curve, "madd", p, q)

    def double(self, p: JacobianPoint) -> JacobianPoint:
        return _run_point_op(self.curve, "double", p)

    def run_columns(self, px, py, qinf, head):
        ox, oy, oz = rns_accumulate_columns(self.curve, px, py, qinf, head)
        return (
            ox.astype(jnp.int32),
            oy.astype(jnp.int32),
            oz.astype(jnp.int32),
        )

    def affine_infinity_mask(self, pt: JacobianPoint):
        """Infinity test for ENCODED affine batches (z residues exactly 0
        or the canonical 1-vector) — avoids the general zero-class scan."""
        return jnp.all(pt.z == 0, axis=tuple(range(pt.z.ndim - 1)))


@functools.lru_cache(maxsize=None)
def rns_fused_curve_ops_for(
    curve: hostmath.WeierstrassCurve,
) -> RnsFusedCurveOps:
    return RnsFusedCurveOps(curve, backend="rns")


@dataclasses.dataclass(frozen=True)
class RnsHybridCurveOps(RnsFusedCurveOps):
    """RNS group law with LIMB-resident HBM point arrays.

    Round 2 measured the all-RNS MSM 2x slower than the limb backend
    despite a 2.3x faster multiply: the (k1+k2+1)=75-row f32 residue
    representation is ~3.2x the HBM bytes of 24 uint32 limbs, and every
    memory-bound phase (per-window gathers, scatters, reductions) paid it
    (NOTES_r2). This backend splits the representations:

    - the AFFINE POINT arrays (MSM inputs: encode_points, padding, signed
      y-negation, the per-window sorted gather) stay limb-major uint32 —
      `point_ops` serves them;
    - the column kernel converts limb -> f32 RNS in VMEM (one exact
      digit-split matmul + one RNS multiply per coordinate) and
    - accumulators / buckets / reduction phases run RNS (inherited).

    The asymmetry is intentional: `encode_points` produces limb batches
    (kernel feed), `decode_points` consumes RNS batches (kernel output).
    """

    @property
    def limb16_points(self) -> bool:
        return not self.curve.is_ext  # point arrays stay 16-bit limb rows

    @functools.cached_property
    def point_ops(self):
        """Limb-domain CoordOps for the affine point arrays."""
        spec = self.curve.field
        return C.Fq2Ops(spec) if self.curve.is_ext else C.CoordOps(spec)

    def encode_points(self, points) -> JacobianPoint:
        """Affine host points -> limb-major uint32 Jacobian batch (the
        column-kernel input form; same encoding as the limb backends)."""
        o = self.point_ops
        zero = (0, 0) if self.curve.is_ext else 0
        one = (1, 0) if self.curve.is_ext else 1
        xs = [zero if pt is None else pt[0] for pt in points]
        ys = [one if pt is None else pt[1] for pt in points]
        zs = [zero if pt is None else one for pt in points]
        return JacobianPoint(
            jnp.asarray(o.encode(xs)),
            jnp.asarray(o.encode(ys)),
            jnp.asarray(o.encode(zs)),
        )

    def point_infinity_like(self, template: JacobianPoint) -> JacobianPoint:
        """Limb-domain (0, 1, 0) batch for padding the point arrays."""
        o = self.point_ops
        return JacobianPoint(
            o.zeros_like(template.x),
            o.one_like(template.y),
            o.zeros_like(template.z),
        )

    def affine_infinity_mask(self, pt: JacobianPoint):
        """Limb-encoded affine batches mark infinity with all-zero Z."""
        return jnp.all(pt.z == 0, axis=tuple(range(pt.z.ndim - 1)))

    def run_columns(self, px, py, qinf, head):
        ox, oy, oz = hybrid_accumulate_columns(self.curve, px, py, qinf, head)
        return (
            ox.astype(jnp.int32),
            oy.astype(jnp.int32),
            oz.astype(jnp.int32),
        )


@functools.lru_cache(maxsize=None)
def rns_hybrid_curve_ops_for(
    curve: hostmath.WeierstrassCurve,
) -> RnsHybridCurveOps:
    return RnsHybridCurveOps(curve, backend="rns")


def rns_accumulate_columns(curve, px, py, qinf, head):
    """RNS fused K-step column accumulation. px/py: (K, Kt, R) int32 or
    f32 canonical residues; returns f32 outputs (exact integers)."""
    spec = R.default_spec(curve.field)
    names, fvec, amat, ztab, znorm = _tables(spec)
    K, Rl = px.shape[0], px.shape[-1]
    call = _rns_column_call(curve, K, Rl)
    return call(
        jnp.asarray(fvec),
        jnp.asarray(amat),
        jnp.asarray(ztab),
        jnp.asarray(znorm),
        px.astype(jnp.float32),
        py.astype(jnp.float32),
        qinf.astype(jnp.int32),
        head.astype(jnp.int32),
    )
