"""Residue-number-system (RNS) field arithmetic — the MXU-era field core.

Represents field elements as residue vectors modulo two bases of 12-bit
primes plus a redundant channel, with Bajard-style RNS Montgomery
reduction:

    x  ~  (x·M1 mod p) as residues over B1 ∪ B2 ∪ {m_r}

- multiply: elementwise modular products per channel (float32-exact Barrett
  for 12-bit moduli — products < 2^24 are exact in f32);
- reduction: m = −T·p⁻¹ mod M1 computed residue-wise in B1, extended to
  B2 ∪ {m_r} through a constant (k2+1)×k1 integer matrix **without** the
  α·M1 correction (the overshoot β < k1 only adds β·p to the result — lazy
  bound), then t = (T + m̂·p)/M1 per channel;
- the way back (B2 → B1) must be exact: Shenoy–Kumaresan base extension
  using the redundant channel to recover α exactly.

Why: the limb-serial Montgomery multiply needs ~4.6k VPU ops; RNS needs
~10 per channel (~500 total) plus two constant-matrix multiplies that are
MXU-shaped (int8-decomposable, int32-exact). It also collapses compiled
graph sizes ~50×, fixing the TPU compile-time pain without Pallas.

Bounds: values are integers < C_MAX·p (C_MAX = 2^9 slack for addition
chains between multiplies); a multiply's output is < (k1+2)·p. M1 > 2^17·p
and M2 > 2^10·(k1+2)·p guarantee exactness (see `_check_spec`).

Status: prototype — mul/add/sub/encode/decode + equivalence tests; wiring
into CoordOps/MSM is the round-2 integration.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from manta_tpu import fields

#: integer-value slack budget: values may grow to C_MAX * p between muls
C_MAX = 1 << 12


def _primes_below(bits: int, count: int, skip=()):
    """`count` largest primes below 2^bits, excluding `skip`."""
    import sympy

    out = []
    candidate = (1 << bits) - 1
    while len(out) < count:
        if sympy.isprime(candidate) and candidate not in skip:
            out.append(candidate)
        candidate -= 2
    return out


@dataclasses.dataclass(frozen=True)
class RnsSpec:
    field: fields.FieldSpec
    b1: Tuple[int, ...]
    b2: Tuple[int, ...]
    m_r: int

    @functools.cached_property
    def M1(self) -> int:
        out = 1
        for m in self.b1:
            out *= m
        return out

    @functools.cached_property
    def M2(self) -> int:
        out = 1
        for m in self.b2:
            out *= m
        return out

    @property
    def k1(self) -> int:
        return len(self.b1)

    @property
    def k2(self) -> int:
        return len(self.b2)

    # -- constant tables (numpy, folded into the compiled program) --

    @functools.cached_property
    def consts(self) -> dict:
        p = self.field.modulus
        b1, b2, m_r = self.b1, self.b2, self.m_r
        M1, M2 = self.M1, self.M2
        all_t = list(b2) + [m_r]
        c = {}
        arr = lambda v: np.asarray(v, dtype=np.int32)
        farr = lambda v: np.asarray(v, dtype=np.float32)
        c["m1"] = arr(b1)
        c["m2"] = arr(b2)
        c["inv_f1"] = farr([1.0 / m for m in b1])
        c["inv_f2"] = farr([1.0 / m for m in b2])
        c["inv_fr"] = np.float32(1.0 / m_r)
        c["neg_p_inv_1"] = arr([(-pow(p, -1, m)) % m for m in b1])
        c["w1"] = arr([pow(M1 // m, -1, m) for m in b1])
        # ext1 matrix: (M1/m1_i) mod m_t for t in B2 ∪ {m_r}
        c["A1"] = arr([[(M1 // mi) % mt for mi in b1] for mt in all_t])
        c["p_2"] = arr([p % m for m in b2])
        c["p_r"] = np.int32(p % m_r)
        c["M1_inv_2"] = arr([pow(M1, -1, m) % m for m in b2])
        c["M1_inv_r"] = np.int32(pow(M1, -1, m_r))
        # ext2 (Shenoy): exact extension of t from B2 to B1
        c["w2"] = arr([pow(M2 // m, -1, m) for m in b2])
        c["A2"] = arr([[(M2 // mj) % mi for mj in b2] for mi in b1])
        c["A2r"] = arr([(M2 // mj) % m_r for mj in b2])
        c["M2_inv_r"] = np.int32(pow(M2, -1, m_r))
        c["M2_mod_1"] = arr([M2 % m for m in b1])
        # sub offsets: residues of 2^k * p for k in 5..9 (added to keep
        # differences nonnegative; the caller picks k >= log2(bound(b)/p))
        for k in range(5, 14):
            c[f"off{k}_1"] = arr([((1 << k) * p) % m for m in b1])
            c[f"off{k}_2"] = arr([((1 << k) * p) % m for m in b2])
            c[f"off{k}_r"] = np.int32(((1 << k) * p) % m_r)
        return c


def _check_spec(spec: RnsSpec):
    p = spec.field.modulus
    assert spec.M1 > (1 << 25) * p, "M1 too small for the lazy bounds"
    assert spec.M2 > 4 * (spec.k1 + 2) * C_MAX * p, "M2 too small"
    assert spec.m_r > spec.k2 + 2, "redundant modulus must exceed k2"
    mods = list(spec.b1) + list(spec.b2) + [spec.m_r]
    assert len(set(mods)) == len(mods), "moduli must be distinct"
    for m in mods:
        assert m < (1 << 12), "12-bit moduli required for f32-exact Barrett"


@functools.lru_cache(maxsize=None)
def default_spec(field: fields.FieldSpec) -> RnsSpec:
    bits_needed_1 = field.bits + 18
    bits_needed_2 = field.bits + 16
    k1 = (bits_needed_1 + 11) // 11  # conservative: primes are ~2^12
    k2 = (bits_needed_2 + 11) // 11
    b1 = _primes_below(12, k1)
    b2 = _primes_below(12, k2, skip=set(b1))
    m_r = _primes_below(12, 1, skip=set(b1) | set(b2))[0]
    spec = RnsSpec(field=field, b1=tuple(b1), b2=tuple(b2), m_r=m_r)
    _check_spec(spec)
    return spec


# ---------------------------------------------------------------------------
# Host encode/decode
# ---------------------------------------------------------------------------


def encode_ints(spec: RnsSpec, values) -> tuple:
    """Canonical ints -> (B1 (k1,N), B2 (k2,N), r (N,)) int32 residues of
    x·M1 mod p (Montgomery w.r.t. M1)."""
    p = spec.field.modulus
    vals = [(v % p) * spec.M1 % p for v in values]
    b1 = np.asarray(
        [[v % m for v in vals] for m in spec.b1], dtype=np.int32
    )
    b2 = np.asarray(
        [[v % m for v in vals] for m in spec.b2], dtype=np.int32
    )
    r = np.asarray([v % spec.m_r for v in vals], dtype=np.int32)
    return b1, b2, r


def decode_ints(spec: RnsSpec, rep) -> list:
    """Residues -> canonical ints (CRT over B1; values must be < M1)."""
    b1 = np.asarray(jax.device_get(rep[0]), dtype=np.int64)
    p = spec.field.modulus
    M1 = spec.M1
    M1_inv = pow(M1, -1, p)
    out = []
    crt_w = [
        (M1 // m) * pow(M1 // m, -1, m) % M1 for m in spec.b1
    ]
    for n in range(b1.shape[1]):
        v = 0
        for i, m in enumerate(spec.b1):
            v = (v + int(b1[i, n]) * crt_w[i]) % M1
        out.append(v % p * M1_inv % p)
    return out


# ---------------------------------------------------------------------------
# Channel-wise modular primitives (f32-exact Barrett for 12-bit moduli)
# ---------------------------------------------------------------------------


def _mod_small(x, m, inv_f):
    """x (int32, |x| < 2^24) mod m via float reciprocal + correction."""
    q = jnp.floor(x.astype(jnp.float32) * inv_f).astype(jnp.int32)
    r = x - q * m
    r = jnp.where(r < 0, r + m, r)
    r = jnp.where(r >= m, r - m, r)
    return r


def _modmul(x, y, m, inv_f):
    return _mod_small(x * y, m, inv_f)


def _cols(c, key, extra_dims):
    """Reshape a per-channel constant (k,) to broadcast over batch dims."""
    v = jnp.asarray(c[key])
    return v.reshape(v.shape + (1,) * extra_dims)


# ---------------------------------------------------------------------------
# Core ops. Representation: (b1, b2, r) with shapes (k1, N), (k2, N), (N,).
# ---------------------------------------------------------------------------


def add(spec: RnsSpec, a, b):
    c = spec.consts
    nd = a[0].ndim - 1
    m1 = _cols(c, "m1", nd)
    m2 = _cols(c, "m2", nd)
    o1 = a[0] + b[0]
    o2 = a[1] + b[1]
    orr = a[2] + b[2]
    return (
        jnp.where(o1 >= m1, o1 - m1, o1),
        jnp.where(o2 >= m2, o2 - m2, o2),
        jnp.where(orr >= spec.m_r, orr - spec.m_r, orr),
    )


def sub(spec: RnsSpec, a, b, k_bound: int = 5):
    """a - b + 2^k_bound·p: keeps the represented integer nonnegative given
    bound(b) <= 2^k_bound·p; the result bound grows to bound(a) + 2^k_bound·p.
    Callers must keep all values below C_MAX·p between muls (a post-mul
    value is < (k1+2)·p < 2^5·p, leaving 4 doubling steps of headroom)."""
    c = spec.consts
    nd = a[0].ndim - 1
    o1 = _mod_small(
        a[0] - b[0] + _cols(c, f"off{k_bound}_1", nd),
        _cols(c, "m1", nd),
        _cols(c, "inv_f1", nd),
    )
    o2 = _mod_small(
        a[1] - b[1] + _cols(c, f"off{k_bound}_2", nd),
        _cols(c, "m2", nd),
        _cols(c, "inv_f2", nd),
    )
    orr = _mod_small(
        a[2] - b[2] + jnp.int32(c[f"off{k_bound}_r"]),
        jnp.int32(spec.m_r),
        jnp.float32(c["inv_fr"]),
    )
    return (o1, o2, orr)


def mul(spec: RnsSpec, a, b):
    """RNS Montgomery product: represents (A·B)·M1^{-1} mod p (+ small
    multiples of p within the lazy bound)."""
    c = spec.consts
    nd = a[0].ndim - 1
    m1 = _cols(c, "m1", nd)
    m2 = _cols(c, "m2", nd)
    if1 = _cols(c, "inv_f1", nd)
    if2 = _cols(c, "inv_f2", nd)
    m_r = jnp.int32(spec.m_r)
    ifr = jnp.float32(c["inv_fr"])

    t1 = _modmul(a[0], b[0], m1, if1)
    t2 = _modmul(a[1], b[1], m2, if2)
    tr = _modmul(a[2], b[2], m_r, ifr)

    # m = -T p^-1 mod M1, channel-wise in B1; sigma for the CRT sum
    m_res = _modmul(t1, _cols(c, "neg_p_inv_1", nd), m1, if1)
    sigma = _modmul(m_res, _cols(c, "w1", nd), m1, if1)

    # ext1 (approximate, no alpha subtraction): S_t = sum_i A1[t,i] sigma_i
    # values: k1 terms of (2^12 * 2^12) -> < k1 * 2^24 < 2^29 (int32 exact)
    flat = sigma.reshape(spec.k1, -1)
    S = _const_matmul(c["A1"], flat).reshape(
        (spec.k2 + 1,) + sigma.shape[1:]
    )
    mhat2 = _mod_big(S[: spec.k2], m2, if2)
    mhat_r = _mod_big(S[spec.k2], m_r, ifr)

    # t = (T + mhat*p) / M1 per channel of B2 ∪ {m_r}
    u2 = t2 + _modmul(mhat2, _cols(c, "p_2", nd), m2, if2)
    u2 = jnp.where(u2 >= m2, u2 - m2, u2)
    out2 = _modmul(u2, _cols(c, "M1_inv_2", nd), m2, if2)
    ur = tr + _modmul(mhat_r, jnp.int32(c["p_r"]), m_r, ifr)
    ur = jnp.where(ur >= m_r, ur - m_r, ur)
    out_r = _modmul(ur, jnp.int32(c["M1_inv_r"]), m_r, ifr)

    # ext2 (exact Shenoy via redundant channel): t back into B1
    sigma2 = _modmul(out2, _cols(c, "w2", nd), m2, if2)
    flat2 = sigma2.reshape(spec.k2, -1)
    S2 = _const_matmul(c["A2"], flat2).reshape(
        (spec.k1,) + sigma2.shape[1:]
    )
    S2r = _const_matmul(
        np.asarray(c["A2r"]).reshape(1, spec.k2), flat2
    ).reshape(sigma2.shape[1:])
    s2r_mod = _mod_big(S2r, m_r, ifr)
    diff = s2r_mod - out_r
    diff = jnp.where(diff < 0, diff + m_r, diff)
    alpha = _modmul(diff, jnp.int32(c["M2_inv_r"]), m_r, ifr)  # < k2 exact
    corr = _modmul(alpha, _cols(c, "M2_mod_1", nd), m1, if1)
    out1 = _mod_big(S2, m1, if1) - corr
    out1 = jnp.where(out1 < 0, out1 + m1, out1)
    return (out1, out2, out_r)


def _mod_big(x, m, inv_f):
    """x (int32, < 2^29) mod m: two-step Barrett (first fold into < 2^24,
    then the exact f32 step)."""
    # step 1: approximate quotient with f32 on the high part
    q = jnp.floor(x.astype(jnp.float32) * inv_f).astype(jnp.int32)
    r = x - q * m
    r = jnp.where(r < 0, r + m, r)
    r = jnp.where(r >= m, r - m, r)
    r = jnp.where(r >= m, r - m, r)
    return r


def _const_matmul(mat: np.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Exact (rows, k) @ (k, N) integer matmul with entries < 2^12 and
    k < 64, via four int8 MXU matmuls (6-bit digit decomposition):
    products < 2^12, row sums < 64·2^12 = 2^18 — int32-exact. TPUs have no
    native int32 matmul; this is the MXU-exact formulation."""
    mat = np.asarray(mat, dtype=np.int32)
    m_lo = (mat & 63).astype(np.int8)
    m_hi = (mat >> 6).astype(np.int8)
    x_lo = (x & 63).astype(jnp.int8)
    x_hi = (x >> 6).astype(jnp.int8)

    def mm(a_np, b):
        return jnp.matmul(
            jnp.asarray(a_np), b, preferred_element_type=jnp.int32
        )

    s_ll = mm(m_lo, x_lo)
    s_lh = mm(m_lo, x_hi)
    s_hl = mm(m_hi, x_lo)
    s_hh = mm(m_hi, x_hi)
    return s_ll + ((s_lh + s_hl) << 6) + (s_hh << 12)


# jitted entry points
mul_jit = jax.jit(mul, static_argnums=0)
add_jit = jax.jit(add, static_argnums=0)
sub_jit = jax.jit(sub, static_argnums=(0, 3))


# ---------------------------------------------------------------------------
# Packed single-array representation + CoordOps-compatible backend
#
# For the curve/MSM layers a coordinate batch must be ONE array so the
# generic gather/scatter/flip/scan plumbing applies: channels-major
# (K, ...) = (k1 + k2 + 1, ...) int32, mirroring the limb-major layout.
# ---------------------------------------------------------------------------


def pack(spec: RnsSpec, rep) -> jnp.ndarray:
    b1, b2, r = rep
    return jnp.concatenate(
        [jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(r)[None]], axis=0
    )


def unpack(spec: RnsSpec, arr):
    return (
        arr[: spec.k1],
        arr[spec.k1 : spec.k1 + spec.k2],
        arr[spec.k1 + spec.k2],
    )


def _renorm(spec: RnsSpec, rep):
    """Montgomery-multiply by enc(1): value becomes < (k1+2)p while staying
    in the same representation — the bound reset after raw adds/subs."""
    one = _one_rep_cached(spec)
    nd = rep[0].ndim - 1
    one_b = tuple(
        jnp.asarray(x).reshape(x.shape + (1,) * nd) for x in one
    )
    return mul(spec, rep, one_b)


@functools.lru_cache(maxsize=None)
def _one_rep_cached(spec: RnsSpec):
    b1, b2, r = encode_ints(spec, [1])
    return (b1[:, 0], b2[:, 0], r[0])


@functools.lru_cache(maxsize=None)
def _zero_class_table(spec: RnsSpec) -> np.ndarray:
    """Residue vectors of k·p for k in [0, k1+2): the lazy zero classes,
    packed (k1+2, K)."""
    p = spec.field.modulus
    rows = []
    for k in range(spec.k1 + 2):
        v = k * p
        rows.append(
            [v % m for m in spec.b1]
            + [v % m for m in spec.b2]
            + [v % spec.m_r]
        )
    return np.asarray(rows, dtype=np.int32)


class RnsCoordOps:
    """CoordOps-compatible field backend over packed RNS arrays (K, ...).

    Policy: every add/sub/double/triple renormalizes (one extra Montgomery
    multiply) so values stay < (k1+2)·p and the lazy-bound budget can never
    overflow regardless of formula shape. Bound-annotated formulas can drop
    most renorms later.
    """

    def __init__(self, field: fields.FieldSpec):
        self.field = field
        self.spec = default_spec(field)

    # -- packing helpers --
    def _u(self, a):
        return unpack(self.spec, a)

    def _p(self, rep):
        s = self.spec
        return jnp.concatenate(
            [rep[0], rep[1], rep[2][None]], axis=0
        )

    def add(self, a, b):
        return packed_renorm(self.spec, packed_add(self.spec, a, b))

    def sub(self, a, b):
        return packed_renorm(self.spec, packed_sub_k(self.spec, a, b, 6))

    def neg(self, a):
        return packed_renorm(
            self.spec, packed_sub_k(self.spec, jnp.zeros_like(a), a, 6)
        )

    def mul(self, a, b):
        return packed_mul(self.spec, a, b)

    def sqr(self, a):
        return self.mul(a, a)

    def double(self, a):
        return self.add(a, a)

    def triple(self, a):
        return self.add(self.add(a, a), a)

    def add_raw(self, a, b):
        """Residue add without renormalization (integer bound = sum of
        operand bounds; caller tracks the ≤ C_MAX·p budget)."""
        return packed_add(self.spec, a, b)

    def sub_k(self, a, b, k: int):
        """Raw subtraction with a 2^k·p offset (requires bound(b) ≤ 2^k·p);
        result bound = bound(a) + 2^k·p."""
        return packed_sub_k(self.spec, a, b, k)

    def double_raw(self, a):
        return self.add_raw(a, a)

    def is_zero(self, a):
        """value ≡ 0 mod p ⇔ residues match one of the k·p zero classes.
        Renormalizes first so ANY in-budget bound collapses to < (k1+2)p."""
        a = packed_renorm(self.spec, a)
        table = jnp.asarray(_zero_class_table(self.spec))
        nd = a.ndim - 1

        def body(k, acc):
            row = jax.lax.dynamic_index_in_dim(table, k, 0, keepdims=False)
            row = row.reshape(row.shape + (1,) * nd)
            return jnp.logical_or(acc, jnp.all(a == row, axis=0))

        init = jnp.zeros(a.shape[1:], jnp.bool_)
        return jax.lax.fori_loop(0, table.shape[0], body, init)

    def eq(self, a, b):
        return self.is_zero(self.sub(a, b))

    def select(self, mask, a, b):
        return jnp.where(mask[None, ...], a, b)

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        one = _one_rep_cached(self.spec)
        packed = np.concatenate(
            [one[0], one[1], np.asarray([one[2]])]
        ).astype(np.int32)
        return jnp.broadcast_to(
            jnp.asarray(packed).reshape((-1,) + (1,) * (a.ndim - 1)), a.shape
        ).astype(jnp.int32)

    def inv(self, a):
        """Fermat inverse (a^(p-2)); zero maps to zero."""
        e = self.field.modulus - 2
        nbits = e.bit_length()
        bits = jnp.asarray(
            [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], jnp.int32
        )

        def body(i, acc):
            acc = self.mul(acc, acc)
            with_mul = self.mul(acc, a)
            return jnp.where(bits[i] != 0, with_mul, acc)

        return jax.lax.fori_loop(1, nbits, body, a)

    def batch_inv(self, a):
        """Elementwise inverse along the last axis; zeros map to zero.
        Fermat per-lane (cheap in RNS: ~700 muls of the full batch is still
        fast; the Montgomery-trick scan can replace this later)."""
        nz = jnp.logical_not(self.is_zero(a))
        one = self.one_like(a)
        safe = jnp.where(nz[None, ...], a, one)
        out = self.inv(safe)
        return jnp.where(nz[None, ...], out, jnp.zeros_like(out))

    # -- host conversions --
    def encode(self, values, montgomery=True):
        rep = encode_ints(self.spec, values)
        return np.concatenate(
            [rep[0], rep[1], rep[2][None]], axis=0
        ).astype(np.int32)

    def decode(self, arr, montgomery=True):
        arr = np.asarray(jax.device_get(arr))
        flat = arr.reshape(arr.shape[0], -1)
        rep = (
            flat[: self.spec.k1],
            flat[self.spec.k1 : self.spec.k1 + self.spec.k2],
            flat[self.spec.k1 + self.spec.k2],
        )
        return decode_ints(self.spec, rep)


class RnsFq2CoordOps:
    """Fq[u]/(u^2+1) over stacked (2, Kt, ...) packed RNS arrays — the
    XLA-level extension-field backend (G2 curves). Mirrors the limb
    `Fq2Ops`; per-component ops delegate to `RnsCoordOps` (renormalizing
    policy, used for the low-rate plumbing around fused kernels)."""

    def __init__(self, field: fields.FieldSpec):
        self.field = field
        self.base = RnsCoordOps(field)
        self.spec = self.base.spec

    def _map2(self, fn, *arrs):
        return jnp.stack(
            [fn(*(a[0] for a in arrs)), fn(*(a[1] for a in arrs))]
        )

    def mul(self, a, b):
        base = self.base
        t0 = base.mul(a[0], b[0])
        t1 = base.mul(a[1], b[1])
        c0 = packed_renorm(self.spec, packed_sub_k(self.spec, t0, t1, 6))
        c1 = base.add(base.mul(a[0], b[1]), base.mul(a[1], b[0]))
        return jnp.stack([c0, c1])

    def sqr(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        return self._map2(self.base.add, a, b)

    def sub(self, a, b):
        # component bounds reach 2^7·p (unrenormalized Fq2 mul c1): use a
        # 2^7 offset where the base field uses 2^6
        return self._map2(
            lambda x, y: packed_renorm(
                self.spec, packed_sub_k(self.spec, x, y, 7)
            ),
            a,
            b,
        )

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    def double(self, a):
        return self.add(a, a)

    def triple(self, a):
        return self.add(self.add(a, a), a)

    # -- raw (bound-annotated) variants: component bounds run one bit
    # wider than the base field (schoolbook Fq2 mul <= 2^7·p), so every
    # requested sub_k offset shifts +1 --

    def add_raw(self, a, b):
        return self._map2(self.base.add_raw, a, b)

    def double_raw(self, a):
        return self.add_raw(a, a)

    def sub_k(self, a, b, k: int):
        return self._map2(lambda x, y: self.base.sub_k(x, y, k + 1), a, b)

    def is_zero(self, a):
        return jnp.logical_and(
            self.base.is_zero(a[0]), self.base.is_zero(a[1])
        )

    def eq(self, a, b):
        return jnp.logical_and(
            self.base.eq(a[0], b[0]), self.base.eq(a[1], b[1])
        )

    def select(self, mask, a, b):
        return jnp.where(mask[None, None, ...], a, b)

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        return jnp.stack(
            [self.base.one_like(a[0]), jnp.zeros_like(a[1])]
        )

    def batch_inv(self, a):
        # (a0 + a1 u)^-1 = (a0 - a1 u) / (a0^2 + a1^2)
        base = self.base
        norm = base.add(base.sqr(a[0]), base.sqr(a[1]))
        n_inv = base.batch_inv(norm)
        return jnp.stack(
            [base.mul(a[0], n_inv), base.neg(base.mul(a[1], n_inv))]
        )

    def encode(self, values, montgomery=True):
        c0 = self.base.encode([v[0] for v in values], montgomery)
        c1 = self.base.encode([v[1] for v in values], montgomery)
        return np.stack([c0, c1])

    def decode(self, arr, montgomery=True):
        arr = np.asarray(jax.device_get(arr))
        c0 = self.base.decode(arr[0], montgomery)
        c1 = self.base.decode(arr[1], montgomery)
        return list(zip(c0, c1))


# ---------------------------------------------------------------------------
# Packed-layout ops: everything on the single (K, ...) array — no per-op
# unpack/repack concatenation traffic (the naive tuple wrappers cost more
# HBM bandwidth than the arithmetic itself at MSM scale).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _packed_consts(spec: RnsSpec) -> dict:
    c = spec.consts
    mods = np.concatenate(
        [np.asarray(spec.b1), np.asarray(spec.b2), [spec.m_r]]
    ).astype(np.int32)
    out = {
        "m_all": mods,
        "inv_all": (1.0 / mods).astype(np.float32),
    }
    p = spec.field.modulus
    for k in range(5, 14):
        out[f"off{k}"] = np.asarray(
            [((1 << k) * p) % m for m in mods.tolist()], dtype=np.int32
        )
    one = _one_rep_cached(spec)
    out["one"] = np.concatenate(
        [one[0], one[1], np.asarray([one[2]])]
    ).astype(np.int32)
    return out


def _bc(v: np.ndarray, nd: int):
    a = jnp.asarray(v)
    return a.reshape(a.shape + (1,) * nd)


def packed_add(spec: RnsSpec, a, b):
    pc = _packed_consts(spec)
    m = _bc(pc["m_all"], a.ndim - 1)
    s = a + b
    return jnp.where(s >= m, s - m, s)


def packed_sub_k(spec: RnsSpec, a, b, k: int):
    pc = _packed_consts(spec)
    nd = a.ndim - 1
    return _mod_small(
        a - b + _bc(pc[f"off{k}"], nd), _bc(pc["m_all"], nd), _bc(pc["inv_all"], nd)
    )


def packed_mul(spec: RnsSpec, a, b):
    """RNS Montgomery product directly on packed (K, ...) arrays."""
    pc = _packed_consts(spec)
    c = spec.consts
    nd = a.ndim - 1
    m_all = _bc(pc["m_all"], nd)
    inv_all = _bc(pc["inv_all"], nd)
    k1, k2 = spec.k1, spec.k2

    t_all = _modmul(a, b, m_all, inv_all)  # one fused pass over all channels
    t1 = t_all[:k1]
    t2 = t_all[k1 : k1 + k2]
    tr = t_all[k1 + k2]

    m1 = _cols(c, "m1", nd)
    if1 = _cols(c, "inv_f1", nd)
    m2 = _cols(c, "m2", nd)
    if2 = _cols(c, "inv_f2", nd)
    m_r = jnp.int32(spec.m_r)
    ifr = jnp.float32(c["inv_fr"])

    m_res = _modmul(t1, _cols(c, "neg_p_inv_1", nd), m1, if1)
    sigma = _modmul(m_res, _cols(c, "w1", nd), m1, if1)
    flat = sigma.reshape(k1, -1)
    S = _const_matmul(c["A1"], flat).reshape((k2 + 1,) + sigma.shape[1:])
    mhat2 = _mod_big(S[:k2], m2, if2)
    mhat_r = _mod_big(S[k2], m_r, ifr)

    u2 = t2 + _modmul(mhat2, _cols(c, "p_2", nd), m2, if2)
    u2 = jnp.where(u2 >= m2, u2 - m2, u2)
    out2 = _modmul(u2, _cols(c, "M1_inv_2", nd), m2, if2)
    ur = tr + _modmul(mhat_r, jnp.int32(c["p_r"]), m_r, ifr)
    ur = jnp.where(ur >= m_r, ur - m_r, ur)
    out_r = _modmul(ur, jnp.int32(c["M1_inv_r"]), m_r, ifr)

    sigma2 = _modmul(out2, _cols(c, "w2", nd), m2, if2)
    flat2 = sigma2.reshape(k2, -1)
    S2 = _const_matmul(c["A2"], flat2).reshape((k1,) + sigma2.shape[1:])
    S2r = _const_matmul(
        np.asarray(c["A2r"]).reshape(1, k2), flat2
    ).reshape(sigma2.shape[1:])
    s2r_mod = _mod_big(S2r, m_r, ifr)
    diff = s2r_mod - out_r
    diff = jnp.where(diff < 0, diff + m_r, diff)
    alpha = _modmul(diff, jnp.int32(c["M2_inv_r"]), m_r, ifr)
    corr = _modmul(alpha, _cols(c, "M2_mod_1", nd), m1, if1)
    out1 = _mod_big(S2, m1, if1) - corr
    out1 = jnp.where(out1 < 0, out1 + m1, out1)
    return jnp.concatenate([out1, out2, out_r[None]], axis=0)


def packed_renorm(spec: RnsSpec, a):
    pc = _packed_consts(spec)
    one = _bc(pc["one"], a.ndim - 1)
    return packed_mul(spec, a, jnp.broadcast_to(one, a.shape).astype(jnp.int32))
