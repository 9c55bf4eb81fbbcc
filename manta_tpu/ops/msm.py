"""Pippenger multi-scalar multiplication on device.

TPU-first design (replaces `ark_ec::msm` used by the reference's Groth16
prover, see SURVEY.md §2.9#3): everything is lane-parallel vector work with
no data-dependent control flow —

1. **Windows**: c-bit windows (any c <= 16; signed recoding halves the
   bucket count and trims the window count to ceil(bits/c)).
2. **Bucket accumulation** per window — *sequential-column segmented
   reduce*: group point indices by digit (ONE `lax.sort_key_val` batched
   over all windows — the sort unit pipelines batch rows, 3ms/window
   amortized at 2^20); lane j owns
   the contiguous sorted chunk [jK, (j+1)K); the whole K-step column loop
   runs as ONE Pallas kernel (mixed adds on the affine sorted-point
   stream, accumulator restarting at digit boundaries). Run-end positions
   are located with 1-row index math and only those <= num_buckets stream
   values are gathered and scattered into buckets (TPU gathers/scatters
   cost ~1 element/cycle, so ELEMENT count is what matters — the sorted
   point gather also moves x||y packed two-limbs-per-u32). Buckets
   spanning several chunks leave per-chunk trailing partials — an R-sized
   problem folded with one segmented scan and a second unique scatter.
   Cost: n mixed adds + O(R).
3. **Bucket reduction**: sum_b b·S_b via the split-index identity
   b = 2^c2·h + l  =>  2^c2·sum_h h·R_h + sum_l l·C_l with
   R_h/C_l row/column sums of the (2^c1, 2^c2) bucket matrix — two
   pairwise tree reductions (~2·2^c adds) plus two tiny weighted sums
   (suffix scans over 2^c1 and 2^c2 lanes), instead of a 2^c-lane scan.
   The reduction is dispatch-bound (~50 small kernel launches), so it
   runs ONCE over all windows as a batch axis (buckets stored per window
   inside the rolled window loop).
4. **Window combine**: Horner over windows (c doublings per window), inside
   a fori_loop so the compiled graph holds ONE copy of the window pipeline.

The N-point workload is embarrassingly parallel across chips: shard points
and scalars along N, run this kernel per shard, tree-add the per-device
partial results (see `manta_tpu.parallel.msm_sharded`).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from manta_tpu import fields
from manta_tpu.ops import curve as C
from manta_tpu.ops.curve import JacobianPoint
from manta_tpu.ops import scan as S

DEFAULT_WINDOW_BITS = 13
DEFAULT_COLUMN_STEPS = 128


def window_digits(scalars: jnp.ndarray, window_bits: int) -> jnp.ndarray:
    """(S_L, N) 16-bit limbs -> (W, N) c-bit window digits, little-endian.

    Window w covers scalar bits [w*c, (w+1)*c); c need not divide the limb
    width (digits straddling a limb boundary combine two limbs)."""
    assert 1 <= window_bits <= fields.LIMB_BITS
    num_limbs = scalars.shape[0]
    total_bits = num_limbs * fields.LIMB_BITS
    num_windows = -(-total_bits // window_bits)
    mask = jnp.uint32((1 << window_bits) - 1)
    rows = []
    for w in range(num_windows):
        start = w * window_bits
        i, sh = divmod(start, fields.LIMB_BITS)
        d = scalars[i] >> jnp.uint32(sh)
        if sh + window_bits > fields.LIMB_BITS and i + 1 < num_limbs:
            d = d | (scalars[i + 1] << jnp.uint32(fields.LIMB_BITS - sh))
        rows.append(d & mask)
    return jnp.stack(rows)


def _fused(cops: C.CurveOps) -> bool:
    """Fused-kernel backend: whole point formulas (and the column loop) run
    as single Pallas kernels (`manta_tpu.ops.pallas.point_kernels`)."""
    return hasattr(cops, "run_columns") and getattr(
        cops, "column_kernel_ok", lambda: True
    )()


def window_digits_signed(
    scalars: jnp.ndarray, window_bits: int, scalar_bits: int = 0
):
    """Signed window recoding: (|digit|, negate) per window.

    Digits lie in [-(2^(c-1)-1), 2^(c-1)]: a raw digit u > 2^(c-1) becomes
    u - 2^c with a carry into the next window, so bucket count drops from
    2^c to 2^(c-1)+1 and window count from ceil(272/c) to ceil(bits/c)
    (the array's zero top windows are trimmed via `scalar_bits`). The top
    retained window's raw digit is < 2^(c-1) for every supported field, so
    the final carry never overflows (asserted).
    """
    raw = window_digits(scalars, window_bits)
    if scalar_bits:
        # +1 bit of room so the top window's outgoing carry (possible when
        # window_bits divides scalar_bits) lands inside the retained range
        num_windows = -(-(scalar_bits + 1) // window_bits)
        assert num_windows <= raw.shape[0]
        raw = raw[:num_windows]
    half = jnp.uint32(1 << (window_bits - 1))
    full = jnp.uint32(1 << window_bits)

    def step(carry, u):
        u2 = u + carry
        neg = u2 > half
        d = jnp.where(neg, full - u2, u2)
        return neg.astype(jnp.uint32), (d, neg)

    carry, (digits, negs) = jax.lax.scan(
        step, jnp.zeros_like(raw[0]), raw
    )
    return digits, negs, carry


# ---------------------------------------------------------------------------
# GLV endomorphism decomposition (BLS12-381 G1)
#
# phi(x, y) = (beta*x, y) acts as multiplication by lambda (a primitive
# cube root of unity mod r), so sum k_i P_i becomes a 2N-point MSM with
# HALF-LENGTH scalars: k = k1 + k2*lambda, |k1|, |k2| < 2^127 via Babai
# rounding against the lattice basis (lambda, -1), (1, z^2) whose
# determinant is exactly r (z = BLS parameter). Half the windows means
# half the Horner doublings, bucket reductions, and per-window fixed
# costs. Matches the arkworks scalar-mul path benched at
# `manta-benchmark/benches/ecc.rs:80-90`.
# ---------------------------------------------------------------------------

_BLS_Z = -0xD201000000010000
#: beta with (beta*x, y) == lambda * (x, y); the OTHER cube root pairs
#: with lambda^2 (checked at import below)
GLV_BETA_BLS12_381 = int(
    "0x1a0111ea397fe699ec02408663d4de85aa0d857d89759ad4897d29650fb85f"
    "9b409427eb4f49fffd8bfd00000000aaac",
    16,
)
GLV_SCALAR_BITS = 127


def _glv_constants(curve):
    r = curve.scalar_field.modulus
    p = curve.field.modulus
    lam = (_BLS_Z * _BLS_Z - 1) % r
    assert (lam * lam + lam + 1) % r == 0
    beta = GLV_BETA_BLS12_381
    assert (beta * beta % p * beta) % p == 1 and beta != 1
    return lam, beta, _BLS_Z * _BLS_Z


def _words4(v: int) -> np.ndarray:
    return np.array(
        [(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)],
        dtype=np.uint64,
    )


def glv_decompose(curve, scalars_np) -> tuple:
    """Host decomposition: (S_L, N) canonical limbs -> (abs2 (S_L, 2N)
    canonical limbs, neg2 (2N,) uint8) with lanes [0,N) = |k1| on P and
    [N,2N) = |k2| on phi(P). Uses the C batch kernel
    (`manta_tpu/native/glv.c`) when a compiler is available — ~200x the
    Python loop, so the decomposition stays inside timed MSM regions."""
    lam, _, z2 = _glv_constants(curve)
    r = curve.scalar_field.modulus
    L, n = scalars_np.shape

    from manta_tpu import native

    lib = native.glv_lib()
    if lib is not None:
        import ctypes

        # (L, n) 16-bit limbs -> (n, 4) LE u64 words: one u16 cast + one
        # transpose copy, then a zero-copy view (scalars < r < 2^256)
        sc16 = np.zeros((16, n), dtype=np.uint16)
        sc16[: min(L, 16)] = scalars_np[: min(L, 16)].astype(np.uint16)
        words = np.ascontiguousarray(sc16.T).view("<u8")
        mu = np.array(
            [
                ((1 << 576) // r >> (64 * i)) & 0xFFFFFFFFFFFFFFFF
                for i in range(6)
            ],
            dtype=np.uint64,
        )
        consts = [
            _words4(r), _words4(r // 2), mu, _words4(z2), _words4(lam)
        ]
        k_abs = np.zeros((2 * n, 2), dtype=np.uint64)
        neg2 = np.zeros(2 * n, dtype=np.uint8)
        lib.glv_decompose_batch(
            words.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_long(n),
            *[c.ctypes.data_as(ctypes.c_void_p) for c in consts],
            k_abs.ctypes.data_as(ctypes.c_void_p),
            neg2.ctypes.data_as(ctypes.c_void_p),
        )
        abs2 = np.zeros((L, 2 * n), dtype=np.uint32)
        abs2[:8] = (
            np.ascontiguousarray(k_abs).view("<u2")
            .reshape(2 * n, 8)
            .T
        )
        return abs2, neg2
    # limbs -> python ints via one bytes round-trip per scalar
    le16 = np.ascontiguousarray(
        scalars_np.astype(np.uint16).T
    ).tobytes()  # scalar-major, 2 bytes per limb
    stride = 2 * L
    half_r = r // 2
    neg2 = np.zeros(2 * n, dtype=np.uint8)
    buf = bytearray(2 * n * 16)  # |k1|/|k2| < 2^127: 16 LE bytes each
    for i in range(n):
        k = int.from_bytes(le16[i * stride : (i + 1) * stride], "little")
        c1 = (k * z2 + half_r) // r
        c2 = (k + half_r) // r
        k2 = c1 - c2 * z2
        k1 = k - c1 * lam - c2
        if k1 < 0:
            neg2[i] = 1
            k1 = -k1
        if k2 < 0:
            neg2[n + i] = 1
            k2 = -k2
        buf[i * 16 : (i + 1) * 16] = k1.to_bytes(16, "little")
        buf[(n + i) * 16 : (n + i + 1) * 16] = k2.to_bytes(16, "little")
    abs2 = np.zeros((L, 2 * n), dtype=np.uint32)
    abs2[:8] = (
        np.frombuffer(bytes(buf), dtype="<u2").reshape(2 * n, 8).T
    )
    return abs2, neg2


def glv_prepare_points(cops: C.CurveOps, points: JacobianPoint, neg2) -> JacobianPoint:
    """Device-side point doubling-up: [P..., phi(P)...] with the per-lane
    scalar signs folded into the y coordinates."""
    _, beta, _ = _glv_constants(cops.curve)
    # split-representation backends keep affine inputs limb-encoded:
    # point_ops is the op set matching `encode_points` output
    o = getattr(cops, "point_ops", None) or cops.ops
    spec = cops.curve.field
    from manta_tpu.ops import field_ops as F

    beta_m = jnp.asarray(
        np.broadcast_to(
            np.asarray(F.encode_ints(spec, [beta])), (spec.num_limbs, 1)
        )
    )
    x_phi = o.mul(points.x, beta_m)
    x2 = jnp.concatenate([points.x, x_phi], axis=-1)
    y2 = jnp.concatenate([points.y, points.y], axis=-1)
    z2 = jnp.concatenate([points.z, points.z], axis=-1)
    neg_mask = jnp.asarray(neg2) != 0
    y2 = o.select(neg_mask, o.neg(y2), y2)
    return JacobianPoint(x2, y2, z2)


def _msm_glv_device(
    cops, abs2, neg2, px, py, pz, window_bits, column_steps
):
    pts2 = glv_prepare_points(cops, JacobianPoint(px, py, pz), neg2)
    return msm(
        cops,
        abs2,
        pts2,
        window_bits,
        False,
        column_steps,
        GLV_SCALAR_BITS,
        True,
    )


#: single-program device half (phi/sign prep + 2N-point MSM): eager ops
#: would each be their own remote compile on the axon relay
msm_glv_device = jax.jit(_msm_glv_device, static_argnums=(0, 6, 7))


def msm_glv(
    cops: C.CurveOps,
    scalars_np,
    points: JacobianPoint,
    window_bits: int = DEFAULT_WINDOW_BITS,
    column_steps: int = DEFAULT_COLUMN_STEPS,
):
    """GLV-decomposed MSM: host decomposition (C batch kernel) + one
    device program (phi points + 2N-lane MSM with 127-bit scalars: 8
    windows at c=16 instead of 16)."""
    abs2, neg2 = glv_decompose(cops.curve, np.asarray(scalars_np))
    return msm_glv_device(
        cops,
        jnp.asarray(abs2),
        jnp.asarray(neg2),
        points.x,
        points.y,
        points.z,
        window_bits,
        column_steps,
    )


def _tree_reduce_last(cops: C.CurveOps, pts: JacobianPoint) -> JacobianPoint:
    """Pairwise-halving sum over the (power-of-two) trailing axis -> length 1.

    With the fused backend each add is ONE pallas_call, so the graph-size
    motivation for the rolled (shape-constant) variant disappears — and
    pairwise does ~2n lane-adds total vs the rolled log2(n)·n."""
    n = pts.x.shape[-1]
    if not _fused(cops) and n > 1:
        return _tree_reduce_rolled(cops, pts)
    while n > 1:
        assert n % 2 == 0
        half = n // 2
        lo = JacobianPoint(
            pts.x[..., :half], pts.y[..., :half], pts.z[..., :half]
        )
        hi = JacobianPoint(
            pts.x[..., half:], pts.y[..., half:], pts.z[..., half:]
        )
        pts = cops.add(lo, hi)
        n = half
    return pts


def _tree_reduce_rolled(cops: C.CurveOps, pts: JacobianPoint) -> JacobianPoint:
    """Shape-constant halving reduction: log2(n) rounds of one full-width
    add of the array with itself rolled left by n/2^(t+1).

    Lanes >= half become garbage after round t but are never read again
    (round t+1 only consumes lanes < half/2); the compiled graph holds ONE
    copy of the addition kernel instead of log2(n). The extra lanes of
    arithmetic are noise next to the bucket-accumulation cost."""
    n = pts.x.shape[-1]
    assert n & (n - 1) == 0
    rounds = n.bit_length() - 1

    def body(t, carry):
        p = JacobianPoint(*carry)
        half = jnp.int32(n) >> (t + 1)

        def roll(a):
            return jnp.roll(a, -half, axis=-1)

        s = cops.add(p, JacobianPoint(roll(p.x), roll(p.y), roll(p.z)))
        return tuple(s)

    out = jax.lax.fori_loop(0, rounds, body, tuple(pts))
    return JacobianPoint(
        out[0][..., :1], out[1][..., :1], out[2][..., :1]
    )


def _weighted_linear(cops: C.CurveOps, buckets: JacobianPoint) -> JacobianPoint:
    """sum_{b>=1} b*S_b = sum_{b>=1} suffix[b], suffix[b] = sum_{b'>=b} S_b'."""
    # zero out bucket 0 so it contributes to no suffix
    lane0 = jnp.zeros((buckets.x.shape[-1],), jnp.bool_).at[0].set(True)
    inf = cops.infinity_like(buckets)
    o = cops.ops
    b0 = JacobianPoint(
        o.select(lane0, inf.x, buckets.x),
        o.select(lane0, inf.y, buckets.y),
        o.select(lane0, inf.z, buckets.z),
    )
    suffix = S.suffix_scan(cops, b0)
    # suffix[0] duplicates suffix[1]; mask it out, then sum all lanes
    masked = JacobianPoint(
        o.select(lane0, inf.x, suffix.x),
        o.select(lane0, inf.y, suffix.y),
        o.select(lane0, inf.z, suffix.z),
    )
    return S.total_sum(cops, masked)


def _weighted_reduce(
    cops: C.CurveOps, buckets: JacobianPoint, window_bits: int
) -> JacobianPoint:
    """sum_{b>=1} b*S_b over 2^c buckets via b = 2^c2*h + l."""
    c1 = window_bits // 2
    c2 = window_bits - c1
    hi_n, lo_n = 1 << c1, 1 << c2

    def split(a):
        return a.reshape(*a.shape[:-1], hi_n, lo_n)

    def squeeze(p):
        return JacobianPoint(p.x[..., 0], p.y[..., 0], p.z[..., 0])

    mat = JacobianPoint(split(buckets.x), split(buckets.y), split(buckets.z))
    row_sums = squeeze(_tree_reduce_last(cops, mat))  # (..., 2^c1): sum over l
    mat_t = JacobianPoint(
        jnp.swapaxes(mat.x, -1, -2),
        jnp.swapaxes(mat.y, -1, -2),
        jnp.swapaxes(mat.z, -1, -2),
    )
    col_sums = squeeze(_tree_reduce_last(cops, mat_t))  # (..., 2^c2): sum over h
    w_hi = _weighted_linear(cops, row_sums)  # sum_h h*R_h
    w_lo = _weighted_linear(cops, col_sums)  # sum_l l*C_l
    for _ in range(c2):
        w_hi = cops.double(w_hi)
    return cops.add(w_hi, w_lo)


def _weighted_reduce_signed(
    cops: C.CurveOps, buckets: JacobianPoint, window_bits: int
) -> JacobianPoint:
    """Weighted reduce over 2^(c-1)+1 signed-digit buckets: the split-index
    identity on the power-of-two block [0, 2^(c-1)), plus the single
    top-weight bucket folded in with c-1 doublings."""
    half_bits = window_bits - 1

    def split(p, sl):
        return JacobianPoint(p.x[..., sl], p.y[..., sl], p.z[..., sl])

    main = split(buckets, slice(0, 1 << half_bits))
    top = split(buckets, slice(1 << half_bits, (1 << half_bits) + 1))
    acc = _weighted_reduce(cops, main, half_bits)
    top = JacobianPoint(
        *jax.lax.fori_loop(
            0,
            half_bits,
            lambda _, t: tuple(cops.double(JacobianPoint(*t))),
            tuple(top),
        )
    )
    return cops.add(acc, top)


def _fold_partials(
    cops: C.CurveOps,
    acc: JacobianPoint,
    d_t: jnp.ndarray,
    binf: JacobianPoint,
    num_buckets: int,
) -> JacobianPoint:
    """Fold cross-chunk trailing partials into a second bucket batch.

    Chunk j's last run continues into chunk j+1 iff the digit matches across
    the boundary; equal-key (ascending, adjacent) partials fold with one
    segmented scan, group totals scatter at unique slots."""
    o = cops.ops
    lanes = d_t.shape[-1]
    lane_ids = jnp.arange(lanes, dtype=jnp.int32)
    last_d = d_t[-1]
    first_d = d_t[0]
    cont = jnp.concatenate(
        [last_d[:-1] == first_d[1:], jnp.zeros((1,), jnp.bool_)]
    )
    inf_r = cops.infinity_like(acc)
    val = JacobianPoint(
        o.select(cont, acc.x, inf_r.x),
        o.select(cont, acc.y, inf_r.y),
        o.select(cont, acc.z, inf_r.z),
    )
    key = jnp.where(cont, last_d.astype(jnp.int32), jnp.int32(num_buckets))
    heads_b = jnp.concatenate([jnp.ones((1,), jnp.bool_), key[1:] != key[:-1]])
    scanned = S.seg_scan(cops, val, heads_b)
    ends_b = jnp.concatenate([key[1:] != key[:-1], jnp.ones((1,), jnp.bool_)])
    idx_b = jnp.where(ends_b, key, jnp.int32(num_buckets) + lane_ids)
    return JacobianPoint(
        binf.x.at[..., idx_b].set(scanned.x, mode="drop"),
        binf.y.at[..., idx_b].set(scanned.y, mode="drop"),
        binf.z.at[..., idx_b].set(scanned.z, mode="drop"),
    )


def _counting_sort_order(digits: jnp.ndarray, num_keys: int) -> jnp.ndarray:
    """Stable two-pass radix argsort for digit keys in [0, num_keys).

    NO LONGER on the MSM hot path: measured on-chip at 2^20 it is 5x
    SLOWER than `lax.sort_key_val` (142ms vs 25ms — the block one-hot
    histograms move ~0.5GB per pass), and the batched sort amortizes to
    3ms/window. Kept as the dtype-flexible fallback and for its tests.
    """
    n = digits.shape[-1]
    B = 128  # block width: per-block counts fit uint8 (max 128 <= 255)
    assert n % B == 0, f"counting sort needs n % {B} == 0, got {n}"
    nb = n // B
    k_lo = jnp.int32(256)

    def one_pass(key, K, order_in):
        if order_in is not None:
            key = jnp.take(key, order_in)
        kb = key.reshape(nb, B)
        onehot = (
            kb[:, :, None] == jnp.arange(K, dtype=key.dtype)[None, None, :]
        ).astype(jnp.uint8)
        loc = jnp.cumsum(onehot, axis=1, dtype=jnp.uint8)  # (nb, B, K)
        local_rank = jnp.take_along_axis(
            loc, kb[:, :, None].astype(jnp.int32), axis=2
        )[..., 0].astype(jnp.int32) - 1
        block_tot = loc[:, -1, :].astype(jnp.int32)  # (nb, K)
        blk_excl = jnp.cumsum(block_tot, axis=0) - block_tot  # excl over blocks
        key_tot = jnp.sum(block_tot, axis=0)  # (K,)
        key_base = jnp.cumsum(key_tot) - key_tot  # exclusive
        pos = (
            jnp.take(key_base, kb.astype(jnp.int32))
            + jnp.take_along_axis(
                blk_excl, kb.astype(jnp.int32), axis=1
            )
            + local_rank
        ).reshape(-1)
        order_pass = (
            jnp.zeros((n,), jnp.int32)
            .at[pos]
            .set(jnp.arange(n, dtype=jnp.int32))
        )
        if order_in is None:
            return order_pass
        return jnp.take(order_in, order_pass)

    d = digits.astype(jnp.int32)
    if num_keys <= 256:
        return one_pass(d, num_keys, None)
    o1 = one_pass(d & (k_lo - 1), 256, None)
    k2 = ((num_keys - 1) >> 8) + 1
    return one_pass(d >> jnp.int32(8), k2, o1)


def _sorted_layout(
    digits: jnp.ndarray, steps: int, num_keys: int = 0, presorted=None
):
    """Sort digits; return (perm, d_t, head, end) in the chunk-transposed
    (K, R) layout: element [k, j] = sorted[j*K + k].

    `presorted = (order, d_sorted)` skips the sort — the fold path sorts
    ALL windows with one batched `lax.sort_key_val` outside the window
    loop (the TPU sort unit pipelines batch rows: 16x1M batched sort
    measured 51ms vs 16x29ms separate argsorts and 16x142ms counting
    sorts — the counting sort's block one-hot histograms are 5x SLOWER
    than the sort unit at 2^20, round-3 note to the contrary was wrong).
    """
    n = digits.shape[-1]
    lanes = n // steps
    if presorted is not None:
        order, d_sorted = presorted
    else:
        d_sorted, order = jax.lax.sort_key_val(
            digits, jnp.arange(n, dtype=jnp.int32)
        )
    perm = order.reshape(lanes, steps).T.reshape(-1)
    d_t = d_sorted.reshape(lanes, steps).T  # (K, R)
    big = jnp.asarray(jnp.iinfo(d_t.dtype).max, d_t.dtype)
    prev = jnp.concatenate([jnp.full((1, lanes), big, d_t.dtype), d_t[:-1]])
    head = d_t != prev  # run restarts (k==0 or digit change)
    next_last = jnp.concatenate([d_t[0, 1:], jnp.full((1,), big, d_t.dtype)])
    nxt = jnp.concatenate([d_t[1:], next_last[None]])
    end = d_t != nxt  # true segment ends in global sorted order
    return perm, d_t, head, end


def _bucket_template(cops: C.CurveOps, points: JacobianPoint, num_buckets: int):
    def tmpl(a):
        return jnp.zeros((*a.shape[:-1], num_buckets), a.dtype)

    return cops.infinity_like(
        JacobianPoint(tmpl(points.x), tmpl(points.y), tmpl(points.z))
    )


def _run_ends_compact(d_flat, end_flat, num_buckets):
    """Locate global run ends with 1-row index math: returns (pos_c, idx_b)
    where pos_c[s] is the flat stream position of the end of the s-th run
    (clamped) and idx_b[s] its bucket (num_buckets = dropped slot)."""
    KR = d_flat.shape[-1]
    rank = jnp.cumsum(end_flat.astype(jnp.int32))
    slots = jnp.where(end_flat, rank - 1, jnp.int32(num_buckets))
    pos = (
        jnp.full((num_buckets,), KR, jnp.int32)
        .at[slots]
        .set(jnp.arange(KR, dtype=jnp.int32), mode="drop")
    )
    valid = pos < KR
    pos_c = jnp.minimum(pos, KR - 1)
    idx_b = jnp.where(valid, jnp.take(d_flat, pos_c), jnp.int32(num_buckets))
    return pos_c, idx_b


def _bucket_sums_fused(
    cops: C.CurveOps,
    digits: jnp.ndarray,
    points: JacobianPoint,
    num_buckets: int,
    steps: int,
    parts: bool = False,
    presorted=None,
) -> JacobianPoint:
    """Fused-kernel bucket accumulation: the whole K-step column loop runs
    as ONE Pallas kernel emitting the post-step accumulator stream; the
    <= num_buckets run-end values are picked out of the stream and
    scattered to their buckets.

    TPU gathers/scatters cost ~1 element/cycle regardless of row count, so
    the two hot data movements are shaped to minimize ELEMENT count:
    - the sorted point gather moves x||y PACKED two-16-bit-limbs-per-u32
      (half the elements of separate coordinate gathers);
    - run ends are located first with 1-row index arithmetic (cumsum +
      iota scatter), then only those <= num_buckets stream values are
      gathered — never a (K*R)-lane scatter of the full stream (which
      costs ~50ms/window at 2^20; this path is ~7x cheaper).
    """
    n = digits.shape[-1]
    lanes = n // steps
    perm, d_t, head, end = _sorted_layout(
        digits, steps, num_buckets, presorted
    )

    def gather_kt(a):
        taken = jnp.take(a, perm, axis=-1)
        chunked = taken.reshape(*a.shape[:-1], steps, lanes)
        return jnp.moveaxis(chunked, -2, 0)  # (K, *E, R)

    if getattr(cops, "limb16_points", False):
        # G1 limb layout: 16-bit limbs in u32 rows — pack x|y<<16
        packed = points.x | (points.y << jnp.uint32(16))
        g = gather_kt(packed)
        px, py = g & jnp.uint32(0xFFFF), g >> jnp.uint32(16)
    else:
        px, py = gather_kt(points.x), gather_kt(points.y)
    qinf = jnp.take(
        cops.affine_infinity_mask(points).astype(jnp.int32), perm
    ).reshape(steps, lanes)
    ox, oy, oz = cops.run_columns(px, py, qinf, head)

    # bucket template from the column OUTPUT shapes: hybrid backends feed
    # the kernel limb points but emit RNS accumulators
    def tmpl(a):
        return jnp.zeros((*a.shape[1:-1], num_buckets), a.dtype)

    binf = cops.infinity_like(JacobianPoint(tmpl(ox), tmpl(oy), tmpl(oz)))

    # -- run-end compaction (1-row index math, then a small gather) --
    KR = steps * lanes
    end_flat = end.reshape(-1)  # k-major: [k, j] -> k * lanes + j
    d_flat = d_t.astype(jnp.int32).reshape(-1)
    pos_c, idx_b = _run_ends_compact(d_flat, end_flat, num_buckets)

    def pick(a):  # (K, *E, R) -> (*E, num_buckets) values at run ends
        flat = jnp.moveaxis(a, 0, -2).reshape(*a.shape[1:-1], KR)
        return jnp.take(flat, pos_c, axis=-1)

    buckets_a = JacobianPoint(
        binf.x.at[..., idx_b].set(pick(ox), mode="drop"),
        binf.y.at[..., idx_b].set(pick(oy), mode="drop"),
        binf.z.at[..., idx_b].set(pick(oz), mode="drop"),
    )
    acc_last = JacobianPoint(ox[-1], oy[-1], oz[-1])
    if parts:
        return buckets_a, acc_last, d_t
    buckets_b = _fold_partials(cops, acc_last, d_t, binf, num_buckets)
    return cops.add(buckets_a, buckets_b)


def _bucket_sums(
    cops: C.CurveOps,
    digits: jnp.ndarray,
    points: JacobianPoint,
    num_buckets: int,
    column_steps: int,
    unroll: bool,
) -> JacobianPoint:
    """S_b = sum of points with digit b; bucket-indexed batch (empty = inf).

    digits: (n,) with n = R*K (pre-padded); points: affine Jacobian batch
    (Z in {0,1}). Sequential-column segmented reduce, see module docstring.
    """
    n = digits.shape[-1]
    steps = min(column_steps, n)
    lanes = n // steps
    assert lanes * steps == n
    if _fused(cops) and not unroll and lanes % 128 == 0:
        return _bucket_sums_fused(cops, digits, points, num_buckets, steps)
    if getattr(cops, "point_ops", None) is not None:
        raise ValueError(
            "split-representation backend requires the fused column path "
            f"(lanes={lanes} must be a multiple of 128, unroll must be off)"
        )
    o = cops.ops

    perm, d_t, head, end = _sorted_layout(digits, steps, num_buckets)

    def gather_t(a):
        taken = jnp.take(a, perm, axis=-1)
        return taken.reshape(*a.shape[:-1], steps, lanes)

    px, py, pz = gather_t(points.x), gather_t(points.y), gather_t(points.z)

    lane_ids = jnp.arange(lanes, dtype=jnp.int32)
    acc0 = cops.infinity_like(
        JacobianPoint(
            px[..., 0, :] * 0, py[..., 0, :] * 0, pz[..., 0, :] * 0
        )
    )
    binf = _bucket_template(cops, points, num_buckets)

    def step(k, carry):
        ax, ay, az, bx, by, bz = carry
        axis = px.ndim - 2

        def pick_k(a):
            return jax.lax.dynamic_index_in_dim(a, k, axis, keepdims=False)

        p_k = JacobianPoint(pick_k(px), pick_k(py), pick_k(pz))
        hmask = jax.lax.dynamic_index_in_dim(head, k, 0, keepdims=False)
        emask = jax.lax.dynamic_index_in_dim(end, k, 0, keepdims=False)
        d_k = jax.lax.dynamic_index_in_dim(d_t, k, 0, keepdims=False)
        added = cops.madd(JacobianPoint(ax, ay, az), p_k)
        ax = o.select(hmask, p_k.x, added.x)
        ay = o.select(hmask, p_k.y, added.y)
        az = o.select(hmask, p_k.z, added.z)
        # completed runs scatter to their bucket; others to unique dropped slots
        idx = jnp.where(
            emask, d_k.astype(jnp.int32), jnp.int32(num_buckets) + lane_ids
        )
        bx = bx.at[..., idx].set(ax, mode="drop")
        by = by.at[..., idx].set(ay, mode="drop")
        bz = bz.at[..., idx].set(az, mode="drop")
        return ax, ay, az, bx, by, bz

    init = (acc0.x, acc0.y, acc0.z, binf.x, binf.y, binf.z)
    if unroll:
        carry = init
        for k in range(steps):
            carry = step(k, carry)
    else:
        carry = jax.lax.fori_loop(0, steps, step, init)
    ax, ay, az, bx, by, bz = carry
    buckets_a = JacobianPoint(bx, by, bz)
    buckets_b = _fold_partials(
        cops, JacobianPoint(ax, ay, az), d_t, binf, num_buckets
    )
    return cops.add(buckets_a, buckets_b)


def _chunk_t(a, K2):
    """Chunk-transpose the trailing axis: (..., n) -> (K2, ..., n//K2) with
    out[k, ..., j] = a[..., j*K2 + k] — each output lane owns a contiguous
    chunk of the sequence, matching `_sorted_layout`'s (K, R) layout."""
    r = a.reshape(*a.shape[:-1], a.shape[-1] // K2, K2)
    return jnp.moveaxis(r, -1, 0)


def _merge_lanes(a, lead=1):
    """(K, ..., W, R2) -> (K, ..., W*R2): windows stay lane-separated."""
    return a.reshape(*a.shape[:-2], a.shape[-2] * a.shape[-1])


def _fold_trailing_fused(
    cops, acc_last: JacobianPoint, last_d, first_d, num_buckets: int
):
    """Fold the per-window cross-chunk trailing partials through the fused
    fold kernel (2 levels), batched over all windows at once.

    acc_last: (*E, W, R) trailing accumulators; last_d/first_d: (W, R)
    first/last digit of each chunk. Returns two (*E, W, num_buckets)
    bucket arrays (disjoint deposits; caller adds them in).

    Replaces the per-window Hillis-Steele `seg_scan` fold: same semantics
    as `_fold_partials`, but every step is the ONE fused fold kernel, so
    the compiled program carries no log-depth shape ladder.
    """
    o = cops.ops
    W, R = last_d.shape
    R2 = 128
    K2 = R // R2
    BP = num_buckets + 1  # per-window slot count incl. one garbage column
    DEAD_ALL = jnp.int32(W * BP)  # out of range everywhere -> dropped
    w_ids = jnp.arange(W, dtype=jnp.int32)[:, None]

    # lane j's trailing partial participates iff its run continues into
    # lane j+1 (same digit across the chunk boundary); composite keys
    # w*(BP) + digit keep windows from ever merging
    cont = jnp.concatenate(
        [last_d[:, :-1] == first_d[:, 1:], jnp.zeros((W, 1), jnp.bool_)],
        axis=-1,
    )
    key = jnp.where(
        cont, w_ids * BP + last_d.astype(jnp.int32), DEAD_ALL
    )  # (W, R)
    inf = cops.infinity_like(acc_last)
    val = JacobianPoint(
        o.select(cont, acc_last.x, inf.x),
        o.select(cont, acc_last.y, inf.y),
        o.select(cont, acc_last.z, inf.z),
    )

    def level(val, key, rows, K):
        """One fold level over `rows` independent sequences of length
        seqlen = key.shape[-1]/... : `key` is (rows, seqlen), `val` coords
        are (*E, rows, seqlen). Chunk-transposes each sequence into
        (K, seqlen/K) so every kernel lane owns one contiguous chunk, runs
        the fold kernel, deposits global run ends into a (rows*BP) flat
        bucket array, and returns (deposits, trailing values, transposed
        keys)."""
        seqlen = key.shape[-1]
        lanes = rows * (seqlen // K)
        kt = _merge_lanes(_chunk_t(key, K))  # (K, lanes)
        ct = JacobianPoint(
            _merge_lanes(_chunk_t(val.x, K)),
            _merge_lanes(_chunk_t(val.y, K)),
            _merge_lanes(_chunk_t(val.z, K)),
        )
        head = jnp.concatenate(
            [jnp.ones((1, lanes), jnp.bool_), kt[1:] != kt[:-1]]
        )
        astream, _ = cops.run_fold_columns(ct.x, ct.y, ct.z, head)
        # global run ends in sequence order, then chunk-transposed k-major
        end_seq = jnp.concatenate(
            [key[:, :-1] != key[:, 1:], jnp.ones((rows, 1), jnp.bool_)],
            axis=-1,
        )
        end_flat = _merge_lanes(_chunk_t(end_seq, K)).reshape(-1)
        key_flat = kt.astype(jnp.int32).reshape(-1)
        # the stream (rows*seqlen elements) is SMALLER than the bucket
        # array (W*BP): scatter run-end stream values directly (the main
        # column pass has the opposite ratio and gathers instead)
        end_key = jnp.where(end_flat, key_flat, jnp.int32(W * BP))

        def tmpl(a):
            return jnp.zeros((*a.shape[1:-1], W * BP), a.dtype)

        binf = cops.infinity_like(
            JacobianPoint(tmpl(astream.x), tmpl(astream.y), tmpl(astream.z))
        )
        KR = astream.x.shape[0] * astream.x.shape[-1]

        def dep(b, a):
            flat = jnp.moveaxis(a, 0, -2).reshape(*a.shape[1:-1], KR)
            return b.at[..., end_key].set(flat, mode="drop")

        deposits = JacobianPoint(
            dep(binf.x, astream.x),
            dep(binf.y, astream.y),
            dep(binf.z, astream.z),
        )
        trail = JacobianPoint(astream.x[-1], astream.y[-1], astream.z[-1])
        return deposits, trail, kt

    def unflat(dep):
        def cut(a):
            return a.reshape(*a.shape[:-1], W, BP)[..., :num_buckets]

        return JacobianPoint(cut(dep.x), cut(dep.y), cut(dep.z))

    # level 1: W rows of R-length sequences -> (K2 steps, W*128 lanes)
    b1, trail1, kt1 = level(val, key, W, K2)

    # level 2: the 128 lane-trailing partials per window, fully sequential
    # (one 128-step chain per window; lanes padded W -> 128 for the kernel)
    tkey = kt1[-1]  # (W*128,) in lane order l = w*128 + j2
    fkey = kt1[0]
    cont2 = jnp.concatenate(
        [tkey[:-1] == fkey[1:], jnp.zeros((1,), jnp.bool_)]
    )
    key2 = jnp.where(cont2, tkey.astype(jnp.int32), DEAD_ALL)
    inf2 = cops.infinity_like(trail1)
    val2 = JacobianPoint(
        o.select(cont2, trail1.x, inf2.x),
        o.select(cont2, trail1.y, inf2.y),
        o.select(cont2, trail1.z, inf2.z),
    )
    pad = 128 - W

    def rows2(a):
        r = a.reshape(*a.shape[:-1], W, R2)  # (*E, W, 128)
        if pad:
            shp = (*r.shape[:-2], pad, R2)
            r = jnp.concatenate([r, jnp.zeros(shp, r.dtype)], axis=-2)
        return r

    key2r = rows2(key2.astype(jnp.int32))
    if pad:
        # padded rows: DEAD keys so their deposits drop
        key2r = key2r.at[W:].set(DEAD_ALL)
    b2, _, _ = level(
        JacobianPoint(rows2(val2.x), rows2(val2.y), rows2(val2.z)),
        key2r,
        128,
        R2,
    )
    return unflat(b1), unflat(b2)


def _weighted_fold_fused(
    cops, buckets: JacobianPoint, num_buckets: int, signed: bool
) -> JacobianPoint:
    """sum_{b>=1} b*S_b per window through the fused fold kernel.

    buckets: (*E, W, num_buckets). Split b = j*Kw + m' (m' in [1, Kw]):
    feeding each kernel lane its buckets in DESCENDING order makes the
    kernel's suffix accumulator B end at sum_m' m'*S (each element joins
    A at step Kw - m' and is re-added into B for m' steps), and A end at
    T_j = sum S. Then sum_b b*S_b = Kw*sum_j j*T_j + sum_j B_j, with the
    level-2 sums computed by one more (shared-shape) kernel call over
    lanes [T | B]. Replaces the split-index tree reduction
    (`_weighted_reduce`) with two fixed-shape kernel calls so the
    compiled program carries no log-depth ladder of shape-varied adds.
    """
    W = buckets.x.shape[-2]
    M = num_buckets - 1 if signed else num_buckets  # covered b range [1, M]
    Rw = 128
    Kw = M // Rw

    def stream1(a):
        s = a[..., 1:]  # drop bucket 0 (weight 0)
        if not signed:
            # pad a phantom infinity bucket at b = 2^c (zeros == infinity)
            s = jnp.concatenate(
                [s, jnp.zeros((*s.shape[:-1], 1), s.dtype)], axis=-1
            )
        r = s.reshape(*s.shape[:-1], Rw, Kw)  # [..., w, j, m'-1]
        r = jnp.flip(r, axis=-1)  # descending m'
        r = jnp.moveaxis(r, -1, 0)  # (Kw, *E, W, Rw)
        return r.reshape(r.shape[0], *r.shape[1:-2], W * Rw)

    heads = jnp.zeros((Kw, W * Rw), jnp.bool_)
    astr, bstr = cops.run_fold_columns(
        stream1(buckets.x), stream1(buckets.y), stream1(buckets.z), heads
    )

    def lastrow(p):
        return JacobianPoint(p.x[-1], p.y[-1], p.z[-1])  # (*E, W*Rw)

    T, Bl = lastrow(astr), lastrow(bstr)

    # level 2: per window, T descending j in lanes [0, W) and B (any
    # order; only the sum is needed) in lanes [W, 2W); pad to 128 lanes
    def stream2(a_t, a_b):
        rt = jnp.flip(a_t.reshape(*a_t.shape[:-1], W, Rw), axis=-1)
        rb = a_b.reshape(*a_b.shape[:-1], W, Rw)
        pad = jnp.zeros((*rt.shape[:-2], 128 - 2 * W, Rw), a_t.dtype)
        rows = jnp.concatenate([rt, rb, pad], axis=-2)  # (*E, 128, Rw)
        return jnp.moveaxis(rows, -1, 0).reshape(Rw, *rows.shape[:-2], 128)

    heads2 = jnp.zeros((Rw, 128), jnp.bool_)
    astr2, bstr2 = cops.run_fold_columns(
        stream2(T.x, Bl.x), stream2(T.y, Bl.y), stream2(T.z, Bl.z), heads2
    )
    fin_a, fin_b = lastrow(astr2), lastrow(bstr2)

    def cut(p, lo, hi):
        return JacobianPoint(p.x[..., lo:hi], p.y[..., lo:hi], p.z[..., lo:hi])

    A2 = cut(fin_a, 0, W)  # sum_j T_j
    B2 = cut(fin_b, 0, W)  # sum_j (j+1) T_j
    A3 = cut(fin_a, W, 2 * W)  # sum_j B_j
    # S_w = Kw*(B2 - A2) + A3
    d = cops.add(B2, cops.neg(A2))
    d = JacobianPoint(
        *jax.lax.fori_loop(
            0,
            Kw.bit_length() - 1,
            lambda _, t: tuple(cops.double(JacobianPoint(*t))),
            tuple(d),
        )
    )
    wins = cops.add(d, A3)  # (*E, W)
    return JacobianPoint(
        wins.x[..., None], wins.y[..., None], wins.z[..., None]
    )  # (*E, W, 1) — the layout the Horner combine expects


def msm(
    cops: C.CurveOps,
    scalars: jnp.ndarray,
    points: JacobianPoint,
    window_bits: int = DEFAULT_WINDOW_BITS,
    unroll: bool = False,
    column_steps: int = DEFAULT_COLUMN_STEPS,
    scalar_bits: int = 0,
    signed: bool = True,
) -> JacobianPoint:
    """sum_i scalars[i] * points[i].

    scalars: (S_L, N) canonical (non-Montgomery) 16-bit limbs of the scalar
    field. points: Jacobian batch of N points (affine, Z in {0,1} — as
    produced by `encode_points`/`to_affine`; required by the mixed-add
    bucket accumulation). Returns a single-lane Jacobian point.

    `signed` uses signed window recoding (half the buckets, and with
    `scalar_bits` set, ceil(bits/c) windows instead of ceil(272/c) — e.g.
    16 instead of 21 for BLS12-381 Fr at c=16). `unroll=True` replaces the
    fori_loops with Python loops: used for op-by-op eager execution
    (tests) where compiling the rolled graph is not worth it.
    """
    num_buckets = (1 << (window_bits - 1)) + 1 if signed else 1 << window_bits
    n = points.x.shape[-1]
    if scalars.shape[-1] != n:
        raise ValueError(
            f"scalar lanes ({scalars.shape[-1]}) != point lanes ({n})"
        )
    steps = min(column_steps, n)
    n2 = -(-n // steps) * steps
    # point-array ops: split-representation backends (limb points feeding
    # an RNS accumulation) expose `point_ops` for the affine input arrays
    po = getattr(cops, "point_ops", None) or cops.ops
    if n2 != n:
        # pad with infinity points, digit 0 (bucket 0 has weight 0)
        pad = n2 - n
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((scalars.shape[0], pad), scalars.dtype)], axis=-1
        )
        pinf = getattr(cops, "point_infinity_like", cops.infinity_like)
        inf = pinf(points)

        def pad_c(a, ia):
            return jnp.concatenate([a, ia[..., :pad]], axis=-1)

        points = JacobianPoint(
            pad_c(points.x, inf.x), pad_c(points.y, inf.y), pad_c(points.z, inf.z)
        )
    o = cops.ops
    if signed:
        digits, negs, _ = window_digits_signed(
            scalars, window_bits, scalar_bits
        )
        y_neg = po.neg(points.y)
    else:
        digits = window_digits(scalars, window_bits)  # (W, n2)
        negs = None
    num_windows = digits.shape[0]

    def one_window(d, neg=None):
        pts = points
        if neg is not None:
            pts = JacobianPoint(
                points.x, po.select(neg, y_neg, points.y), points.z
            )
        buckets = _bucket_sums(cops, d, pts, num_buckets, steps, unroll)
        if signed:
            return _weighted_reduce_signed(cops, buckets, window_bits)
        return _weighted_reduce(cops, buckets, window_bits)

    def window_args(w):
        return (digits[w], negs[w]) if signed else (digits[w],)

    if unroll:
        acc = one_window(*window_args(num_windows - 1))
        for w in range(num_windows - 2, -1, -1):
            for _ in range(window_bits):
                acc = cops.double(acc)
            acc = cops.add(acc, one_window(*window_args(w)))
        return acc

    # Per-window bucket accumulation runs inside the rolled window loop
    # (ONE copy of the sort/gather/column pipeline in the graph); the
    # weighted bucket reduction then runs ONCE over all windows as a batch
    # axis — it is dispatch-bound (~50 small kernel launches), so batching
    # the windows amortizes the launches 16x. Bucket stores live in the
    # GROUP-LAW representation (hybrid backends: RNS) with layout
    # (*E, W, num_buckets) — the limb/channel axis stays leading, as the
    # field ops require.
    def select_pts(neg):
        if neg is None:
            return points
        return JacobianPoint(
            points.x, po.select(neg, y_neg, points.y), points.z
        )

    enc0 = np.asarray(
        cops.ops.encode([(0, 0) if cops.curve.is_ext else 0])
    )
    store_shape = (*enc0.shape[:-1], num_windows, num_buckets)
    R = n2 // steps
    fold_path = (
        _fused(cops)
        and hasattr(cops, "run_fold_columns")
        and R % 128 == 0
        and ((num_buckets - 1 if signed else num_buckets) % 128 == 0)
        and 2 * num_windows <= 128
    )

    def put(buf, val, i):
        return jax.lax.dynamic_update_slice_in_dim(
            buf, val[..., None, :], i, axis=buf.ndim - 2
        )

    if fold_path:
        # ONE batched sort for all windows: the TPU sort unit pipelines
        # batch rows (16x1M batched sort_key_val: 51ms, vs 16 separate
        # counting sorts: 1.8s — it was HALF the whole MSM runtime)
        iota = jnp.broadcast_to(
            jnp.arange(n2, dtype=jnp.int32), digits.shape
        )
        d_sorted_all, order_all = jax.lax.sort_key_val(digits, iota)

        # store per window: end-deposit buckets + the trailing chunk
        # accumulators and boundary digits; fold + weighted-reduce run
        # ONCE over all windows through the shared fold kernel
        def window_body(i, carry):
            bx, by, bz, tx, ty, tz, ld, fd = carry
            ba, acc_last, d_t = _bucket_sums_fused(
                cops,
                digits[i],
                select_pts(negs[i] if signed else None),
                num_buckets,
                steps,
                parts=True,
                presorted=(order_all[i], d_sorted_all[i]),
            )
            return (
                put(bx, ba.x, i), put(by, ba.y, i), put(bz, ba.z, i),
                put(tx, acc_last.x, i), put(ty, acc_last.y, i),
                put(tz, acc_last.z, i),
                put(ld, d_t[-1], i), put(fd, d_t[0], i),
            )

        trail_shape = (*enc0.shape[:-1], num_windows, R)
        init = tuple(jnp.zeros(store_shape, enc0.dtype) for _ in range(3)) + tuple(
            jnp.zeros(trail_shape, enc0.dtype) for _ in range(3)
        ) + tuple(jnp.zeros((num_windows, R), digits.dtype) for _ in range(2))
        out = jax.lax.fori_loop(0, num_windows, window_body, init)
        bx, by, bz, tx, ty, tz, ld, fd = out
        b1, b2 = _fold_trailing_fused(
            cops, JacobianPoint(tx, ty, tz), ld, fd, num_buckets
        )
        buckets = cops.add(cops.add(JacobianPoint(bx, by, bz), b1), b2)
        wins = _weighted_fold_fused(cops, buckets, num_buckets, signed)
    else:
        def window_body(i, carry):
            bx, by, bz = carry
            b = _bucket_sums(
                cops,
                digits[i],
                select_pts(negs[i] if signed else None),
                num_buckets,
                steps,
                unroll,
            )
            return put(bx, b.x, i), put(by, b.y, i), put(bz, b.z, i)

        init = tuple(jnp.zeros(store_shape, enc0.dtype) for _ in range(3))
        bx, by, bz = jax.lax.fori_loop(0, num_windows, window_body, init)
        wins = (
            _weighted_reduce_signed(
                cops, JacobianPoint(bx, by, bz), window_bits
            )
            if signed
            else _weighted_reduce(cops, JacobianPoint(bx, by, bz), window_bits)
        )  # coords: (*E, W, 1)

    # Horner from the most significant window down:
    # acc = W_{last}; for w = last-1..0: acc = 2^c * acc + W_w
    def pick_w(w):
        def one(a):
            return jax.lax.dynamic_index_in_dim(
                a, w, axis=a.ndim - 2, keepdims=False
            )

        return JacobianPoint(one(wins.x), one(wins.y), one(wins.z))

    top = JacobianPoint(
        wins.x[..., -1, :], wins.y[..., -1, :], wins.z[..., -1, :]
    )

    def horner_body(i, acc_tuple):
        acc = jax.lax.fori_loop(
            0,
            window_bits,
            lambda _, a: tuple(cops.double(JacobianPoint(*a))),
            acc_tuple,
        )
        acc = cops.add(JacobianPoint(*acc), pick_w(num_windows - 2 - i))
        return tuple(acc)

    result = jax.lax.fori_loop(0, num_windows - 1, horner_body, tuple(top))
    return JacobianPoint(*result)


msm_jit = jax.jit(msm, static_argnums=(0, 3, 4, 5, 6, 7))


def msm_host_oracle(curve, scalars, points):
    """Slow host-side MSM for tests."""
    return curve.msm(scalars, points)
