"""Pippenger multi-scalar multiplication on device.

TPU-first design (replaces `ark_ec::msm` used by the reference's Groth16
prover, see SURVEY.md §2.9#3): everything is lane-parallel vector work with
no data-dependent control flow —

1. **Windows**: c-bit windows (c divides 16; default 16 so window digits are
   exactly the base-2^16 scalar limbs the framework already uses).
2. **Bucket accumulation** per window: sort point indices by digit
   (`jnp.argsort`), then a *segmented inclusive scan* over the sorted points
   with the classic head-flag monoid — `(v1,h1) ⊕ (v2,h2) =
   (h2 ? v2 : v1+v2, h1|h2)` — where ⊕ on values is the complete Jacobian
   add. Segment ends hold the bucket sums; they are scattered into the
   bucket array at unique indices (empty buckets stay at infinity).
3. **Bucket reduction**: sum_b b·S_b via a reverse (suffix) scan over the
   bucket axis followed by a lane-parallel tree reduction — no 2^c-step
   sequential running sum.
4. **Window combine**: Horner over windows (c doublings per window), inside
   a fori_loop so the compiled graph holds ONE copy of the add formula per
   scan level rather than one per window.

The N-point workload is embarrassingly parallel across chips: shard points
and scalars along N, run this kernel per shard, tree-add the per-device
partial results (see `manta_tpu.parallel.msm_sharded`).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from manta_tpu import fields
from manta_tpu.ops import curve as C
from manta_tpu.ops.curve import JacobianPoint
from manta_tpu.ops import scan as S


def window_digits(scalars: jnp.ndarray, window_bits: int) -> jnp.ndarray:
    """(S_L, N) 16-bit limbs -> (W, N) c-bit window digits, little-endian."""
    assert fields.LIMB_BITS % window_bits == 0
    per_limb = fields.LIMB_BITS // window_bits
    mask = jnp.uint32((1 << window_bits) - 1)
    parts = [
        (scalars >> jnp.uint32(k * window_bits)) & mask for k in range(per_limb)
    ]
    # stack -> (per_limb, S_L, N); window w = limb * per_limb + k
    stacked = jnp.stack(parts, axis=1)  # (S_L, per_limb, N)
    return stacked.reshape(-1, scalars.shape[-1])


def _bucket_sums(
    cops: C.CurveOps, digits: jnp.ndarray, points: JacobianPoint, num_buckets: int
) -> JacobianPoint:
    """S_b = sum of points with digit b; bucket-indexed batch (empty = inf)."""
    order = jnp.argsort(digits)
    d_sorted = digits[order]
    pts = JacobianPoint(
        jnp.take(points.x, order, axis=-1),
        jnp.take(points.y, order, axis=-1),
        jnp.take(points.z, order, axis=-1),
    )
    heads = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), d_sorted[1:] != d_sorted[:-1]]
    )
    scanned = S.seg_scan(cops, pts, heads)
    ends = jnp.concatenate(
        [d_sorted[1:] != d_sorted[:-1], jnp.ones((1,), jnp.bool_)]
    )
    idx = jnp.where(ends, d_sorted.astype(jnp.int32), num_buckets)

    def bucket_shape(a):
        return (*a.shape[:-1], num_buckets)

    inf = cops.infinity_like(
        JacobianPoint(
            jnp.zeros(bucket_shape(points.x), points.x.dtype),
            jnp.zeros(bucket_shape(points.y), points.y.dtype),
            jnp.zeros(bucket_shape(points.z), points.z.dtype),
        )
    )
    return JacobianPoint(
        inf.x.at[..., idx].set(scanned.x, mode="drop"),
        inf.y.at[..., idx].set(scanned.y, mode="drop"),
        inf.z.at[..., idx].set(scanned.z, mode="drop"),
    )


def _reduce_buckets(cops: C.CurveOps, buckets: JacobianPoint) -> JacobianPoint:
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


def msm(
    cops: C.CurveOps,
    scalars: jnp.ndarray,
    points: JacobianPoint,
    window_bits: int = 16,
    unroll: bool = False,
) -> JacobianPoint:
    """sum_i scalars[i] * points[i].

    scalars: (S_L, N) canonical (non-Montgomery) 16-bit limbs of the scalar
    field. points: Jacobian batch of N points (typically affine, Z=1).
    Returns a single-lane Jacobian point (trailing axis length 1).

    `unroll=True` replaces the fori_loops with Python loops: used for
    op-by-op eager execution (tests) where compiling the rolled graph is
    not worth it.
    """
    num_buckets = 1 << window_bits
    digits = window_digits(scalars, window_bits)  # (W, N)
    num_windows = digits.shape[0]

    def one_window(w):
        buckets = _bucket_sums(cops, digits[w], points, num_buckets)
        return _reduce_buckets(cops, buckets)

    if unroll:
        acc = one_window(num_windows - 1)
        for w in range(num_windows - 2, -1, -1):
            for _ in range(window_bits):
                acc = cops.double(acc)
            acc = cops.add(acc, one_window(w))
        return acc

    def window_body(i, carry):
        wx, wy, wz = carry
        res = one_window(i)
        return (
            jax.lax.dynamic_update_index_in_dim(wx, res.x, i, 0),
            jax.lax.dynamic_update_index_in_dim(wy, res.y, i, 0),
            jax.lax.dynamic_update_index_in_dim(wz, res.z, i, 0),
        )

    shape1 = lambda a: (num_windows, *a.shape[:-1], 1)
    init = (
        jnp.zeros(shape1(points.x), points.x.dtype),
        jnp.zeros(shape1(points.y), points.y.dtype),
        jnp.zeros(shape1(points.z), points.z.dtype),
    )
    wx, wy, wz = jax.lax.fori_loop(0, num_windows, window_body, init)

    # Horner from the most significant window down:
    # acc = W_{last}; for w = last-1..0: acc = 2^c * acc + W_w
    top = JacobianPoint(wx[-1], wy[-1], wz[-1])

    def horner_body(i, acc_tuple):
        acc = JacobianPoint(*acc_tuple)
        acc = jax.lax.fori_loop(
            0,
            window_bits,
            lambda _, a: tuple(cops.double(JacobianPoint(*a))),
            tuple(acc),
        )
        w = num_windows - 2 - i
        term = JacobianPoint(
            jax.lax.dynamic_index_in_dim(wx, w, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(wy, w, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(wz, w, 0, keepdims=False),
        )
        acc = cops.add(JacobianPoint(*acc), term)
        return tuple(acc)

    result = jax.lax.fori_loop(0, num_windows - 1, horner_body, tuple(top))
    return JacobianPoint(*result)


msm_jit = jax.jit(msm, static_argnums=(0, 3, 4))


def msm_host_oracle(curve, scalars, points):
    """Slow host-side MSM for tests."""
    return curve.msm(scalars, points)
