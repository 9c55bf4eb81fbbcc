"""Segmented scans over elliptic-curve point batches with small compiled graphs.

`jax.lax.associative_scan` instantiates its combiner ~2·log2(n) times in the
compiled program; with a complete Jacobian addition as the combiner (~10^4
HLO ops) that makes 2^20-point scans uncompilable. This module provides an
inclusive **segmented** scan that instantiates the combiner exactly three
times, using a two-level decomposition:

1. reshape the batch to (blocks, B) and run a Hillis-Steele segmented scan
   *within* blocks — a `fori_loop` over log2(B) steps whose body contains ONE
   combiner and a dynamic shift;
2. scan the block *tails* (the trailing-segment partial sums) across blocks
   with the same head-flag monoid — a second `fori_loop` over
   log2(n/B) steps;
3. prepend each block's carry into the lanes that precede the block's first
   segment head — one masked combine.

Cost: ~(log2(B) + 1)·n combines of full lane width (vs 2n for the
work-efficient tree, n·log2(n) for flat Hillis-Steele). B = 128 matches the
VPU lane width. Used by the MSM bucket machinery (`manta_tpu.ops.msm`) for
bucket accumulation, suffix sums, and total reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from manta_tpu.ops import curve as C
from manta_tpu.ops.curve import JacobianPoint


def _shift_right(arr: jnp.ndarray, offset, fill: jnp.ndarray) -> jnp.ndarray:
    """Shift along the last axis: out[..., i] = arr[..., i - offset] with
    `fill` values entering from the left. `offset` may be traced (dynamic)."""
    n = arr.shape[-1]
    padded = jnp.concatenate([fill, arr], axis=-1)  # (..., 2n)
    start = (jnp.asarray(n, jnp.int32) - offset).astype(jnp.int32)
    starts = [jnp.int32(0)] * (arr.ndim - 1) + [start]
    return jax.lax.dynamic_slice(padded, starts, arr.shape)


def _squeeze_to_rank(mask: jnp.ndarray, rank: int) -> jnp.ndarray:
    """Drop leading size-1 axes until `mask` has `rank` dims."""
    while mask.ndim > rank:
        assert mask.shape[0] == 1
        mask = jnp.squeeze(mask, 0)
    return mask


def _hillis_steele(
    cops: C.CurveOps, pts: JacobianPoint, heads: jnp.ndarray, scan_rank: int
):
    """Inclusive segmented scan along the last axis.

    pts coords: (coord_dims..., *scan_shape) where scan_shape has `scan_rank`
    trailing axes (the last is the scan axis, earlier ones are batch shared
    with heads). heads: bool, shape (1...,*scan_shape). Lanes where a head
    has been *seen* stop absorbing from the left. Returns (points, heads_seen).
    """
    n = pts.x.shape[-1]
    steps = max(1, (n - 1).bit_length())
    inf = cops.infinity_like(pts)
    o = cops.ops

    def body(k, state):
        vx, vy, vz, h = state
        off = jnp.left_shift(jnp.int32(1), k)
        sx = _shift_right(vx, off, inf.x)
        sy = _shift_right(vy, off, inf.y)
        sz = _shift_right(vz, off, inf.z)
        sh = _shift_right(h, off, jnp.ones_like(h))
        summed = cops.add(JacobianPoint(sx, sy, sz), JacobianPoint(vx, vy, vz))
        absorb = _squeeze_to_rank(jnp.logical_not(h), scan_rank)
        return (
            o.select(absorb, summed.x, vx),
            o.select(absorb, summed.y, vy),
            o.select(absorb, summed.z, vz),
            jnp.logical_or(h, sh),
        )

    vx, vy, vz, h = jax.lax.fori_loop(
        0, steps, body, (pts.x, pts.y, pts.z, heads)
    )
    return JacobianPoint(vx, vy, vz), h


def seg_scan(cops: C.CurveOps, pts: JacobianPoint, heads: jnp.ndarray, block: int = 128):
    """Inclusive segmented scan over a 1D batch (trailing axis), two-level.

    pts coords: (..., n); heads: bool (n,). n must be divisible by `block`
    (or <= block). Returns scanned points (same shapes).
    """
    n = pts.x.shape[-1]
    if n <= block:
        scanned, _ = _hillis_steele(
            cops, pts, heads.reshape((1,) * (pts.x.ndim - 1) + (-1,)), 1
        )
        return scanned
    if n % block:
        # pad with infinity lanes forming their own segment, slice back after
        pad = block - n % block
        inf = cops.infinity_like(pts)

        def pad_c(a, ia):
            return jnp.concatenate([a, ia[..., :pad]], axis=-1)

        padded_pts = JacobianPoint(
            pad_c(pts.x, inf.x), pad_c(pts.y, inf.y), pad_c(pts.z, inf.z)
        )
        padded_heads = jnp.concatenate(
            [heads, jnp.ones((pad,), jnp.bool_)], axis=-1
        )
        out = seg_scan(cops, padded_pts, padded_heads, block=block)
        return JacobianPoint(out.x[..., :n], out.y[..., :n], out.z[..., :n])
    nb = n // block
    o = cops.ops

    def to_blocks(a):
        return a.reshape(*a.shape[:-1], nb, block)

    def from_blocks(a):
        return a.reshape(*a.shape[:-2], n)

    bp = JacobianPoint(to_blocks(pts.x), to_blocks(pts.y), to_blocks(pts.z))
    bh = heads.reshape((1,) * (pts.x.ndim - 1) + (nb, block))

    # level 1: scan within blocks. NB: the heads-seen flag coming out of the
    # scan is polluted by the block-boundary barrier fill; compute the true
    # within-block "head at or before lane" mask separately.
    scanned, _ = _hillis_steele(cops, bp, bh, 2)
    seen = jnp.cumsum(bh.astype(jnp.int32), axis=-1) > 0

    # level 2: scan block tails across blocks (segmented by block-has-head)
    tails = JacobianPoint(
        scanned.x[..., -1], scanned.y[..., -1], scanned.z[..., -1]
    )  # (..., nb)
    block_has_head = jnp.any(bh, axis=-1)  # (1..., nb)
    tail_scan, _ = _hillis_steele(cops, tails, block_has_head, 1)

    # level 3: carry for block r = tail_scan[r-1]; prepend into lanes that
    # have not yet seen a head inside their block
    inf_t = cops.infinity_like(tails)
    carry = JacobianPoint(
        _shift_right(tail_scan.x, jnp.int32(1), inf_t.x),
        _shift_right(tail_scan.y, jnp.int32(1), inf_t.y),
        _shift_right(tail_scan.z, jnp.int32(1), inf_t.z),
    )
    carry_b = JacobianPoint(
        carry.x[..., None], carry.y[..., None], carry.z[..., None]
    )  # broadcast over block lanes
    carry_full = JacobianPoint(
        jnp.broadcast_to(carry_b.x, scanned.x.shape),
        jnp.broadcast_to(carry_b.y, scanned.y.shape),
        jnp.broadcast_to(carry_b.z, scanned.z.shape),
    )
    fixed = cops.add(carry_full, scanned)
    lane_mask = _squeeze_to_rank(seen, 2)
    out = JacobianPoint(
        o.select(lane_mask, scanned.x, fixed.x),
        o.select(lane_mask, scanned.y, fixed.y),
        o.select(lane_mask, scanned.z, fixed.z),
    )
    return JacobianPoint(from_blocks(out.x), from_blocks(out.y), from_blocks(out.z))


def prefix_scan(cops: C.CurveOps, pts: JacobianPoint, block: int = 128):
    """Unsegmented inclusive prefix scan (single segment starting at lane 0)."""
    n = pts.x.shape[-1]
    heads = jnp.zeros((n,), jnp.bool_).at[0].set(True)
    return seg_scan(cops, pts, heads, block=block)


def suffix_scan(cops: C.CurveOps, pts: JacobianPoint, block: int = 128):
    """Unsegmented inclusive suffix scan: out[i] = sum_{j>=i} pts[j]."""
    rev = JacobianPoint(
        jnp.flip(pts.x, axis=-1), jnp.flip(pts.y, axis=-1), jnp.flip(pts.z, axis=-1)
    )
    scanned = prefix_scan(cops, rev, block=block)
    return JacobianPoint(
        jnp.flip(scanned.x, axis=-1),
        jnp.flip(scanned.y, axis=-1),
        jnp.flip(scanned.z, axis=-1),
    )


def total_sum(cops: C.CurveOps, pts: JacobianPoint, block: int = 128):
    """Sum all points: last element of the prefix scan (single-lane result)."""
    scanned = prefix_scan(cops, pts, block=block)
    return JacobianPoint(
        scanned.x[..., -1:], scanned.y[..., -1:], scanned.z[..., -1:]
    )
