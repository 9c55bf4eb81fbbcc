"""MSM + segmented-scan machinery vs host oracle.

Exhaustive coverage runs on a toy 16-bit curve (2-limb fields) so the
compiled graphs stay small; the real-curve MSM path shares every line of
code with the toy path except the FieldSpec constants, and is exercised by
the env-gated slow test + the benchmark harness.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from manta_tpu import fields
from manta_tpu.ops import curve as C
from manta_tpu.ops import field_ops as F
from manta_tpu.ops import msm as M
from manta_tpu.ops import scan as S
from manta_tpu.utils import hostmath

TOY = hostmath.TOY_G1
SLOW = os.environ.get("MANTA_TPU_SLOW_TESTS") == "1"


def toy_points(rng, n):
    return [
        TOY.scalar_mul(rng.randrange(1, TOY.scalar_field.modulus), TOY.generator)
        for _ in range(n)
    ]


def test_window_digits():
    sc = jnp.asarray(
        F.encode_ints(fields.BN254_FR, [0x1234ABCD], montgomery=False)
    )
    d = M.window_digits(sc, 4)
    got = [int(x) for x in d[:8, 0]]
    assert got == [0xD, 0xC, 0xB, 0xA, 4, 3, 2, 1]


class TestSegScan:
    def test_blocked_prefix_scan(self, rng):
        """n = 256 exercises the two-level (block tails + carry) path."""
        ops = C.curve_ops_for(TOY)
        n = 256
        pts = toy_points(rng, n)
        dev = ops.encode_points(pts)
        scanned = S.prefix_scan(ops, dev)
        got = ops.decode_points(scanned)
        acc, expected = None, []
        for p in pts:
            acc = TOY.add(acc, p)
            expected.append(acc)
        assert got == expected

    def test_blocked_segmented_scan(self, rng):
        ops = C.curve_ops_for(TOY)
        n = 256
        pts = toy_points(rng, n)
        # segments of irregular lengths crossing block boundaries
        seg_ids = []
        sid = 0
        while len(seg_ids) < n:
            run = rng.choice([1, 2, 3, 50, 130, 200])
            seg_ids += [sid] * min(run, n - len(seg_ids))
            sid += 1
        heads = jnp.asarray(
            [i == 0 or seg_ids[i] != seg_ids[i - 1] for i in range(n)]
        )
        scanned = S.seg_scan(ops, ops.encode_points(pts), heads)
        got = ops.decode_points(scanned)
        expected, acc = [], None
        for i, p in enumerate(pts):
            if i == 0 or seg_ids[i] != seg_ids[i - 1]:
                acc = None
            acc = TOY.add(acc, p)
            expected.append(acc)
        assert got == expected

    def test_total_sum_with_infinities(self, rng):
        ops = C.curve_ops_for(TOY)
        pts = toy_points(rng, 5) + [None, None] + toy_points(rng, 1)
        expected = None
        for p in pts:
            expected = TOY.add(expected, p)
        got = ops.decode_points(S.total_sum(ops, ops.encode_points(pts)))
        assert got == [expected]


class TestMsm:
    # window 6 exercises digits straddling 16-bit limb boundaries (6 does
    # not divide 16) while keeping the bucket arrays CPU-compile-friendly;
    # the production window (13) runs on real hardware via bench.py
    @pytest.mark.parametrize("window_bits", [4, 6])
    @pytest.mark.parametrize("n", [8, 200])
    def test_toy_msm(self, window_bits, n, rng):
        ops = C.curve_ops_for(TOY)
        r = TOY.scalar_field.modulus
        points = toy_points(rng, n)
        scalars = [rng.randrange(r) for _ in range(n - 3)] + [0, 1, r - 1]
        expected = TOY.msm(scalars, points)
        sc = jnp.asarray(F.encode_ints(TOY.scalar_field, scalars, montgomery=False))
        result = M.msm_jit(ops, sc, ops.encode_points(points), window_bits)
        assert ops.decode_points(result) == [expected]

    def test_toy_msm_duplicates_and_zeros(self, rng):
        ops = C.curve_ops_for(TOY)
        points = [TOY.scalar_mul(k + 1, TOY.generator) for k in range(8)]
        scalars = [5, 5, 5, 5, 0, 0, 5, 5]
        expected = TOY.msm(scalars, points)
        sc = jnp.asarray(F.encode_ints(TOY.scalar_field, scalars, montgomery=False))
        result = M.msm_jit(ops, sc, ops.encode_points(points), 4)
        assert ops.decode_points(result) == [expected]

    def test_toy_msm_same_point_same_digit(self, rng):
        """Identical points with identical scalars force the doubling edge
        case inside the mixed-add accumulation loop (lax.cond path)."""
        ops = C.curve_ops_for(TOY)
        p = TOY.scalar_mul(7, TOY.generator)
        points = [p, p, p] + [TOY.scalar_mul(k + 2, TOY.generator) for k in range(5)]
        scalars = [9, 9, 9] + [rng.randrange(TOY.scalar_field.modulus) for _ in range(5)]
        expected = TOY.msm(scalars, points)
        sc = jnp.asarray(F.encode_ints(TOY.scalar_field, scalars, montgomery=False))
        result = M.msm_jit(ops, sc, ops.encode_points(points), 4, False, 4)
        assert ops.decode_points(result) == [expected]

    def test_toy_msm_bucket_spans_columns(self, rng):
        """All-equal scalars put every point in one bucket spanning every
        column chunk, exercising the trailing-partial fold (B-phase)."""
        ops = C.curve_ops_for(TOY)
        n = 20
        points = toy_points(rng, n)
        scalars = [12345 % TOY.scalar_field.modulus] * n
        expected = TOY.msm(scalars, points)
        sc = jnp.asarray(F.encode_ints(TOY.scalar_field, scalars, montgomery=False))
        result = M.msm_jit(ops, sc, ops.encode_points(points), 4, False, 2)
        assert ops.decode_points(result) == [expected]

    def test_toy_msm_padding(self, rng):
        """n not divisible by column_steps exercises the infinity-pad path."""
        ops = C.curve_ops_for(TOY)
        n = 10
        points = toy_points(rng, n)
        scalars = [rng.randrange(TOY.scalar_field.modulus) for _ in range(n)]
        expected = TOY.msm(scalars, points)
        sc = jnp.asarray(F.encode_ints(TOY.scalar_field, scalars, montgomery=False))
        result = M.msm_jit(ops, sc, ops.encode_points(points), 5, False, 7)
        assert ops.decode_points(result) == [expected]

    @pytest.mark.skipif(
        not SLOW, reason="set MANTA_TPU_SLOW_TESTS=1 (multi-minute XLA CPU compile)"
    )
    def test_bn254_msm(self, rng):
        curve = hostmath.BN254_G1
        ops = C.curve_ops_for(curve)
        n = 8
        g = curve.generator
        points = [curve.scalar_mul(k + 1, g) for k in range(n)]
        scalars = [rng.randrange(curve.scalar_field.modulus) for _ in range(n)]
        expected = curve.msm(scalars, points)
        sc = jnp.asarray(F.encode_ints(curve.scalar_field, scalars, montgomery=False))
        result = M.msm_jit(ops, sc, ops.encode_points(points), 4)
        assert ops.decode_points(result) == [expected]


class TestFoldReduction:
    """The fused fold/weighted bucket-reduction path (kernel-consolidated
    MSM tail) on the toy curve: 2-limb fields keep the interpret-mode
    Pallas bodies small enough for quick CPU runs."""

    def _run(self, rng, n, window, steps, signed, n_points=None):
        ops = C.curve_ops_for(TOY, "fused")
        n_points = n_points or n
        points = toy_points(rng, n_points)
        # duplicate + infinity lanes exercise the add edge cases
        if n_points > 8:
            points[3] = points[2]
            points[7] = None
        scalars = [
            rng.randrange(TOY.scalar_field.modulus) for _ in range(n_points)
        ]
        expected = TOY.msm(scalars, points)
        sc = jnp.asarray(
            F.encode_ints(TOY.scalar_field, scalars, montgomery=False)
        )
        result = M.msm_jit(
            ops,
            sc,
            ops.encode_points(points),
            window,
            False,
            steps,
            TOY.scalar_field.bits,
            signed,
        )
        assert ops.decode_points(result) == [expected]

    def test_fold_path_signed(self, rng):
        # R = 2048/16 = 128, M = 2^8 = 256: engages the fold kernels
        self._run(rng, 2048, 9, 16, True)

    def test_fold_path_unsigned(self, rng):
        # unsigned M = 2^9 = 512 incl. the phantom top-bucket pad
        self._run(rng, 2048, 9, 16, False)

    def test_fold_path_multi_chunk_runs(self, rng):
        # few distinct scalars -> giant buckets spanning many chunks:
        # exercises the 2-level trailing-partial fold
        ops = C.curve_ops_for(TOY, "fused")
        n = 2048
        base = [rng.randrange(1, TOY.scalar_field.modulus) for _ in range(3)]
        scalars = [base[i % 3] for i in range(n)]
        points = toy_points(rng, n)
        expected = TOY.msm(scalars, points)
        sc = jnp.asarray(
            F.encode_ints(TOY.scalar_field, scalars, montgomery=False)
        )
        result = M.msm_jit(
            ops, sc, ops.encode_points(points), 9, False, 16,
            TOY.scalar_field.bits, True,
        )
        assert ops.decode_points(result) == [expected]


class TestCountingSort:
    """The radix counting-sort argsort used for per-window digit grouping."""

    def test_matches_stable_argsort(self, rng):
        import numpy as np

        for n, num_keys in [(1024, 257), (4096, 32769), (2048, 61), (1152, 129)]:
            d = jnp.asarray(
                np.asarray(
                    [rng.randrange(num_keys) for _ in range(n)], dtype=np.uint32
                )
            )
            order = jax.jit(M._counting_sort_order, static_argnums=1)(d, num_keys)
            o = np.asarray(order)
            dd = np.asarray(d)
            assert sorted(o.tolist()) == list(range(n))  # a permutation
            assert (np.sort(dd) == dd[o]).all()  # sorted
            # stable: equal keys keep ascending original indices
            boundaries = np.flatnonzero(np.diff(dd[o]) == 0)
            assert (o[boundaries] < o[boundaries + 1]).all()

    def test_skewed_keys(self, rng):
        """All-equal and two-value key streams (degenerate histograms)."""
        import numpy as np

        n = 1024
        for vals in ([7] * n, [0] * (n // 2) + [32768] * (n // 2)):
            d = jnp.asarray(np.asarray(vals, dtype=np.uint32))
            order = jax.jit(M._counting_sort_order, static_argnums=1)(d, 32769)
            o = np.asarray(order)
            assert sorted(o.tolist()) == list(range(n))
            assert (np.sort(np.asarray(d)) == np.asarray(d)[o]).all()


def test_glv_decomposition_host(rng):
    """k == k1 + k2*lambda mod r with |k1|, |k2| < 2^127; limb packing
    round-trips (the GLV half-length-scalar MSM's host side)."""
    import numpy as np

    from manta_tpu.ops import msm as M
    from manta_tpu.utils import hostmath

    curve = hostmath.BLS12_381_G1
    r = curve.scalar_field.modulus
    lam, beta, _ = M._glv_constants(curve)
    # edge values + randoms
    ks = [0, 1, r - 1, r // 2, lam, (lam * lam) % r] + [
        rng.randrange(r) for _ in range(64)
    ]
    L = curve.scalar_field.num_limbs
    sc = np.zeros((L, len(ks)), dtype=np.uint32)
    for i, k in enumerate(ks):
        for j in range(L):
            sc[j, i] = (k >> (16 * j)) & 0xFFFF
    abs2, neg2 = M.glv_decompose(curve, sc)
    n = len(ks)
    for i, k in enumerate(ks):
        k1 = sum(int(abs2[j, i]) << (16 * j) for j in range(L))
        k2 = sum(int(abs2[j, n + i]) << (16 * j) for j in range(L))
        assert k1 < 1 << 127 and k2 < 1 << 127
        if neg2[i]:
            k1 = -k1
        if neg2[n + i]:
            k2 = -k2
        assert (k1 + k2 * lam - k) % r == 0, f"lane {i}"
    # beta consistency: (beta*x, y) == lambda * P on the host curve
    G = curve.generator
    p = curve.field.modulus
    assert (beta * G[0] % p, G[1]) == curve.scalar_mul(lam, G)


@pytest.mark.slow
def test_glv_msm_matches_host_oracle(rng):
    """Full GLV MSM on BLS12-381 G1 vs the host big-int oracle."""
    import jax.numpy as jnp
    import numpy as np

    from manta_tpu.ops import curve as C
    from manta_tpu.ops import msm as M
    from manta_tpu.utils import hostmath

    curve = hostmath.BLS12_381_G1
    cops = C.curve_ops_for(curve, "fused")
    n = 256
    g = curve.generator
    points = [curve.scalar_mul(k + 1, g) for k in range(n)]
    scalars = [rng.randrange(curve.scalar_field.modulus) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = curve.scalar_field.modulus - 1
    expected = curve.msm(scalars, points)
    L = curve.scalar_field.num_limbs
    sc = np.zeros((L, n), dtype=np.uint32)
    for i, k in enumerate(scalars):
        for j in range(L):
            sc[j, i] = (k >> (16 * j)) & 0xFFFF
    pts = cops.encode_points(points)
    result = M.msm_glv(cops, sc, pts, window_bits=8, column_steps=16)
    assert cops.decode_points(result) == [expected]
