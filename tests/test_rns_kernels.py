"""Fused RNS column kernel vs host ground truth.

Replays the MSM bucket-accumulation column pass (sequential masked mixed
adds) through `rns_kernels.rns_accumulate_columns` (f32 RNS arithmetic,
MXU base extensions, matmul zero-classes) and checks every intermediate
accumulator against host big-int curve arithmetic — including the edge
cases: run restarts, infinity lanes, and coincident points (doubling).
"""

import numpy as np
import pytest

from manta_tpu.ops import rns as R
from manta_tpu.utils import hostmath

CURVE = hostmath.BLS12_381_G1
K = 8
LANES = 128


@pytest.fixture(scope="module")
def cops():
    from manta_tpu.ops.rns import RnsCoordOps

    return RnsCoordOps(CURVE.field)


def _host_column(points, heads):
    """Host reference: per lane, acc = head ? q : acc + q after each step."""
    acc = [None] * LANES
    outs = []
    for k in range(K):
        for r in range(LANES):
            q = points[k][r]
            if heads[k][r]:
                acc[r] = q
            else:
                acc[r] = CURVE.add(acc[r], q)
        outs.append(list(acc))
    return outs


def test_rns_column_matches_host(cops, rng):
    import jax.numpy as jnp

    from manta_tpu.ops.pallas import rns_kernels as RK

    g = CURVE.generator
    # distinct points + deliberate edge cases:
    #  lane 1 step 3 repeats the accumulator value (doubling branch),
    #  lane 2 step 2 is the infinity point.
    points = [
        [
            CURVE.scalar_mul(1 + k * LANES + r, g)
            for r in range(LANES)
        ]
        for k in range(K)
    ]
    heads = [[k == 0 for r in range(LANES)] for k in range(K)]
    for k in range(2, K, 3):  # sprinkle run restarts
        heads[k][5] = True
    # doubling: step 1 lane 1 equals step 0 lane 1 (acc == q)
    points[1][1] = points[0][1]
    # infinity lane: step 2 lane 2
    inf_mask = [[False] * LANES for _ in range(K)]
    inf_mask[2][2] = True

    host_pts = [
        [
            None if inf_mask[k][r] else points[k][r]
            for r in range(LANES)
        ]
        for k in range(K)
    ]

    def host_add(a, q):
        if q is None:
            return a
        if a is None:
            return q
        return CURVE.add(a, q)

    acc = [None] * LANES
    expect = []
    for k in range(K):
        nxt = []
        for r in range(LANES):
            q = host_pts[k][r]
            acc[r] = q if heads[k][r] else host_add(acc[r], q)
            nxt.append(acc[r])
        expect.append(list(nxt))

    # encode (K, Kt, R); infinity lanes carry (0, 1) placeholders
    def enc(coord_index):
        rows = []
        for k in range(K):
            vals = []
            for r in range(LANES):
                if inf_mask[k][r]:
                    vals.append(0 if coord_index == 0 else 1)
                else:
                    vals.append(points[k][r][coord_index])
            rows.append(cops.encode(vals))
        return jnp.asarray(np.stack(rows))

    px, py = enc(0), enc(1)
    qinf = jnp.asarray(np.asarray(inf_mask, np.int32))
    head = jnp.asarray(np.asarray(heads, np.int32))
    ox, oy, oz = RK.rns_accumulate_columns(CURVE, px, py, qinf, head)

    ox = np.asarray(ox).astype(np.int64)
    oy = np.asarray(oy).astype(np.int64)
    oz = np.asarray(oz).astype(np.int64)
    p = CURVE.field.modulus
    for k in range(K):
        xs = cops.decode(ox[k].astype(np.int32))
        ys = cops.decode(oy[k].astype(np.int32))
        zs = cops.decode(oz[k].astype(np.int32))
        for r in (0, 1, 2, 5, LANES - 1):
            want = expect[k][r]
            z = zs[r] % p
            if want is None:
                assert z == 0, (k, r)
                continue
            assert z != 0, (k, r)
            zi = pow(z, -1, p)
            x_aff = xs[r] * zi * zi % p
            y_aff = ys[r] * zi * zi * zi % p
            assert (x_aff, y_aff) == want, (k, r)


def test_rns_fused_msm_matches_host(rng):
    """Full Pippenger MSM on the rns_fused backend vs the host oracle
    (includes signed windows, bucket reduce, horner — every phase over
    packed RNS int32 arrays with fused f32 kernels)."""
    import jax.numpy as jnp

    from manta_tpu.ops import curve as C
    from manta_tpu.ops import field_ops as F
    from manta_tpu.ops import msm as M

    cops = C.curve_ops_for(CURVE, "rns_fused")
    n = 256
    g = CURVE.generator
    points = [CURVE.scalar_mul(k + 3, g) for k in range(n - 1)] + [None]
    scalars = [rng.randrange(CURVE.scalar_field.modulus) for _ in range(n)]
    expected = CURVE.msm(scalars[:-1], points[:-1])

    sc = jnp.asarray(
        F.encode_ints(CURVE.scalar_field, scalars, montgomery=False)
    )
    pts = cops.encode_points(points)
    out = M.msm_jit(
        cops, sc, pts, 8, False, 16, CURVE.scalar_field.bits, True
    )
    got = cops.decode_points(out)
    assert got == [expected]


def test_rns_fused_g2_msm_matches_host(rng):
    """G2 (Fq2) MSM on the rns_fused backend: the Fq2-over-RNS tower with
    schoolbook muls and +1-shifted sub_k offsets. n=512/steps=4 gives
    lanes=128, so this exercises the fused COLUMN kernel (ext variant);
    n=64/steps=16 covers the rolled loop over fused single-op kernels."""
    import jax.numpy as jnp

    from manta_tpu.ops import curve as C
    from manta_tpu.ops import field_ops as F
    from manta_tpu.ops import msm as M

    g2curve = hostmath.BN254_G2
    cops = C.curve_ops_for(g2curve, "rns_fused")
    g = g2curve.generator
    base_points = [g2curve.scalar_mul(k + 2, g) for k in range(64)]
    for n, steps in ((512, 4), (64, 16)):
        points = (base_points * (n // 64))[:n]
        scalars = [
            rng.randrange(g2curve.scalar_field.modulus) for _ in range(n)
        ]
        expected = g2curve.msm(scalars, points)
        sc = jnp.asarray(
            F.encode_ints(g2curve.scalar_field, scalars, montgomery=False)
        )
        pts = cops.encode_points(points)
        out = M.msm_jit(
            cops, sc, pts, 8, False, steps, g2curve.scalar_field.bits, True
        )
        got = cops.decode_points(out)
        assert got == [expected], f"n={n} steps={steps}"
