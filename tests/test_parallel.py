"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import pytest

import jax
import jax.numpy as jnp

from manta_tpu.ops import curve as C
from manta_tpu.ops import field_ops as F
from manta_tpu.parallel import mesh as MESH
from manta_tpu.parallel.msm_sharded import sharded_msm
from manta_tpu.utils import hostmath

TOY = hostmath.TOY_G1


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_msm_matches_host(rng):
    ops = C.curve_ops_for(TOY)
    mesh = MESH.data_mesh()
    n = 64  # 8 per device
    points = [
        TOY.scalar_mul(rng.randrange(1, TOY.scalar_field.modulus), TOY.generator)
        for _ in range(n)
    ]
    scalars = [rng.randrange(TOY.scalar_field.modulus) for _ in range(n)]
    expected = TOY.msm(scalars, points)
    sc = jnp.asarray(F.encode_ints(TOY.scalar_field, scalars, montgomery=False))
    pts = ops.encode_points(points)
    result = jax.jit(sharded_msm, static_argnums=(0, 3, 4))(
        ops, sc, pts, mesh, 4
    )
    assert ops.decode_points(result) == [expected]


def test_sharded_ntt_matches_single_device(rng):
    """Four-step mesh NTT is bit-identical to the single-chip kernel for
    all four variants (BASELINE config 2: sharded NTT over Fr)."""
    import numpy as np

    from manta_tpu import fields
    from manta_tpu.ops import ntt as NTT
    from manta_tpu.parallel.ntt_sharded import sharded_ntt

    spec = fields.BLS12_381_FR
    mesh = MESH.data_mesh()
    n = 1 << 10
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    a = jnp.asarray(F.encode_ints(spec, vals))
    a_s = jax.device_put(a, MESH.shard_last(mesh, a.ndim))

    cases = [
        (dict(inverse=False, coset=False), lambda x: NTT.ntt(spec, x)),
        (dict(inverse=True, coset=False), lambda x: NTT.intt(spec, x)),
        (dict(inverse=False, coset=True), lambda x: NTT.coset_ntt(spec, x)),
        (dict(inverse=True, coset=True), lambda x: NTT.coset_intt(spec, x)),
    ]
    for kwargs, single in cases:
        got = jax.jit(
            sharded_ntt, static_argnums=(0, 2, 3, 4)
        )(spec, a_s, mesh, kwargs["inverse"], kwargs["coset"])
        want = single(a)
        # both land in the lazy [0, 2p) domain; compare canonical values
        np.testing.assert_array_equal(
            np.asarray(F.normalize(spec, got)),
            np.asarray(F.normalize(spec, want)),
            err_msg=str(kwargs),
        )


def test_sharded_ntt_roundtrip(rng):
    import numpy as np

    from manta_tpu import fields
    from manta_tpu.parallel.ntt_sharded import sharded_ntt

    spec = fields.BN254_FR
    mesh = MESH.data_mesh()
    n = 1 << 9
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    a = jnp.asarray(F.encode_ints(spec, vals))
    fwd = jax.jit(sharded_ntt, static_argnums=(0, 2, 3, 4))
    ev = fwd(spec, a, mesh, False, True)
    back = fwd(spec, ev, mesh, True, True)
    np.testing.assert_array_equal(
        np.asarray(F.normalize(spec, back)), np.asarray(F.normalize(spec, a))
    )


@pytest.mark.slow
def test_sharded_msm_bls12_381(rng):
    """Production-curve sharded MSM on the mesh (same program shapes as
    the driver's dryrun_multichip, so this run pre-warms its cache)."""
    import numpy as np

    from manta_tpu.utils import hostmath

    curve = hostmath.BLS12_381_G1
    n = int(np.clip(int(__import__("os").environ.get(
        "MANTA_SHARDED_MSM_LOG2N", "7")), 7, 18))
    n = 1 << n
    # rns_fused: the limb backend's XLA:CPU compile of a production-curve
    # MSM takes ~40 min and its multi-GB executable segfaults the
    # persistent-cache write (compilation_cache.put_executable_and_time)
    ops = C.curve_ops_for(curve, "rns_fused")
    mesh = MESH.data_mesh()
    g = curve.generator
    points = [curve.scalar_mul(k + 1, g) for k in range(min(n, 512))]
    points = (points * (n // len(points) + 1))[:n]
    scalars = [rng.randrange(curve.scalar_field.modulus) for _ in range(n)]
    expected = curve.msm(scalars, points)
    sc = jnp.asarray(
        F.encode_ints(curve.scalar_field, scalars, montgomery=False)
    )
    pts = ops.encode_points(points)
    result = jax.jit(sharded_msm, static_argnums=(0, 3, 4, 5, 6, 7))(
        ops, sc, pts, mesh, 8, 16, curve.scalar_field.bits, True
    )
    assert ops.decode_points(result) == [expected]


@pytest.mark.slow
def test_sharded_prove_verifies():
    """Batch-DP sharded prove over the mesh; every proof verifies.
    Mirrors dryrun_multichip's shapes exactly (shared compile cache)."""
    import random

    from __graft_entry__ import _dryrun_circuit, _dryrun_prover
    from manta_tpu import fields
    from manta_tpu.models import groth16 as G
    from manta_tpu.parallel.prover_sharded import prove_batch_sharded

    mesh = MESH.data_mesh()
    prover, matrices, vk = _dryrun_prover()
    rng = random.Random(23)
    fr = fields.BN254_FR
    cases = []
    for _ in range(mesh.devices.size):
        _, assignment, digest, _ = _dryrun_circuit(
            "prove", rng.randrange(fr.modulus)
        )
        cases.append((assignment, digest))
    proofs = prove_batch_sharded(
        prover,
        [a for a, _ in cases],
        mesh,
        rands=[(i + 1, i + 3) for i in range(len(cases))],
    )
    for proof, (_, digest) in zip(proofs, cases):
        assert G.verify(vk, proof, [digest])


@pytest.mark.slow
def test_sharded_prove_ragged_batch():
    """B not divisible by the mesh size: padded wave, duplicates dropped
    (the reference's batching has no divisibility constraint)."""
    import random

    from __graft_entry__ import _dryrun_circuit, _dryrun_prover
    from manta_tpu import fields
    from manta_tpu.models import groth16 as G
    from manta_tpu.parallel.prover_sharded import prove_batch_sharded

    mesh = MESH.data_mesh()
    prover, matrices, vk = _dryrun_prover()
    rng = random.Random(29)
    fr = fields.BN254_FR
    cases = []
    for _ in range(mesh.devices.size + 3):  # 11 witnesses on 8 devices
        _, assignment, digest, _ = _dryrun_circuit(
            "prove", rng.randrange(fr.modulus)
        )
        cases.append((assignment, digest))
    proofs = prove_batch_sharded(
        prover,
        [a for a, _ in cases],
        mesh,
        rands=[(i + 1, i + 2) for i in range(len(cases))],
    )
    assert len(proofs) == len(cases)
    for proof, (_, digest) in zip(proofs, cases):
        assert G.verify(vk, proof, [digest])
