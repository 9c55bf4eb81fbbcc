"""Device-resident Groth16 prover (`manta_tpu.models.groth16_device`).

Cross-checks the fully on-device pipeline (sparse row-eval -> coset NTT
h(x) -> merged MSMs) against the host prover on small circuits, including
batched proving and both pairing configurations. Mirrors the reference's
prove/verify + fuzzed-public-input strategy (SURVEY.md §4,
`manta-crypto/src/constraint.rs:390-411`).
"""

import pytest

from manta_tpu import fields
from manta_tpu.models import circuit as CC
from manta_tpu.models import groth16 as G
from manta_tpu.models import groth16_device as GD
from manta_tpu.models import pairing as PR
from manta_tpu.utils import grain


def _poseidon_setup(fr, rng, arity=2):
    spec = grain.poseidon_spec(fr, arity + 1)
    pre = [rng.randrange(fr.modulus) for _ in range(arity)]
    digest = grain.poseidon_hash(spec, pre)

    def build(com, known):
        p_vars = [
            com.secret_witness(pre[i] if known else None) for i in range(arity)
        ]
        d = com.public_input(digest if known else None)
        com.assert_eq(CC.poseidon_hash(com, spec, p_vars), d)

    com_setup = CC.R1CS(fr, mode="setup")
    build(com_setup, False)
    matrices, _ = com_setup.finalize()
    com = CC.R1CS(fr, mode="prove")
    build(com, True)
    _, assignment = com.finalize()
    return matrices, assignment, digest


_SLOW = pytest.mark.skipif(
    __import__("os").environ.get("MANTA_SLOW_TESTS") != "1",
    reason="XLA:CPU spends ~40s of LLVM codegen per G2 point-formula "
    "instantiation; the BLS12-381 prover variant is opt-in "
    "(MANTA_SLOW_TESTS=1). BN254 covers the pipeline on every run.",
)


@pytest.mark.parametrize(
    "cfg,fr",
    [
        (PR.BN254_PAIRING, fields.BN254_FR),
        pytest.param(
            PR.BLS12_381_PAIRING, fields.BLS12_381_FR, marks=_SLOW
        ),
    ],
    ids=["bn254", "bls12-381"],
)
def test_device_prover_matches_host(cfg, fr, rng):
    matrices, assignment, digest = _poseidon_setup(fr, rng)
    pk, vk = G.setup(cfg, matrices, seed=3)
    prover = GD.DeviceProver(pk, matrices, backend="rns_fused", column_steps=16)
    proof = prover.prove(assignment, r_rand=5, s_rand=9)
    assert G.verify(vk, proof, [digest])
    assert not G.verify(vk, proof, [(digest + 1) % fr.modulus])
    # randomization-free proofs must be identical to the host backend's
    p_dev = prover.prove(assignment)
    p_host = G.prove(pk, matrices, assignment, backend="host")
    assert (p_dev.a, p_dev.b, p_dev.c) == (p_host.a, p_host.b, p_host.c)


def test_device_prover_batch(rng):
    fr = fields.BN254_FR
    cfg = PR.BN254_PAIRING
    spec = grain.poseidon_spec(fr, 3)

    def make(known_vals):
        com = CC.R1CS(fr, mode="prove" if known_vals else "setup")
        pre = known_vals or [None, None]
        digest = (
            grain.poseidon_hash(spec, known_vals) if known_vals else None
        )
        p_vars = [com.secret_witness(x) for x in pre]
        d = com.public_input(digest)
        com.assert_eq(CC.poseidon_hash(com, spec, p_vars), d)
        return com.finalize(), digest

    (matrices, _), _ = make(None)
    pk, vk = G.setup(cfg, matrices, seed=8)
    prover = GD.DeviceProver(pk, matrices, backend="rns_fused", column_steps=16)
    cases = []
    for _ in range(3):
        vals = [rng.randrange(fr.modulus) for _ in range(2)]
        (_, assignment), digest = make(vals)
        cases.append((assignment, digest))
    proofs = prover.prove_batch(
        [a for a, _ in cases], rands=[(1, 2), (0, 0), (3, 4)]
    )
    for proof, (_, digest) in zip(proofs, cases):
        assert G.verify(vk, proof, [digest])


@pytest.mark.slow
def test_prover_cache_roundtrip(tmp_path):
    """save_cache/from_cache provers produce byte-identical proofs (the
    driver bench reconstructs the production prover from disk)."""
    from __graft_entry__ import _dryrun_circuit, _dryrun_prover
    from manta_tpu.models import groth16 as G
    from manta_tpu.models.groth16_device import DeviceProver

    prover, matrices, vk = _dryrun_prover()
    path = str(tmp_path / "prover_cache.npz")
    prover.save_cache(path)
    back = DeviceProver.from_cache(path)
    assert back.n_ab == prover.n_ab and back.n_lh == prover.n_lh
    assert back.window_bits == prover.window_bits

    _, assignment, digest, _ = _dryrun_circuit("prove", 777)
    p1 = prover.prove(assignment, r_rand=3, s_rand=4)
    p2 = back.prove(assignment, r_rand=3, s_rand=4)
    assert p1 == p2
    assert G.verify(vk, p2, [digest])
    # shared-G1-shape dispatch (a/b1 padded into the lh lane count) must
    # yield the identical proof
    back.share_g1_shapes = True
    p3 = back.prove(assignment, r_rand=3, s_rand=4)
    assert p3 == p1
