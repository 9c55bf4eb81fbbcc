"""Device phase-2 initialization vs the host oracle (`mpc.rs:355-431`)."""

import pytest

from manta_tpu import fields
from manta_tpu.ceremony import kzg as KZG
from manta_tpu.ceremony import phase2 as P2
from manta_tpu.ceremony import phase2_device as P2D
from manta_tpu.models import circuit as CC
from manta_tpu.models import pairing as PR
from manta_tpu.utils import hostmath

# Pairing identities are never needed by initialize; a toy config with
# G2 := G1 exercises the whole path at toy-field kernel sizes.
TOY_CFG = PR.PairingConfig(
    name="toy", g1=hostmath.TOY_G1, g2=hostmath.TOY_G1, xi=(1, 1), m_twist=True
)


def _toy_matrices(n_extra: int = 3):
    fr = hostmath.TOY_FR
    com = CC.R1CS(fr, mode="setup")
    x = com.secret_witness(None)
    y = com.secret_witness(None)
    z = com.public_input(None)
    acc = com.mul(x, y)
    for _ in range(n_extra):
        acc = com.mul(acc, y)
    com.assert_eq(acc, z)
    matrices, _ = com.finalize()
    return matrices


def _contributed_accumulator(size: int):
    """Hand-built tau/alpha/beta powers (KZG.contribute's challenge hash
    assumes an Fq2 G2, which the toy config does not have)."""
    tau, alpha, beta = 1234, 77, 91
    g1, g2 = TOY_CFG.g1, TOY_CFG.g2
    r = g1.scalar_field.modulus
    return KZG.Accumulator(
        cfg=TOY_CFG,
        tau_powers_g1=[
            g1.scalar_mul(pow(tau, i, r), g1.generator)
            for i in range(2 * size - 1)
        ],
        tau_powers_g2=[
            g2.scalar_mul(pow(tau, i, r), g2.generator) for i in range(size)
        ],
        alpha_tau_powers_g1=[
            g1.scalar_mul(alpha * pow(tau, i, r) % r, g1.generator)
            for i in range(size)
        ],
        beta_tau_powers_g1=[
            g1.scalar_mul(beta * pow(tau, i, r) % r, g1.generator)
            for i in range(size)
        ],
        beta_g2=g2.scalar_mul(beta, g2.generator),
    )


def test_device_initialize_matches_host():
    matrices = _toy_matrices()
    acc = _contributed_accumulator(8)
    want = P2.initialize(acc, matrices)
    got = P2D.initialize(acc, matrices)
    assert got.domain_size == want.domain_size
    assert got.a_query == want.a_query
    assert got.b_g1_query == want.b_g1_query
    assert got.b_g2_query == want.b_g2_query
    assert got.gamma_abc_g1 == want.gamma_abc_g1
    assert got.l_query == want.l_query
    assert got.h_query == want.h_query
    assert (got.alpha_g1, got.beta_g1, got.beta_g2) == (
        want.alpha_g1,
        want.beta_g1,
        want.beta_g2,
    )


@pytest.mark.slow
def test_device_initialized_state_runs_ceremony_bn254():
    """BN254 device init feeds contribute/verify/extract end to end and
    the extracted keys prove+verify a witness (toy curves cannot pair)."""
    import copy

    from manta_tpu.models import groth16 as G

    fr = fields.BN254_FR
    com = CC.R1CS(fr, mode="setup")
    x = com.secret_witness(None)
    y = com.secret_witness(None)
    z = com.public_input(None)
    com.assert_eq(com.mul(x, y), z)
    matrices, _ = com.finalize()

    acc = KZG.Accumulator.default(PR.BN254_PAIRING, 8)
    KZG.contribute(acc, 1234, 77, 91, nonce=3)
    host_state = P2.initialize(acc, matrices)
    state = P2D.initialize(acc, matrices)
    assert state.a_query == host_state.a_query
    assert state.h_query == host_state.h_query
    assert state.b_g2_query == host_state.b_g2_query

    prev = copy.deepcopy(state)
    proof = P2.contribute(state, 4321, nonce=9)
    assert P2.verify_transform(prev, state, proof)
    pk, vk = P2.extract_keys(state)
    com = CC.R1CS(fr, mode="prove")
    x = com.secret_witness(3)
    y = com.secret_witness(7)
    z = com.public_input(21)
    com.assert_eq(com.mul(x, y), z)
    m2, assignment = com.finalize()
    proof2 = G.prove(pk, matrices, assignment, 5, 6)
    assert G.verify(vk, proof2, [21])
